"""Conformer family parity vs the reference auto_avsr/auto_asr/auto_vsr."""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.checkpoint import (  # noqa: E402
    conformer_asr_mapping,
    conformer_avsr_mapping,
    convert_state,
)
from avsr_tpu.models.conformer import ConformerASR, ConformerAVSR  # noqa: E402

pytestmark = requires_reference

TOL = dict(rtol=5e-4, atol=5e-4)

TINY = dict(
    odim=41,
    adim=24,
    aheads=4,
    eunits=48,
    elayers=2,
    ddim=24,
    dheads=4,
    dunits=48,
    dlayers=2,
    fusion_hdim=64,
)


def _randomize_bn(model, seed):
    import torch

    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
    model.load_state_dict(sd)


@pytest.fixture(scope="module")
def av_setup():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.auto_avsr.avsr_model import AutoAVSR
    from src.auto_avsr.configuration_avsr import AutoAVSRConfig

    torch.manual_seed(1)
    kw = dict(TINY)
    kw.update({f"aux_{k}": v for k, v in TINY.items() if k in ("adim", "aheads", "eunits", "elayers")})
    tcfg = AutoAVSRConfig(**kw)
    tmodel = AutoAVSR(tcfg)
    _randomize_bn(tmodel, 2)
    tmodel.eval()

    jmodel = ConformerAVSR(**TINY)
    state = {k: v.detach().numpy() for k, v in tmodel.avsr.state_dict().items()}
    variables = convert_state(
        state, conformer_avsr_mapping(TINY["elayers"], TINY["dlayers"])
    )
    return tmodel, jmodel, variables


def test_conformer_av_param_mapping(av_setup):
    tmodel, jmodel, variables = av_setup
    rng = np.random.RandomState(0)
    b, t = 2, 6
    videos = jnp.asarray(rng.randn(b, t, 88, 88, 1).astype(np.float32))
    audios = jnp.asarray(rng.randn(b, t * 640, 1).astype(np.float32))
    labels = jnp.asarray([[3, 4, 5], [6, 7, -1]], dtype=jnp.int32)
    init_vars = jmodel.init(
        {"params": jax.random.PRNGKey(0)}, videos, audios, labels,
        jnp.array([t, t]), jnp.array([3, 2]),
    )
    flat = lambda tree: {  # noqa: E731
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    assert flat(init_vars["params"]) == flat(variables["params"])
    assert flat(init_vars["batch_stats"]) == flat(variables["batch_stats"])


def test_conformer_av_fused_features_parity(av_setup):
    import torch

    tmodel, jmodel, variables = av_setup
    rng = np.random.RandomState(3)
    b, t = 2, 6
    video_t = rng.randn(b, t, 1, 88, 88).astype(np.float32)
    audio_t = rng.randn(b, t * 640, 1).astype(np.float32)

    with torch.no_grad():
        vfeat, _ = tmodel.avsr.encoder(torch.from_numpy(video_t), None)
        afeat, _ = tmodel.avsr.aux_encoder(torch.from_numpy(audio_t), None)
        fused_t = tmodel.avsr.fusion(torch.cat((vfeat, afeat), dim=-1)).numpy()

    videos = jnp.asarray(np.transpose(video_t, (0, 1, 3, 4, 2)))
    audios = jnp.asarray(audio_t)
    fused_j = np.asarray(
        jmodel.apply(variables, audios, videos, None, method="encode")
    )
    assert fused_j.shape == fused_t.shape
    np.testing.assert_allclose(fused_j, fused_t, **TOL)


def test_conformer_av_loss_parity(av_setup):
    import torch

    tmodel, jmodel, variables = av_setup
    rng = np.random.RandomState(4)
    b, t = 2, 6
    video_t = rng.randn(b, t, 1, 88, 88).astype(np.float32)
    audio_t = rng.randn(b, t * 640, 1).astype(np.float32)
    labels = np.array([[3, 4, 5, 9], [6, 7, -1, -1]], dtype=np.int64)
    vlen = np.array([6, 4])
    llen = np.array([4, 2])

    with torch.no_grad():
        out_t = tmodel(
            videos=torch.from_numpy(video_t),
            audios=torch.from_numpy(audio_t),
            labels=torch.from_numpy(labels),
            video_lengths=torch.from_numpy(vlen),
            audio_lengths=torch.from_numpy(vlen * 640),
            label_lengths=torch.from_numpy(llen),
        )

    out_j = jmodel.apply(
        variables,
        jnp.asarray(np.transpose(video_t, (0, 1, 3, 4, 2))),
        jnp.asarray(audio_t),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(vlen),
        jnp.asarray(llen),
    )
    np.testing.assert_allclose(float(out_j.loss_ctc), float(out_t.loss_ctc), rtol=2e-3)
    np.testing.assert_allclose(float(out_j.loss_att), float(out_t.loss_att), rtol=2e-3)
    np.testing.assert_allclose(float(out_j.loss), float(out_t.loss), rtol=2e-3)


@pytest.mark.parametrize("input_layer,ref_mod", [
    ("conv1d", "auto_asr"), ("conv3d", "auto_vsr"),
])
def test_conformer_single_modality_parity(input_layer, ref_mod):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    if ref_mod == "auto_asr":
        from src.auto_asr.asr_model import AutoASR as Wrapper
        from src.auto_asr.configuration_asr import AutoASRConfig as Cfg
    else:
        from src.auto_vsr.vsr_model import AutoVSR as Wrapper
        from src.auto_vsr.configuration_vsr import AutoVSRConfig as Cfg

    torch.manual_seed(5)
    kw = {k: v for k, v in TINY.items() if k != "fusion_hdim"}
    tcfg = Cfg(**kw)
    tmodel = Wrapper(tcfg)
    _randomize_bn(tmodel, 6)
    tmodel.eval()

    inner = tmodel.asr if hasattr(tmodel, "asr") else tmodel.vsr
    state = {k: v.detach().numpy() for k, v in inner.state_dict().items()}
    jmodel = ConformerASR(input_layer=input_layer, **kw)
    variables = convert_state(
        state,
        conformer_asr_mapping(TINY["elayers"], TINY["dlayers"], input_layer),
    )

    rng = np.random.RandomState(7)
    b, t = 2, 5
    if input_layer == "conv1d":
        x_t = rng.randn(b, t * 640, 1).astype(np.float32)
        x_j = jnp.asarray(x_t)
    else:
        x_t = rng.randn(b, t, 1, 88, 88).astype(np.float32)
        x_j = jnp.asarray(np.transpose(x_t, (0, 1, 3, 4, 2)))

    with torch.no_grad():
        feat_t, _ = inner.encoder(torch.from_numpy(x_t), None)
    feat_j = np.asarray(jmodel.apply(variables, x_j, None, method="encode"))
    assert feat_j.shape == feat_t.numpy().shape
    np.testing.assert_allclose(feat_j, feat_t.numpy(), **TOL)
