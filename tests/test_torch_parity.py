"""Numerical parity: avsr_tpu flax model vs the upstream torch reference.

The reference implementation is imported from /root/reference and driven with
random weights; the same weights are loaded through the checkpoint converter
into the flax model and outputs are compared to fp32 tolerance.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.checkpoint import torch_to_flax  # noqa: E402
from avsr_tpu.models.e2e import AVSRModel  # noqa: E402

pytestmark = requires_reference

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def parity_setup():
    from tests.torch_ref import (
        build_reference_model,
        make_inputs,
        numpy_state_dict,
        tiny_jax_config,
    )

    tcfg, tmodel = build_reference_model()
    jcfg = tiny_jax_config()
    variables = torch_to_flax(numpy_state_dict(tmodel), jcfg)
    jmodel = AVSRModel(jcfg)
    video_t, audio_t = make_inputs()
    return tmodel, jmodel, variables, video_t, audio_t


def test_all_params_mapped(parity_setup):
    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    # init a fresh tree and compare leaf shapes with the converted tree
    import torch

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    labels = jnp.array([[3, 4, 5], [6, 7, -1]], dtype=jnp.int32)
    init_vars = jmodel.init(
        {"params": jax.random.PRNGKey(0)},
        videos, audios, labels,
        jnp.array([8, 8]), jnp.array([3, 2]),
    )
    flat_init = jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_conv = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    assert paths_init == paths_conv


def test_encoder_forward_parity(parity_setup):
    import torch

    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    with torch.no_grad():
        out_t = tmodel.avsr.encoder(
            input_features=torch.from_numpy(audio_t),
            video=torch.from_numpy(video_t),
        ).last_hidden_state.numpy()

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    out_j = np.asarray(
        jmodel.apply(variables, audios, videos, None, method="encode")
    )
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, **TOL)


def test_encoder_forward_parity_with_mask(parity_setup):
    import torch

    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    lengths = np.array([8, 5])
    mask_t = torch.zeros(2, 8, dtype=torch.bool)
    for i, l in enumerate(lengths):
        mask_t[i, :l] = True
    with torch.no_grad():
        out_t = tmodel.avsr.encoder(
            input_features=torch.from_numpy(audio_t),
            video=torch.from_numpy(video_t),
            attention_mask=mask_t,
        ).last_hidden_state.numpy()

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    out_j = np.asarray(
        jmodel.apply(
            variables, audios, videos, jnp.asarray(lengths), method="encode"
        )
    )
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(out_j[i, :l], out_t[i, :l], **TOL)


def test_e2e_loss_parity(parity_setup):
    import torch

    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    labels = np.array([[3, 4, 5, 9], [6, 7, -1, -1]], dtype=np.int64)
    vlen = np.array([8, 5])
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

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    out_j = jmodel.apply(
        variables,
        videos,
        audios,
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(vlen),
        jnp.asarray(llen),
    )
    np.testing.assert_allclose(float(out_j.loss_ctc), float(out_t.loss_ctc), rtol=1e-3)
    np.testing.assert_allclose(float(out_j.loss_att), float(out_t.loss_att), rtol=1e-3)
    np.testing.assert_allclose(float(out_j.loss), float(out_t.loss), rtol=1e-3)
    np.testing.assert_allclose(float(out_j.acc), float(out_t.acc), rtol=1e-5)


def test_decoder_step_parity(parity_setup):
    """Incremental KV-cache decoding == reference batch_score recomputation."""
    import torch

    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    rng = np.random.RandomState(5)
    n_beam, s, d = 3, 8, 32
    memory = rng.randn(n_beam, s, d).astype(np.float32)
    sos = 60

    # reference: batch_score over growing prefixes
    tdec = tmodel.avsr.decoder
    ys = torch.full((n_beam, 1), sos, dtype=torch.int64)
    states = [None] * n_beam
    t_logps = []
    with torch.no_grad():
        for step in range(3):
            logp, states = tdec.batch_score(ys, states, torch.from_numpy(memory))
            t_logps.append(logp.numpy())
            nxt = torch.from_numpy(rng.randint(1, 59, size=(n_beam, 1)))
            ys = torch.cat([ys, nxt], dim=1)

    # ours: fixed-shape KV-cache steps
    mem_j = jnp.asarray(memory)
    cache = jmodel.apply(variables, mem_j, 8, method="decoder_init")
    y = jnp.full((n_beam,), sos, dtype=jnp.int32)
    j_logps = []
    ys_np = np.full((n_beam, 1), sos)
    for step in range(3):
        logp, cache = jmodel.apply(
            variables, y, step, cache, None, method="decoder_step"
        )
        j_logps.append(np.asarray(logp))
        y = jnp.asarray(ys.numpy()[:, step + 1].astype(np.int32))

    for a, b in zip(j_logps, t_logps):
        np.testing.assert_allclose(a, b, **TOL)


def test_checkpoint_roundtrip_export(parity_setup, tmp_path):
    """flax -> torch-safetensors export loads back bit-identically."""
    from avsr_tpu.core.checkpoint import load_pretrained, save_pretrained

    from tests.torch_ref import tiny_jax_config

    tmodel, jmodel, variables, video_t, audio_t = parity_setup
    jcfg = tiny_jax_config()
    d = str(tmp_path / "export")
    save_pretrained(d, jcfg, variables)

    cfg2, variables2 = load_pretrained(d)
    assert cfg2.odim == jcfg.odim and cfg2.dlayers == jcfg.dlayers
    flat1 = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat2 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(variables2["params"])[0]
    }
    for p, v in flat1:
        np.testing.assert_array_equal(np.asarray(v), flat2[jax.tree_util.keystr(p)])
