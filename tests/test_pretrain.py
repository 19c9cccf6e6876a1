"""Masked-prediction pretraining objective (train/pretrain.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.config import AVHubertEncoderConfig  # noqa: E402
from avsr_tpu.train.pretrain import (  # noqa: E402
    AVHubertPretrainModel,
    PretrainConfig,
    grad_multiply,
    sample_pretrain_masks,
)


def tiny_encoder_cfg():
    return AVHubertEncoderConfig(
        encoder_embed_dim=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


def test_sample_pretrain_masks_semantics():
    cfg = PretrainConfig()
    rng = np.random.RandomState(0)
    lengths = np.array([40, 25])
    a_mask, v_mask, src = sample_pretrain_masks(cfg, 2, 40, lengths, rng)
    assert a_mask.shape == v_mask.shape == src.shape == (2, 40)
    # masks never land on padded frames
    assert not a_mask[1, 25:].any() and not v_mask[1, 25:].any()
    # src is identity on unmasked frames, an in-range OTHER frame on masked
    ident = np.tile(np.arange(40), (2, 1))
    assert (src[~v_mask] == ident[~v_mask]).all()
    masked_src = src[v_mask]
    masked_pos = ident[v_mask]
    assert (masked_src != masked_pos).all()
    # masked frames gather only from within the valid region
    assert (src[0][v_mask[0]] < 40).all() and (src[1][v_mask[1]] < 25).all()
    # both modalities masked some frames (mask_prob 0.8/0.3, min_masks 2)
    assert a_mask.sum() >= 4 and v_mask.sum() >= 4


def test_grad_multiply():
    g = jax.grad(lambda x: jnp.sum(grad_multiply(x, 0.1) ** 2))(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), 0.2 * np.ones(3), rtol=1e-6)


def test_pretrain_forward_and_grads():
    rng = np.random.RandomState(1)
    b, t = 2, 24
    pcfg = PretrainConfig(num_classes=11, final_dim=16, feature_grad_mult=0.1)
    model = AVHubertPretrainModel(tiny_encoder_cfg(), pcfg)
    audio = jnp.asarray(rng.randn(b, t, 104).astype(np.float32))
    video = jnp.asarray(rng.randn(b, t, 88, 88, 1).astype(np.float32))
    lengths = np.array([t, t - 6])
    a_mask, v_mask, src = sample_pretrain_masks(
        pcfg, b, t, lengths, np.random.RandomState(2)
    )
    targets = jnp.asarray(rng.randint(0, 11, size=(b, t)), jnp.int32)
    pad = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "modality": jax.random.PRNGKey(2)},
        audio, video, jnp.asarray(a_mask), jnp.asarray(src), targets, pad,
    )
    assert "mask_emb" in variables["params"]
    assert variables["params"]["label_embs"].shape == (11, 16)
    # the encoder subtree has the fine-tuning layout (drop-in for AVSRModel)
    assert "encoder" in variables["params"]["hubert"]

    def loss_fn(params):
        loss, metrics = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            audio, video, jnp.asarray(a_mask), jnp.asarray(src), targets, pad,
            train=False,
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    for k in ("loss_m", "loss_u", "acc_m", "feature_pen"):
        assert np.isfinite(float(metrics[k])), k
    # gradient reaches the mask embedding and the encoder
    assert float(jnp.abs(grads["mask_emb"]).sum()) > 0
    g_enc = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["hubert"], 0.0
    )
    assert g_enc > 0


def test_feature_grad_mult_scales_encoder_grads():
    rng = np.random.RandomState(3)
    b, t = 1, 16
    audio = jnp.asarray(rng.randn(b, t, 104).astype(np.float32))
    video = jnp.asarray(rng.randn(b, t, 88, 88, 1).astype(np.float32))
    targets = jnp.zeros((b, t), jnp.int32)
    a_mask = jnp.asarray(np.eye(1, t, 3, dtype=bool).repeat(b, 0))
    src = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))

    grads = {}
    for s in (1.0, 0.1):
        pcfg = PretrainConfig(num_classes=5, final_dim=8, feature_grad_mult=s)
        model = AVHubertPretrainModel(tiny_encoder_cfg(), pcfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "modality": jax.random.PRNGKey(2)},
            audio, video, a_mask, src, targets, None,
        )

        def loss_fn(params):
            loss, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                audio, video, a_mask, src, targets, None, train=False,
            )
            return loss

        grads[s] = jax.grad(loss_fn)(variables["params"])
    # same params (same init seed) -> encoder grads scale exactly by 0.1
    ga = jax.tree_util.tree_leaves(grads[1.0]["hubert"])
    gb = jax.tree_util.tree_leaves(grads[0.1]["hubert"])
    for a_leaf, b_leaf in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(b_leaf), 0.1 * np.asarray(a_leaf), rtol=1e-4, atol=1e-6
        )


def test_pretrain_end_to_end_and_finetune_handoff(tmp_path):
    """--pretrain path: PretrainCollator -> run_training (masked-prediction
    objective), loss decreases, and the checkpoint's 'hubert' subtree loads
    into AVSRModel fine-tuning (VERDICT r3 #9)."""
    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.data.collate import DataCollator
    from avsr_tpu.data.dataset import synthetic_samples
    from avsr_tpu.data.transforms import AudioTransform, VideoTransform
    from avsr_tpu.train import trainer as T
    from avsr_tpu.train.loop import LoopConfig, run_training
    from avsr_tpu.train.pretrain import PretrainCollator

    pcfg = PretrainConfig(num_classes=24)
    enc_cfg = tiny_encoder_cfg()
    model_cfg = AVHubertAVSRConfig(
        odim=31, adim=16, ddim=16, dheads=2, dunits=32, dlayers=1,
        encoder=enc_cfg,
    )
    base = DataCollator(
        text_transform=None,
        video_transform=VideoTransform("train"),
        audio_transform=AudioTransform("train"),
        seed=0,
    )
    coll = PretrainCollator(base, pcfg, seed=0)
    n_steps = 8
    loop_cfg = LoopConfig(
        output_dir=str(tmp_path), max_steps=n_steps, batch_size=1,
        grad_accum=1, save_steps=n_steps, eval_steps=100, log_interval=1,
    )
    tcfg = T.TrainConfig(
        learning_rate=2e-3, warmup_steps=1, max_steps=n_steps, grad_accum=1,
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        state = run_training(
            model_cfg, loop_cfg,
            synthetic_samples(256, seed=0, min_frames=16, max_frames=24),
            coll, train_cfg=tcfg, pretrain_cfg=pcfg,
        )
    logs = buf.getvalue()
    assert int(jax.device_get(state.step)) == n_steps
    losses = [
        float(line.split("loss=")[1].split()[0])
        for line in logs.splitlines() if "loss=" in line and "train" in line
    ]
    assert len(losses) == n_steps
    assert losses[-1] < losses[0]  # the proxy objective is learnable
    assert np.isfinite(losses).all()

    # ---- handoff: checkpoint's hubert subtree -> AVSRModel.encoder ----
    import os

    ckpt_root = os.path.join(str(tmp_path), "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_root, str(n_steps)))
    mgr = T.CheckpointManager(ckpt_root)
    assert mgr.latest_step() == n_steps
    restored = mgr.restore(n_steps, jax.device_get(state))
    mgr.close()
    hubert = restored.params["hubert"]

    from avsr_tpu.models.e2e import AVSRModel

    avsr = AVSRModel(model_cfg)
    rng = np.random.RandomState(0)
    videos = jnp.asarray(rng.randn(2, 8, 88, 88, 1).astype(np.float32))
    audios = jnp.asarray(rng.randn(2, 8, 104).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 30, (2, 3)), jnp.int32)
    variables = avsr.init(
        {"params": jax.random.PRNGKey(1)}, videos, audios, labels,
        jnp.asarray([8, 6]), jnp.asarray([3, 2]),
    )
    # the subtrees are layout-compatible (module docstring's promise)
    assert jax.tree_util.tree_structure(
        variables["params"]["encoder"]
    ) == jax.tree_util.tree_structure(hubert)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"]["encoder"])[0],
        jax.tree_util.tree_flatten_with_path(hubert)[0],
    ):
        assert pa == pb and a.shape == b.shape, (pa, pb)
    params = dict(variables["params"])
    params["encoder"] = hubert
    out = avsr.apply(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        videos, audios, labels, jnp.asarray([8, 6]), jnp.asarray([3, 2]),
    )
    assert np.isfinite(float(out.loss))
