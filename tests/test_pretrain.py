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
