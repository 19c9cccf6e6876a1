"""Pallas flash attention vs eager attention parity (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.ops.pallas.flash_attention import flash_attention, mha_flash  # noqa: E402


def eager(q, k, v, bias, scale):
    s = jnp.einsum("ntd,nsd->nts", q * scale, k) + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nts,nsd->ntd", p, v)


def test_flash_matches_eager():
    rng = np.random.RandomState(0)
    n, t, d = 4, 256, 64
    q = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    bias = jnp.zeros((n, t), jnp.float32).at[:, 200:].set(-1e30)
    out = flash_attention(q, k, v, bias, scale=0.125)
    want = eager(q, k, v, bias, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_mha_flash_with_padding():
    rng = np.random.RandomState(1)
    b, t, h, dh = 2, 130, 4, 64  # t not a multiple of the block -> padded
    q = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[130], [90]]))[:, :, 0] if False else jnp.asarray(np.arange(t)[None, :] < np.array([130, 90])[:, None])
    out = mha_flash(q, k, v, mask, scale=dh ** -0.5)
    # eager reference per head
    bias = jnp.where(mask, 0.0, -1e30)

    def per_head(qh, kh, vh):
        return eager(qh, kh, vh, bias, dh ** -0.5)

    want = jnp.stack(
        [per_head(q[:, :, i], k[:, :, i], v[:, :, i]) for i in range(h)], axis=2
    )
    valid = np.asarray(mask)
    got = np.asarray(out)
    want = np.asarray(want)
    for bi in range(b):
        np.testing.assert_allclose(
            got[bi][valid[bi]], want[bi][valid[bi]], rtol=3e-5, atol=3e-5
        )


def test_encoder_flash_matches_eager():
    from avsr_tpu.core.config import AVHubertEncoderConfig
    from avsr_tpu.models.avhubert import AVHubertTransformer

    rng = np.random.RandomState(2)
    kw = dict(
        encoder_embed_dim=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    cfg_e = AVHubertEncoderConfig(**kw)
    cfg_f = AVHubertEncoderConfig(**kw, use_flash_attention=True)
    x = jnp.asarray(rng.randn(2, 96, 128).astype(np.float32))
    mask = jnp.asarray(np.arange(96)[None, :] < np.array([96, 70])[:, None])
    m_e, m_f = AVHubertTransformer(cfg_e), AVHubertTransformer(cfg_f)
    variables = m_e.init(jax.random.PRNGKey(0), x, mask)
    out_e = m_e.apply(variables, x, mask)
    out_f = m_f.apply(variables, x, mask)
    got, want = np.asarray(out_f), np.asarray(out_e)
    valid = np.asarray(mask)
    for b in range(2):
        np.testing.assert_allclose(
            got[b][valid[b]], want[b][valid[b]], rtol=2e-4, atol=2e-4
        )


def test_flash_grads_match_eager():
    """Backward kernels (custom_vjp) vs autodiff through the dense path."""
    rng = np.random.RandomState(3)
    n, t, d = 3, 256, 64
    q = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    # mixed padding per row, including one fully-valid row
    bias = jnp.zeros((n, t), jnp.float32)
    bias = bias.at[1, 180:].set(-1e30).at[2, 64:].set(-1e30)
    w = jnp.asarray(rng.randn(n, t, d).astype(np.float32))  # cotangent shaper

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, scale=0.125) * w)

    def loss_eager(q, k, v):
        return jnp.sum(eager(q, k, v, bias, 0.125) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_encoder_flash_grads_match_eager():
    """End-to-end encoder gradients: flash vs dense, shared weights."""
    from avsr_tpu.core.config import AVHubertEncoderConfig
    from avsr_tpu.models.avhubert import AVHubertTransformer

    rng = np.random.RandomState(4)
    kw = dict(
        encoder_embed_dim=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0, dropout_input=0.0,
    )
    cfg_e = AVHubertEncoderConfig(**kw)
    cfg_f = AVHubertEncoderConfig(**kw, use_flash_attention=True)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32))
    mask = jnp.asarray(np.arange(128)[None, :] < np.array([128, 100])[:, None])
    m_e, m_f = AVHubertTransformer(cfg_e), AVHubertTransformer(cfg_f)
    variables = m_e.init(jax.random.PRNGKey(0), x, mask)

    def loss(model, params):
        out = model.apply({"params": params}, x, mask)
        return jnp.sum((out * mask[..., None]) ** 2)

    ge = jax.grad(lambda p: loss(m_e, p))(variables["params"])
    gf = jax.grad(lambda p: loss(m_f, p))(variables["params"])
    flat_e = jax.tree_util.tree_leaves_with_path(ge)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    for (pe, le), (pf, lf) in zip(flat_e, flat_f):
        assert pe == pf
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(le), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pe)}",
        )


def eager_dropout(q, k, v, bias, scale, mask):
    s = jnp.einsum("ntd,nsd->nts", q * scale, k) + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1) * mask  # mask pre-scaled 0 or 1/keep
    return jnp.einsum("nts,nsd->ntd", p, v)


def _dropout_mask(rng, n, t, keep):
    return jnp.asarray(
        (rng.rand(n, t, t) < keep).astype(np.float32) / keep
    )


def test_flash_dropout_matches_eager():
    """Kernel attention-prob dropout vs eager softmax->mask->matmul, same mask."""
    rng = np.random.RandomState(5)
    n, t, d = 3, 256, 64
    q = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    bias = jnp.zeros((n, t), jnp.float32).at[2, 192:].set(-1e30)
    mask = _dropout_mask(rng, n, t, keep=0.9)
    out = flash_attention(q, k, v, bias, scale=0.125, dropout_mask=mask)
    want = eager_dropout(q, k, v, bias, 0.125, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_flash_dropout_grads_match_eager():
    """Backward kernels under dropout vs autodiff of the eager masked path."""
    rng = np.random.RandomState(6)
    n, t, d = 2, 256, 64
    q = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    bias = jnp.zeros((n, t), jnp.float32).at[1, 128:].set(-1e30)
    mask = _dropout_mask(rng, n, t, keep=0.8)
    w = jnp.asarray(rng.randn(n, t, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, bias, scale=0.125, dropout_mask=mask) * w
        )

    def loss_eager(q, k, v):
        return jnp.sum(eager_dropout(q, k, v, bias, 0.125, mask) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=3e-4, atol=3e-4,
            err_msg=f"d{name} mismatch under dropout",
        )


def test_encoder_flash_dropout_active_and_deterministic():
    """attention_dropout in the flash encoder: stochastic in train, off in eval."""
    from avsr_tpu.core.config import AVHubertEncoderConfig
    from avsr_tpu.models.avhubert import AVHubertTransformer

    rng = np.random.RandomState(7)
    kw = dict(
        encoder_embed_dim=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.5, dropout_input=0.0, activation_dropout=0.0,
    )
    cfg_f = AVHubertEncoderConfig(**kw, use_flash_attention=True)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32))
    m = AVHubertTransformer(cfg_f)
    variables = m.init(jax.random.PRNGKey(0), x)
    out_det = m.apply(variables, x, deterministic=True)
    d1 = m.apply(variables, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    d2 = m.apply(variables, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    d1_again = m.apply(variables, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(d1), np.asarray(out_det)), (
        "train-mode flash attention must apply attention dropout"
    )
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_again))
