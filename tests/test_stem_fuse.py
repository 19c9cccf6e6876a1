"""Parity tests for the fused stem tail (BN + PReLU + 3x3/s2 max pool).

The Pallas kernels (interpret mode here; Mosaic lowering is exercised by
bench_train/profile runs on hardware) must match the jnp reference, and the
reference must match the flax composition the model used before the fusion
(nn.BatchNorm + PReLU + nn.max_pool), including gradients and the
first-maximum tie-breaking of the pool backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsr_tpu.ops.pallas.stem_fuse import bn_prelu_pool, reference

N, H, W, C = 8, 8, 8, 64


def _data(dtype=np.float32, seed=0):
    r = np.random.RandomState(seed)
    return (
        jnp.asarray(r.randn(N, H, W, C).astype(dtype)),
        jnp.asarray(1.0 + 0.1 * r.randn(C).astype(np.float32)),
        jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
        jnp.asarray(0.25 + 0.05 * r.randn(C).astype(np.float32)),
    )


def _flax_composition(x, scale, bias, alpha, train):
    """The exact module stack ResEncoder used before the fusion."""

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, v):
            v = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn",
            )(v)
            a = self.param("alpha", lambda *_: alpha, (C,))
            v = jnp.where(v >= 0, v, a.astype(v.dtype) * v)
            return nn.max_pool(
                v, window_shape=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)),
            )

    tail = Tail()
    variables = {
        "params": {"bn": {"scale": scale, "bias": bias}, "alpha": alpha},
        "batch_stats": {
            "bn": {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))}
        },
    }
    out, updated = tail.apply(
        variables, x, mutable=["batch_stats"] if train else []
    )
    return out


def test_reference_matches_flax_train():
    x, scale, bias, alpha = _data()
    got, mean, var = reference(x, scale, bias, alpha, train=True)
    want = _flax_composition(x, scale, bias, alpha, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(jnp.mean(x, axis=(0, 1, 2))), atol=1e-5
    )


def test_reference_matches_flax_eval():
    x, scale, bias, alpha = _data()
    rm = jnp.zeros((C,))
    rv = jnp.ones((C,))
    got = reference(
        x, scale, bias, alpha, train=False, running_mean=rm, running_var=rv
    )
    want = _flax_composition(x, scale, bias, alpha, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_forward_parity_train():
    x, scale, bias, alpha = _data()
    got, gm, gv = bn_prelu_pool(
        x, scale, bias, alpha, train=True, interpret=True
    )
    want, wm, wv = reference(x, scale, bias, alpha, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(wm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=1e-5)


def test_kernel_forward_parity_eval():
    x, scale, bias, alpha = _data(seed=3)
    rm = jnp.asarray(0.1 * np.random.RandomState(4).randn(C), jnp.float32)
    rv = jnp.asarray(
        1.0 + 0.1 * np.random.RandomState(5).rand(C), jnp.float32
    )
    got = bn_prelu_pool(
        x, scale, bias, alpha, train=False, running_mean=rm,
        running_var=rv, interpret=True,
    )
    want = reference(
        x, scale, bias, alpha, train=False, running_mean=rm, running_var=rv
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_grad_parity(seed):
    x, scale, bias, alpha = _data(seed=seed)
    w = jnp.asarray(
        np.random.RandomState(9).randn(N, H // 2, W // 2, C).astype(
            np.float32
        )
    )

    def loss_kernel(x, s, b, a):
        out, _, _ = bn_prelu_pool(x, s, b, a, train=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_ref(x, s, b, a):
        out, _, _ = reference(x, s, b, a, train=True)
        return jnp.sum(out.astype(jnp.float32) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(x, scale, bias, alpha)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, alpha)
    for a, b, name in zip(gk, gr, ["dx", "dscale", "dbias", "dalpha"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4,
            err_msg=name,
        )


def test_kernel_grad_tie_breaking():
    # duplicate values inside pooling windows: the gradient must go to the
    # FIRST maximum in row-major window order, exactly like the reference
    r = np.random.RandomState(7)
    base = r.randn(N, H // 2, W // 2, C).astype(np.float32)
    x = np.repeat(np.repeat(base, 2, axis=1), 2, axis=2)  # 2x2 duplicates
    x = jnp.asarray(x)
    _, scale, bias, alpha = _data()
    w = jnp.asarray(r.randn(N, H // 2, W // 2, C).astype(np.float32))

    def loss(fn, x):
        out, _, _ = fn(x, scale, bias, alpha, train=True)
        return jnp.sum(out.astype(jnp.float32) * w)

    gk = jax.grad(
        lambda v: loss(
            lambda *a, **k: bn_prelu_pool(*a, interpret=True, **k), v
        )
    )(x)
    gr = jax.grad(lambda v: loss(reference, v))(x)
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(gr), atol=5e-5, rtol=1e-5
    )


def test_bf16_smoke():
    x, scale, bias, alpha = _data()
    xb = x.astype(jnp.bfloat16)
    got, _, _ = bn_prelu_pool(
        xb, scale, bias, alpha, train=True, interpret=True
    )
    want, _, _ = reference(xb, scale, bias, alpha, train=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
    )


def test_model_tree_unchanged():
    # the fused ResEncoder path must declare the exact variable tree the
    # unfused composition produced (checkpoint compatibility)
    from avsr_tpu.models.resnet import ResEncoder

    video = jnp.asarray(
        np.random.RandomState(0).randn(2, 4, 16, 16, 1).astype(np.float32)
    )
    v = ResEncoder().init(jax.random.PRNGKey(0), video, False)
    assert set(v["params"]["frontend_bn"]) == {"scale", "bias"}
    assert set(v["params"]["frontend_prelu"]) == {"alpha"}
    assert set(v["batch_stats"]["frontend_bn"]) == {"mean", "var"}
    # train step with mutable batch_stats updates the running average
    out, upd = ResEncoder().apply(
        v, video, True, mutable=["batch_stats"], rngs={}
    )
    assert out.shape == (2, 4, 512)
    bn = upd["batch_stats"]["frontend_bn"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)


def test_bf16_param_grads_match_primal_dtypes():
    # the trainer casts params to bf16 before apply (train/trainer.py); the
    # custom_vjp bwd must return cotangents in the PRIMAL dtypes, not f32
    # (ADVICE r4: jax 0.9.0 tolerates the mismatch, other versions hard-error)
    x, scale, bias, alpha = _data()
    sb = scale.astype(jnp.bfloat16)
    bb = bias.astype(jnp.bfloat16)
    ab = alpha.astype(jnp.bfloat16)

    def loss(fn, x, s, b, a):
        out, _, _ = fn(x, s, b, a, train=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(
        lambda *p: loss(
            lambda *a, **k: bn_prelu_pool(*a, interpret=True, **k), *p
        ),
        argnums=(0, 1, 2, 3),
    ))(x, sb, bb, ab)
    assert gk[0].dtype == x.dtype
    assert gk[1].dtype == jnp.bfloat16
    assert gk[2].dtype == jnp.bfloat16
    assert gk[3].dtype == jnp.bfloat16
    gr = jax.jit(jax.grad(
        lambda *p: loss(reference, *p), argnums=(0, 1, 2, 3)
    ))(x, sb, bb, ab)
    for got, want, name in zip(gk, gr, ["dx", "dscale", "dbias", "dalpha"]):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=name,
        )
