"""Pallas cumulative-logsumexp kernel vs the associative-scan reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.ops.pallas.scan_logsumexp import cumlogsumexp  # noqa: E402


def reference(x):
    def combine(a, b):
        (ma, sa), (mb, sb) = a, b
        m = jnp.maximum(ma, mb)
        safe = jnp.maximum(m, -3.0e38)
        s = sa * jnp.exp(ma - safe) + sb * jnp.exp(mb - safe)
        return m, s

    m, s = jax.lax.associative_scan(combine, (x, jnp.ones_like(x)), axis=0)
    return jnp.log(jnp.maximum(s, 1e-37)) + m


@pytest.mark.parametrize("shape", [(16, 3, 5), (37, 4), (377, 3, 5), (8, 130)])
def test_matches_associative_scan(shape):
    rng = np.random.RandomState(sum(shape))
    x = (rng.randn(*shape) * 3.0).astype(np.float32)
    got = cumlogsumexp(jnp.asarray(x))
    want = reference(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_monotone_drift_depth():
    """The regression the flagship anchor caught: a sequence drifting far
    beyond the fp32 exp range must keep prefix-local precision."""
    t = 377
    rng = np.random.RandomState(0)
    x = (-8.5 * np.arange(t)[::-1] + rng.randn(t)).astype(np.float32)
    x = x[:, None, None] + np.zeros((1, 2, 3), np.float32)
    got = np.asarray(cumlogsumexp(jnp.asarray(x)))
    want = np.asarray(reference(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # brute-force fp64 oracle on one column
    col = x[:, 0, 0].astype(np.float64)
    brute = np.array([np.log(np.sum(np.exp(col[: i + 1] - col[: i + 1].max())))
                      + col[: i + 1].max() for i in range(t)])
    np.testing.assert_allclose(got[:, 0, 0], brute, rtol=1e-4, atol=1e-4)


def test_with_neg_inf_prefix():
    x = np.full((12, 4), -np.inf, np.float32)
    x[5:] = 1.0
    got = np.asarray(cumlogsumexp(jnp.asarray(x)))
    assert np.all(got[5:] > 0)  # finite once data appears
    want = np.asarray(reference(jnp.asarray(x)))
    np.testing.assert_allclose(got[5:], want[5:], rtol=1e-6)


def test_vmapped():
    rng = np.random.RandomState(3)
    x = (rng.randn(6, 20, 3, 5) * 2).astype(np.float32)
    got = jax.vmap(cumlogsumexp)(jnp.asarray(x))
    want = jax.vmap(reference)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
