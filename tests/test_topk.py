"""Pallas top-k kernel: exact parity with the iterated-argmax reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.decode.beam import _exact_topk  # noqa: E402
from avsr_tpu.ops.pallas.topk import topk_lastdim  # noqa: E402


@pytest.mark.parametrize("shape,k", [
    ((16, 3, 5049), 4),   # pre-beam shape
    ((16, 39), 3),        # flat candidate top-k shape
    ((2, 7), 7),          # k == v
    ((1, 1, 130), 2),
])
def test_matches_iterated_argmax(shape, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    v1, i1 = _exact_topk(x, k)
    v2, i2 = topk_lastdim(x, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_ties_break_low_index():
    x = jnp.asarray([[1.0, 3.0, 3.0, 2.0, 3.0]])
    v, i = topk_lastdim(x, 3)
    np.testing.assert_array_equal(np.asarray(i), [[1, 2, 4]])
    np.testing.assert_array_equal(np.asarray(v), [[3.0, 3.0, 3.0]])


def test_neg_sentinels():
    # beam rows are filled with -1e30 for dead lanes; must not produce NaN
    x = jnp.full((4, 39), -1.0e30, jnp.float32).at[:, 5].set(-2.0)
    v, i = topk_lastdim(x, 3)
    assert np.asarray(i)[:, 0].tolist() == [5, 5, 5, 5]
    assert np.isfinite(np.asarray(v)[:, 0]).all()
    lv, li = _exact_topk(x, 3)
    np.testing.assert_array_equal(np.asarray(li), np.asarray(i))
