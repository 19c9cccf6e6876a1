"""Regression tests for the GSPMD grouped-conv kernel-grad bug.

jax 0.9.0: the kernel gradient of a ``feature_group_count >= 2`` conv traced
under a jit over a mesh WITH a model axis (weights replicated, batch sharded
on "data" only) is multiplied by the model-axis size. Discovered as a 2x
``pos_conv`` gradient in the cross-host DPxTP train-step test
(tests/distributed_worker.py); the fix is the shard_map routing in
ops/grouped_conv.py, scoped to train-step traces by the ``tp_safe_mesh``
context (entered inside the jitted body, i.e. active at trace time).

These tests run on the 8-virtual-device CPU backend from conftest.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsr_tpu.ops import grouped_conv as gc


def _mesh(data, model):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _kernel_grad(mesh, fn, x_h, w_h, safe):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(repl, data), out_shardings=repl)
    def g(w, x):
        def body():
            return jax.grad(lambda w: jnp.sum(fn(x, w) ** 2))(w)

        if safe:  # context active during trace, like the trainer's step
            with gc.tp_safe_mesh(mesh):
                return body()
        return body()

    return np.asarray(g(jax.device_put(w_h, repl), jax.device_put(x_h, data)))


CASES = [
    # (spatial shape, C, G, kernel spatial, strides) — mirrors the three
    # trained grouped-conv sites: pos_conv (multi-channel groups), conformer
    # depthwise (G=C), shufflenet stride-2 depthwise 3x3 (G=C, 2D)
    ((12,), 16, 4, (3,), (1,)),
    ((12,), 16, 16, (3,), (1,)),
    ((6, 6), 8, 8, (3, 3), (2, 2)),
]


@pytest.mark.parametrize("spatial,c,g,ks,st", CASES)
def test_safe_grouped_conv_layout_independent(spatial, c, g, ks, st):
    rng = np.random.RandomState(0)
    b = 8
    x_h = rng.randn(b, *spatial, c).astype(np.float32)
    w_h = (rng.randn(*ks, c // g, c) * 0.1).astype(np.float32)
    pad = [(k // 2, k // 2) for k in ks]

    def conv(x, w):
        return gc.grouped_conv(x, w, groups=g, strides=st, padding=pad)

    # plain path on a pure-DP mesh = ground truth
    want = _kernel_grad(_mesh(8, 1), conv, x_h, w_h, safe=False)

    # safe path: forward unchanged, grads layout-independent
    y_plain = conv(jnp.asarray(x_h), jnp.asarray(w_h))
    with gc.tp_safe_mesh(_mesh(4, 2)):
        # outside jit the shard_map still runs (over the global devices)
        y_safe = conv(jnp.asarray(x_h), jnp.asarray(w_h))
    np.testing.assert_allclose(
        np.asarray(y_plain), np.asarray(y_safe), rtol=2e-6, atol=2e-6
    )
    got_dp = _kernel_grad(_mesh(8, 1), conv, x_h, w_h, safe=True)
    got_tp = _kernel_grad(_mesh(4, 2), conv, x_h, w_h, safe=True)
    np.testing.assert_allclose(got_dp, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_tp, want, rtol=1e-5, atol=1e-5)


def test_plain_grouped_conv_bug_still_present():
    """Documents the upstream bug: if this starts PASSING on a jax upgrade,
    the workaround (and its trace-scoping machinery) can be retired."""
    rng = np.random.RandomState(0)
    x_h = rng.randn(8, 12, 16).astype(np.float32)
    w_h = (rng.randn(3, 4, 16) * 0.1).astype(np.float32)

    def conv(x, w):
        return gc.grouped_conv(x, w, groups=4, strides=(1,), padding=[(1, 1)])

    want = _kernel_grad(_mesh(8, 1), conv, x_h, w_h, safe=False)
    got = _kernel_grad(_mesh(4, 2), conv, x_h, w_h, safe=False)
    assert np.allclose(got, 2.0 * want, rtol=1e-4, atol=1e-3), (
        "GSPMD grouped-conv kernel-grad bug no longer doubles on a model-"
        "axis mesh — jax/XLA fixed upstream? Re-evaluate ops/grouped_conv.py."
    )


def test_tp_safe_mesh_scoping():
    # inactive by default; active only inside the context; DP meshes
    # (model axis 1) never trigger the shard_map path; nesting restores
    assert gc._active_mesh() is None
    dp, tp = _mesh(8, 1), _mesh(4, 2)
    with gc.tp_safe_mesh(dp):
        assert gc._active_mesh() is None  # model=1: plain path
        with gc.tp_safe_mesh(tp):
            assert gc._active_mesh() is tp
        assert gc._active_mesh() is None
    assert gc._active_mesh() is None
