"""Exact small-k top-k over a large last axis as ONE Pallas program.

The beam loop needs top-S' (S'~4) of the (B, K, V=5049) decoder logits
every step. XLA's lax.top_k lowers to a full sort on TPU (~10x cost), and
the iterated-argmax formulation (k rounds of max/argmax/mask) is exact but
costs ~10 separate ops per step, each a full HBM read+write of the logits
buffer (~1 MB) plus launch overhead — ~100 us/step at B=16 (device trace,
fusion.909-938 cluster).

Here the buffer is loaded to VMEM once and all k rounds run in-register:
  m_r  = max(x)                      (VPU reduce)
  id_r = min(iota where x == m_r)    (ties toward the lower index, matching
                                      lax.top_k / torch.topk / argmax)
  x    = where(iota == id_r, -inf, x)

Semantics identical to decode/beam._exact_topk (descending, lower-index
ties); parity-tested against it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I32 = 2**31 - 1  # python int: jnp scalars would be captured consts


def _xla_topk(x: jax.Array, k: int):
    """Plain-XLA iterated argmax with identical semantics (kill-switch
    AVSR_TOPK_KERNEL=0; also the shape-fallback for degenerate inputs)."""
    iota = jnp.arange(x.shape[-1], dtype=jnp.int32)
    vals, ids = [], []
    v = x
    for _ in range(k):
        idx = v.argmax(-1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(v, idx[..., None], -1)[..., 0])
        ids.append(idx)
        v = jnp.where(iota == idx[..., None], -jnp.inf, v)
    return jnp.stack(vals, -1), jnp.stack(ids, -1)


def _topk_kernel(x_ref, vals_ref, ids_ref, *, k: int):
    # blocks: x (R, V) fp32, vals (R, k) fp32, ids (R, k) i32
    r, v = x_ref.shape
    x = x_ref[...].astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, v), 1)
    vals, ids = [], []
    for j in range(k):
        m = jnp.max(x, axis=1, keepdims=True)  # (R, 1)
        hit = x == m
        idx = jnp.min(jnp.where(hit, iota, _BIG_I32), axis=1, keepdims=True)
        vals.append(m)
        ids.append(idx)
        if j + 1 < k:
            x = jnp.where(iota == idx, -jnp.inf, x)
    # single full-block stores (per-column strided VMEM stores are a Mosaic
    # lowering risk; no other kernel in the package uses them)
    vals_ref[...] = jnp.concatenate(vals, axis=1).astype(vals_ref.dtype)
    ids_ref[...] = jnp.concatenate(ids, axis=1)


def topk_lastdim(
    x: jax.Array, k: int, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """Exact (values, indices) top-k along the last axis, descending,
    ties toward the lower index. Leading axes are flattened into rows;
    the whole buffer runs as one grid program (beam-loop shapes are ~1 MB)."""
    if os.environ.get("AVSR_TOPK_KERNEL", "1") == "0":
        return _xla_topk(x, k)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    v = x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, v)
    vals, ids = pl.pallas_call(
        functools.partial(_topk_kernel, k=k),
        grid=(1,),
        in_specs=[pl.BlockSpec((rows, v), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rows, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, k), x.dtype),
            jax.ShapeDtypeStruct((rows, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2)
    return vals.reshape(*lead, k), ids.reshape(*lead, k)
