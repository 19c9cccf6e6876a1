"""Fused Pallas decode-step self-attention with lazy beam reorder.

Motivation (HLO profile of the beam loop at 98 audio-s/s): XLA lays the
self-KV cache out position-minor to suit the attention einsum, which turns
every per-step KV row write (dynamic-update-slice) into a full-buffer
rewrite — 6 layers x 0.16 ms = ~42% of the decode step. This kernel takes
ownership of the attention read instead: caches are (N, S, H*Dh) with the
lane dim leading, the per-step row write stays an XLA dynamic-update-slice
(the kernel is the cache's only consumer, so layout assignment keeps rows
contiguous), and beam ancestry (lazy reorder) is resolved by an additive
bias, exactly as in models/decoder.py attend_kv_lazy.

Formulation (v2): everything is expressed as a handful of large 2-D
matmuls so the MXU does the work (v1 serialized 9 tiny (lane, ancestor)
dot pairs per chunk and ran latency-bound at ~76 us/layer/step):

  rows    R = K_lanes * S       (one utterance's cache, lane-major rows)
  cols    W = H * K             (head-major (head, lane) score columns)

  Q_bd (C, W)   block-diagonal queries: col h*K+l holds lane l's query on
                head h's Dh-block of the feature axis, zeros elsewhere —
                built with two constant masks and one (C,K)x(K,W) matmul.
  S    (R, W) = KV_rows (R, C) @ Q_bd            per-head scores
  B    (R, W) = bias2 (R, K) @ rep (K, W)        ancestry bias, head-bcast
  P    (R, W) = exp(S + B - colmax)              full softmax (no online
                accumulation: the whole buffer sits in VMEM)
  O_bd (W, C) = P^T @ V_rows                     contract over rows
  out  (K, C) = sel (K, W) @ (O_bd * blockmask)  pick matching-head blocks

Mosaic shape rules: head dim 64 is below the 128-lane tile, so vectors are
never reshaped to (..., H, Dh); per-head structure enters through constant
0/1 iota masks on the packed feature axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _kernel(q_ref, bias_ref, k_hbm, v_hbm, out_ref, kscr, vscr,
            rsem_k, rsem_v, *, lanes: int, heads: int, dh: int):
    """One utterance: full-buffer block-diagonal attention.

    Block shapes:
      q_ref    (1, K, C)       VMEM  queries, pre-scaled by dh**-0.5
      bias_ref (1, R, K)       VMEM  ancestry+causal bias, lane-major rows
      k_hbm    (N, S, C)       ANY   full key cache (read-only)
      v_hbm    (N, S, C)       ANY   full value cache
      out_ref  (1, K, C)       VMEM  attention output
      kscr/vscr (K, S, C)      VMEM  this utterance's rows
    """
    s_max = k_hbm.shape[1]
    c_dim = heads * dh
    w = heads * lanes
    r = lanes * s_max
    n0 = pl.program_id(0) * lanes

    rk = pltpu.make_async_copy(k_hbm.at[pl.ds(n0, lanes)], kscr, rsem_k)
    rv = pltpu.make_async_copy(v_hbm.at[pl.ds(n0, lanes)], vscr, rsem_v)
    rk.start()
    rv.start()

    f32 = jnp.float32
    # rep (K, W): rep[l, h*K+l'] = [l == l']
    col_l = jax.lax.broadcasted_iota(jnp.int32, (lanes, w), 1) % lanes
    row_l = jax.lax.broadcasted_iota(jnp.int32, (lanes, w), 0)
    rep = (col_l == row_l).astype(f32)
    # blockmask (W, C): [c // dh == h] for col-row h*K+l
    head_of_w = jax.lax.broadcasted_iota(jnp.int32, (w, c_dim), 0) // lanes
    head_of_c = jax.lax.broadcasted_iota(jnp.int32, (w, c_dim), 1) // dh
    blockmask = (head_of_w == head_of_c).astype(f32)

    q = q_ref[0].astype(f32)  # (K, C)
    # Q_bd (C, W) = (q^T replicated per head) * blockmask^T
    q_rep = jax.lax.dot_general(
        q, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # contract lane dim: (C, W) with col h*K+l = q[l, :]
    q_bd = q_rep * blockmask.T

    bias = bias_ref[0].astype(f32)  # (R, K)
    b_rep = jax.lax.dot_general(
        bias, rep, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # (R, W)

    rk.wait()
    kv_dtype = kscr.dtype
    k_rows = kscr[...].reshape(r, c_dim)
    scores = jax.lax.dot_general(
        k_rows, q_bd.astype(kv_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b_rep  # (R, W)

    m = scores.max(axis=0, keepdims=True)  # (1, W)
    p = jnp.exp(scores - m)  # (R, W)
    denom = jnp.maximum(p.sum(axis=0, keepdims=True), 1e-30)  # (1, W)
    p = p / denom  # normalize pre-matmul: avoids a (1,W)->(W,1) relayout

    rv.wait()
    v_rows = vscr[...].reshape(r, c_dim)
    o_bd = jax.lax.dot_general(
        p.astype(kv_dtype), v_rows, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (W, C)

    sel = rep  # (K, W) selector: same matrix
    out = jax.lax.dot_general(
        sel, o_bd * blockmask, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (K, C)
    out_ref[0] = out.astype(out_ref.dtype)


def decode_attention(
    pos: jax.Array,  # scalar int32 position (masking is carried by the bias)
    q: jax.Array,  # (N, H*Dh) queries, pre-scaled
    k_cache: jax.Array,  # (N, S, H*Dh), row `pos` already written
    v_cache: jax.Array,  # (N, S, H*Dh)
    lane_bias: jax.Array,  # (B, K, S, J): 0 on ancestor lanes with s <= pos
    lanes: int,
    heads: int,
    chunk: int | None = None,  # unused (v1 compat); full-buffer read
    interpret: bool | None = None,
) -> jax.Array:
    """Attention output (N, H*Dh). Read-only over the caches; always called
    inside an enclosing jit (the beam-search program). Rows with bias
    NEG_INF (s > pos, or non-ancestor lanes) contribute exp(-1e30-m) = 0,
    so reads past the logical position are harmless."""
    del pos, chunk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s_max, c = k_cache.shape
    b = n // lanes
    dh = c // heads

    # (B, K, S, J) -> lane-major rows (B, J*S, K): row j*S+s matches the
    # kernel's flattened (lane, position) cache rows
    bias2 = jnp.transpose(lane_bias, (0, 3, 2, 1)).reshape(
        b, lanes * s_max, lanes
    )

    row = pl.BlockSpec((1, lanes, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, lanes * s_max, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cache = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(_kernel, lanes=lanes, heads=heads, dh=dh),
        grid=(b,),
        in_specs=[row, bias, cache, cache],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, lanes, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lanes, s_max, c), k_cache.dtype),
            pltpu.VMEM((lanes, s_max, c), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(q.reshape(b, lanes, c), bias2, k_cache, v_cache).reshape(n, c)
