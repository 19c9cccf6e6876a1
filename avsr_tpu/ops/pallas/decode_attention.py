"""Fused Pallas decode-step self-attention with lazy beam reorder.

Motivation (HLO profile of the beam loop at 98 audio-s/s): XLA lays the
self-KV cache out position-minor ({0,4,3,2,1}) to suit the attention einsum,
which turns every per-step KV row write (dynamic-update-slice) into a
full-buffer rewrite — 6 layers x 0.16 ms = ~42% of the decode step. This
kernel takes ownership of the attention read instead:

  - caches are (N, S, H*Dh) with the lane dim leading: Mosaic requires
    DMA slices of the tiled (second-minor) dim to be 8-aligned, so the
    per-utterance lane slice (K=3 lanes) must live on an untiled major dim;
  - the per-step row write stays an XLA dynamic-update-slice, but since the
    Pallas call is now the cache's only consumer, layout assignment keeps
    the default layout where one row per lane is a contiguous 2 KB run —
    not the full-buffer rewrite the einsum layout forced;
  - attention reads stream only rows [0, pos] through VMEM in chunks with
    an online-softmax accumulator: rows past the current position are never
    read, halving average traffic vs. a full-buffer read;
  - beam ancestry (lazy reorder) is resolved by a per-(lane, position)
    additive bias, exactly as in models/decoder.py attend_kv_lazy.

Mosaic shape rules (head dim 64 is below the 128-lane tile, so vectors can
never be shape-cast to (..., H, Dh)): everything stays 2-D on the packed
1024-wide head-interleaved axis, and per-head structure enters through two
constant 0/1 matmul matrices (seg: sum each head's 64-block to one column;
segT: broadcast one per-head column across its 64-block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _kernel(pos_ref, q_ref, bias_ref, k_hbm, v_hbm, out_ref, kscr, vscr,
            rsem_k, rsem_v, *, lanes: int, heads: int, dh: int, chunk: int):
    """One utterance: online-softmax attention over cache rows [0, pos].

    Block shapes:
      pos_ref  (1,)            SMEM  current position
      q_ref    (1, K, H*Dh)    VMEM  queries, pre-scaled by dh**-0.5
      bias_ref (1, K, S, J)    VMEM  ancestry+causal bias (0 valid, NEG else)
      k_hbm    (N, S, H*Dh)    ANY   full key cache (read-only)
      v_hbm    (N, S, H*Dh)    ANY   full value cache
      out_ref  (1, K, H*Dh)    VMEM  attention output
      kscr/vscr (K, chunk, H*Dh) VMEM scratch
    """
    s_max = k_hbm.shape[1]
    n0 = pl.program_id(0) * lanes  # this utterance's lane offset
    p_eff = jnp.minimum(pos_ref[0], s_max - 1)

    c_dim = heads * dh
    col = jax.lax.broadcasted_iota(jnp.int32, (c_dim, heads), 0) // dh
    hh = jax.lax.broadcasted_iota(jnp.int32, (c_dim, heads), 1)
    seg = (col == hh).astype(jnp.float32)  # (C, H)
    seg_t = seg.T  # (H, C)

    q2 = q_ref[0].astype(jnp.float32)  # (K, C)

    def chunk_body(c, carry):
        m, l, acc = carry  # (K, H), (K, H), (K, C)
        rk = pltpu.make_async_copy(
            k_hbm.at[pl.ds(n0, lanes), pl.ds(c * chunk, chunk)], kscr, rsem_k
        )
        rv = pltpu.make_async_copy(
            v_hbm.at[pl.ds(n0, lanes), pl.ds(c * chunk, chunk)], vscr, rsem_v
        )
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        new_m, new_l, new_acc = [], [], []
        for lane in range(lanes):  # static unroll over beam lanes
            # per stored lane j: scores (chunk, H) with the ancestry/causal
            # bias column broadcast across heads
            s_j = []
            for j in range(lanes):
                prod = kscr[j].astype(jnp.float32) * q2[lane : lane + 1, :]
                s_j.append(
                    jax.lax.dot_general(
                        prod, seg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + bias_ref[0, lane, pl.ds(c * chunk, chunk), j : j + 1]
                    .astype(jnp.float32)
                )
            m_c = s_j[0].max(axis=0, keepdims=True)
            for s in s_j[1:]:
                m_c = jnp.maximum(m_c, s.max(axis=0, keepdims=True))
            m_new = jnp.maximum(m[lane : lane + 1, :], m_c)  # (1, H)
            alpha = jnp.exp(m[lane : lane + 1, :] - m_new)
            l_new = l[lane : lane + 1, :] * alpha
            alpha_full = jax.lax.dot_general(  # broadcast over head blocks
                alpha, seg_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, C)
            a_new = acc[lane : lane + 1, :] * alpha_full
            for j in range(lanes):
                p = jnp.exp(s_j[j] - m_new)  # (chunk, H)
                l_new = l_new + p.sum(axis=0, keepdims=True)
                p_full = jax.lax.dot_general(
                    p, seg_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (chunk, C)
                a_new = a_new + (
                    p_full * vscr[j].astype(jnp.float32)
                ).sum(axis=0, keepdims=True)
            new_m.append(m_new)
            new_l.append(l_new)
            new_acc.append(a_new)
        return (
            jnp.concatenate(new_m, axis=0),
            jnp.concatenate(new_l, axis=0),
            jnp.concatenate(new_acc, axis=0),
        )

    m0 = jnp.full((lanes, heads), NEG_INF, jnp.float32)
    l0 = jnp.zeros((lanes, heads), jnp.float32)
    acc0 = jnp.zeros((lanes, c_dim), jnp.float32)
    n_chunks = (p_eff + chunk) // chunk  # rows [0, p_eff] (+ masked tail)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, chunk_body, (m0, l0, acc0))

    l_full = jax.lax.dot_general(
        l, seg_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = (acc / jnp.maximum(l_full, 1e-30)).astype(out_ref.dtype)


def decode_attention(
    pos: jax.Array,  # scalar int32 position
    q: jax.Array,  # (N, H*Dh) queries, pre-scaled
    k_cache: jax.Array,  # (N, S, H*Dh), row `pos` already written
    v_cache: jax.Array,  # (N, S, H*Dh)
    lane_bias: jax.Array,  # (B, K, S, J): 0 on ancestor lanes with s <= pos
    lanes: int,
    heads: int,
    chunk: int = 192,
    interpret: bool | None = None,
) -> jax.Array:
    """Attention output (N, H*Dh). Read-only over the caches; always called
    inside an enclosing jit (the beam-search program)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s_max, c = k_cache.shape
    b = n // lanes
    dh = c // heads
    chunk = min(chunk, s_max)
    while s_max % chunk:  # shrink to a divisor for short buffers
        chunk -= 1

    # a (1, K, C) block's trailing dims equal the (B, K, C) array's, which
    # satisfies the Mosaic VMEM block-shape rule for K < 8
    row = pl.BlockSpec((1, lanes, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    # TPU ANY-space refs must be the full array with a trivial index map;
    # the kernel DMA-slices its own lanes/rows out of the (N, S, C) caches
    cache = pl.BlockSpec(memory_space=pl.ANY)
    bias = pl.BlockSpec((1, lanes, s_max, lanes), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, lanes=lanes, heads=heads, dh=dh,
                          chunk=chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            row,  # q
            bias,
            cache,  # k_cache
            cache,  # v_cache
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, lanes, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((lanes, chunk, c), k_cache.dtype),
            pltpu.VMEM((lanes, chunk, c), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32), q.reshape(b, lanes, c), lane_bias,
        k_cache, v_cache,
    ).reshape(n, c)
