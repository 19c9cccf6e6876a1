"""Pallas TPU flash attention (tiled online-softmax), forward + backward.

Computes softmax(q @ k^T * scale + bias) @ v without materializing the
(T, T) score matrix in HBM: the K/V sequence is streamed through VMEM in
blocks with the standard online-softmax running (max, sum, accumulator)
update. Padding enters as an additive key bias (0 valid / -inf-ish pad),
matching the encoder's masking semantics (models/avhubert.py).

The backward pass (jax.custom_vjp) recomputes attention probabilities from
the saved per-row logsumexp (flash-attention-2 style): one kernel produces
dQ streaming K/V, a second produces dK/dV streaming Q/dO.

Attention-prob dropout (reference trains with attention_dropout=0.1 inside
HF Wav2Vec2Attention, avhubert.py:747-layer) has two implementations with
identical marginal semantics:

- **In-kernel PRNG (TPU serving path, default on hardware).** Each kernel
  seeds the core PRNG from (seed, absolute head index[, q-block, k-block])
  via pltpu.prng_seed and regenerates the keep mask tile it needs with
  pltpu.prng_random_bits — forward and both backward kernels derive
  byte-identical masks from the same coordinates, so nothing is
  materialized. The XLA alternative materializes a (N, T, T) mask in HBM:
  at B=24/T=384 that is 113 MB/layer written by a threefry fusion
  (~1.6 ms/layer, regenerated again by the remat recompute) and read by
  all three kernels — measured ~15-20%% of the whole train step.
- **Explicit mask operand (interpret/CPU path + tests).** Mosaic's
  prng_seed has no interpret-mode rule, so off-TPU the pre-scaled mask
  (entries 0 or 1/keep) is generated outside with jax.random.bernoulli
  and streamed through the kernels. This also keeps the path exactly
  testable against an eager reference given the same mask. The two paths
  draw different bits (only the dropout distribution matches), which is
  the usual contract for platform-dependent dropout.

Dropout applies to the *normalized* probabilities; since the per-row
normalizer l uses the undropped p and division is elementwise, the
online-softmax update accumulates p*mask into acc while l accumulates p,
matching softmax -> dropout -> matmul exactly. The saved delta =
rowsum(dO*O) identity still holds under dropout (delta = rowsum(P o dP~)
= dO.O).

Layout: q, k, v are (N=B*H, T, D) with T padded to the block size; grids
are (N, T/block) and each program streams the opposing sequence blocks
with a fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _seed_prng(seed_ref, *coords):
    """Seed the core PRNG from 2 seed words + tile coordinates.

    Mosaic's prng_seed takes at most 2 values, so the coordinates (head,
    q-block, k-block) are folded into the words with odd-constant integer
    mixing (wrap-around int32 arithmetic). Forward and backward kernels
    call this with identical coordinates, which is the only property the
    dropout masks need; the constants just decorrelate the streams.
    """
    a = seed_ref[0]
    b = seed_ref[1]
    mults = (0x9E3779B1, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1,
             0x2545F491)
    # wrap the uint32 constants into int32 two's-complement range
    m32 = [m - 2**32 if m >= 2**31 else m for m in mults]
    for i, c in enumerate(coords):
        c = jnp.int32(c)
        a = a + c * jnp.int32(m32[2 * i])
        b = (b ^ a) + c * jnp.int32(m32[2 * i + 1])
    pltpu.prng_seed(a, b)


def _rng_keep_mask(shape, rate: float):
    """Pre-scaled keep mask from the core PRNG (call pltpu.prng_seed first).

    Bits are compared in the SIGNED int32 domain: uniform int32 < theta has
    probability (theta + 2^31) / 2^32, so theta = keep * 2^32 - 2^31 gives
    P(keep) = 1 - rate without relying on Mosaic unsigned compares.
    """
    keep = 1.0 - rate
    theta = int(round(keep * 2**32 - 2**31))
    theta = max(min(theta, 2**31 - 1), -(2**31))
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(shape), jnp.int32
    )
    return jnp.where(bits < jnp.int32(theta), 1.0 / keep, 0.0)


def _flash_fwd_kernel(bias_ref, *refs, block_k: int, scale: float,
                      rate: float = 0.0):
    # blocks: bias (1,1,T), [seed (2,) SMEM | mask (1,block_q,T)],
    #         q (1,block_q,D), k/v (1,T,D), o (1,block_q,D), lse (1,1,block_q)
    seed_ref = mask_ref = None
    if rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    elif len(refs) == 6:
        mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    block_q = q_ref.shape[1]
    # matmuls run in the input dtype (bf16 single-pass MXU when training in
    # bf16) with fp32 accumulation; softmax statistics stay fp32
    q = q_ref[0]  # (block_q, D)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        bias = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k) fp32
        s = s * scale + bias[None, :]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        # normalizer l uses the UNDROPPED p (dropout applies post-softmax);
        # only the value accumulation sees the pre-scaled 0-or-1/keep mask
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        pv = p
        if seed_ref is not None:
            # tile (head, q-block, k-block): bwd kernels re-derive the same
            # coordinates, hence the same bits
            _seed_prng(seed_ref, pl.program_id(0), pl.program_id(1), i)
            pv = p * _rng_keep_mask((block_q, block_k), rate)
        elif mask_ref is not None:
            pv = p * mask_ref[0, :, pl.ds(i * block_k, block_k)]
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            pv.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_cur, l_cur, acc

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, t // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_bwd_dq_kernel(bias_ref, *refs, block_k: int, scale: float,
                         rate: float = 0.0):
    # blocks: bias (1,1,T), [seed (2,) SMEM | mask (1,block_q,T)],
    #         q/do (1,block_q,D), k/v (1,T,D), lse/delta (1,1,block_q),
    #         dq (1,block_q,D)
    seed_ref = mask_ref = None
    if rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    elif len(refs) == 8:
        mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    block_q = q_ref.shape[1]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]  # (block_q,)
    delta = delta_ref[0, 0]

    def body(i, acc):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        bias = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jnp.exp(s - lse[:, None])  # (block_q, block_k), normalized
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if seed_ref is not None:
            # dP = (dO V^T) o M/keep : dropout gates the prob gradient
            _seed_prng(seed_ref, pl.program_id(0), pl.program_id(1), i)
            dp = dp * _rng_keep_mask((block_q, block_k), rate)
        elif mask_ref is not None:
            dp = dp * mask_ref[0, :, pl.ds(i * block_k, block_k)]
        ds = (p * (dp - delta[:, None])).astype(k_blk.dtype)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    acc = jax.lax.fori_loop(0, t // block_k, body, acc0)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(bias_ref, *refs, block_q: int, scale: float,
                          rate: float = 0.0):
    # blocks: bias (1,1,block_k), [seed (2,) SMEM | mask (1,T,block_k)],
    #         k/v (1,block_k,D), q/do (1,T,D), lse/delta (1,1,T),
    #         dk/dv (1,block_k,D)
    seed_ref = mask_ref = None
    if rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
    elif len(refs) == 9:
        mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
    t = q_ref.shape[1]
    d = q_ref.shape[2]
    block_k = k_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0].astype(jnp.float32)  # (block_k,)

    def body(i, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta_blk = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]
        p = jnp.exp(s - lse_blk[:, None])  # (block_q, block_k) fp32
        pm = p
        dmask = None
        if seed_ref is not None:
            # same (head, q-block, k-block) coordinates as the fwd/dq tiles
            _seed_prng(seed_ref, pl.program_id(0), i, pl.program_id(1))
            dmask = _rng_keep_mask((block_q, k.shape[0]), rate)
            pm = p * dmask
        elif mask_ref is not None:
            pm = p * mask_ref[0, pl.ds(i * block_q, block_q), :]
        # dV = P~^T dO with the dropped+rescaled probabilities
        dv = dv + jax.lax.dot_general(
            pm.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dmask is not None:
            dp = dp * dmask
        elif mask_ref is not None:
            dp = dp * mask_ref[0, pl.ds(i * block_q, block_q), :]
        ds = (p * (dp - delta_blk[:, None])).astype(q_blk.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, t // block_q, body, (zeros, zeros))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


# ---------------------------------------------------------------------------
# Resident variant: for moderate T (<= RESIDENT_MAX_T) the full (T, T) score
# matrix of one head fits VMEM, so streaming/online-softmax buys nothing —
# and at AVSR shapes (T=384, Dh=64) the streaming grid (B*H, T/block) is
# hundreds of near-empty programs whose launch overhead dominates (measured
# 409 us/layer fwd at B=6 where DMA+compute justify ~30 us). Here each
# program owns G whole heads: grid (N/G,), plain softmax in fp32 VMEM, and
# ONE backward kernel that recomputes P and emits dQ, dK, dV together (no
# separate dq/dkv passes, no XLA delta pass — delta = rowsum(dO*O) is done
# in-kernel).
# ---------------------------------------------------------------------------

RESIDENT_MAX_T = 512


def _resident_max_t() -> int:
    # env override for A/B measurement (AVSR_FLASH_RESIDENT_MAX_T=0 forces
    # the streaming kernels at any T)
    import os

    return int(os.environ.get("AVSR_FLASH_RESIDENT_MAX_T", RESIDENT_MAX_T))


def _resident_fwd_kernel(bias_ref, *refs, scale: float, group: int,
                         rate: float = 0.0):
    # blocks: bias (G, 1, T), [seed (2,) SMEM | mask (G, T, T)],
    #         q/k/v (G, T, D), o (G, T, D), lse (G, 1, T)
    seed_ref = mask_ref = None
    if rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    elif len(refs) == 6:
        mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    for g in range(group):  # static unroll: straight-line MXU work
        q = q_ref[g]  # (T, D)
        k = k_ref[g]
        v = v_ref[g]
        t = q.shape[0]
        bias = bias_ref[g, 0].astype(jnp.float32)  # (T,)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias[None, :]  # (T, T) fp32, resident
        m = jnp.max(s, axis=1)
        p = jnp.exp(s - m[:, None])
        l = jnp.maximum(jnp.sum(p, axis=1), 1e-30)
        if seed_ref is not None:
            # seed by ABSOLUTE head index: fwd and bwd may pick different
            # VMEM group sizes, so program_id alone would misalign the bits
            _seed_prng(seed_ref, pl.program_id(0) * group + g)
            pv = p * _rng_keep_mask((t, t), rate)
        else:
            pv = p if mask_ref is None else p * mask_ref[g]
        o = jax.lax.dot_general(
            (pv / l[:, None]).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = o.astype(o_ref.dtype)
        lse_ref[g, 0] = m + jnp.log(l)


def _resident_bwd_kernel(bias_ref, *refs, scale: float, group: int,
                         rate: float = 0.0):
    # blocks: bias (G, 1, T), [seed (2,) SMEM | mask (G, T, T)],
    #         q/k/v/do/out (G, T, D), lse (G, 1, T), dq/dk/dv (G, T, D)
    seed_ref = mask_ref = None
    if rate > 0.0:
        (seed_ref, q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    elif len(refs) == 10:
        (mask_ref, q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    f32 = jnp.float32
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        bias = bias_ref[g, 0].astype(f32)
        lse = lse_ref[g, 0]  # (T,)
        # delta_i = rowsum(dO_i * O_i) — in-kernel, no XLA pre-pass
        delta = jnp.sum(do_ref[g].astype(f32) * out_ref[g].astype(f32), axis=1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale + bias[None, :]
        p = jnp.exp(s - lse[:, None])  # normalized probs (T, T)
        dmask = None
        if seed_ref is not None:
            _seed_prng(seed_ref, pl.program_id(0) * group + g)
            dmask = _rng_keep_mask((q.shape[0], q.shape[0]), rate)
            pm = p * dmask
        else:
            pm = p if mask_ref is None else p * mask_ref[g]
        # dV = P~^T dO (dropped+rescaled probs)
        dv = jax.lax.dot_general(
            pm.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        if dmask is not None:
            dp = dp * dmask
        elif mask_ref is not None:
            dp = dp * mask_ref[g]
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dq_ref[g] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[g] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _pick_group(n: int, t: int, has_mask: bool, n_bufs: int) -> int:
    """Largest divisor of n whose VMEM block footprint stays ~<= 8 MB."""
    budget = 8 * 1024 * 1024
    g = 8
    while g > 1:
        per_head = n_bufs * t * 128 * 2 + (t * t * 2 if has_mask else 0)
        if n % g == 0 and g * per_head <= budget:
            break
        g -= 1
    while n % g:
        g -= 1
    return g


def _fwd_impl_resident(q, k, v, key_bias, mask, seed, rate, scale, interpret):
    n, t, d = q.shape
    # the seed path generates a (T, T) bits + mask temporary per head:
    # size the group as if the mask block were an operand
    g = _pick_group(n, t, mask is not None or rate > 0.0, 5)
    seq = pl.BlockSpec((g, t, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    # bias ships (N, 1, T): Mosaic requires the last two block dims to be
    # (8k, 128k) or the full array dims — (1, T) satisfies that; (G, T) won't
    in_specs = [pl.BlockSpec((g, 1, t), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [key_bias[:, None, :]]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    elif mask is not None:
        in_specs.append(
            pl.BlockSpec((g, t, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    in_specs += [seq, seq, seq]
    args += [q, k, v]
    return pl.pallas_call(
        functools.partial(_resident_fwd_kernel, scale=scale, group=g,
                          rate=rate),
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=[
            seq,
            pl.BlockSpec((g, 1, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), q.dtype),
            jax.ShapeDtypeStruct((n, 1, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=_resolve_interpret(interpret),
    )(*args)


def _bwd_impl_resident(q, k, v, key_bias, mask, seed, rate, out, lse, g_,
                       scale, interpret):
    n, t, d = q.shape
    g = _pick_group(n, t, mask is not None or rate > 0.0, 8)
    seq = pl.BlockSpec((g, t, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((g, 1, t), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [key_bias[:, None, :]]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    elif mask is not None:
        in_specs.append(
            pl.BlockSpec((g, t, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    in_specs += [seq, seq, seq, seq, seq,
                 pl.BlockSpec((g, 1, t), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [q, k, v, g_, out, lse]
    return pl.pallas_call(
        functools.partial(_resident_bwd_kernel, scale=scale, group=g,
                          rate=rate),
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=[seq, seq, seq],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), q.dtype),
            jax.ShapeDtypeStruct((n, t, d), k.dtype),
            jax.ShapeDtypeStruct((n, t, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=_resolve_interpret(interpret),
    )(*args)


def _fwd_impl(q, k, v, key_bias, mask, seed, rate, scale, block_q, block_k,
              interpret):
    n, t, d = q.shape
    if t <= _resident_max_t():
        return _fwd_impl_resident(q, k, v, key_bias, mask, seed, rate, scale,
                                  interpret)
    if t % block_q or t % block_k:
        raise ValueError(f"sequence length {t} must be a multiple of the block size")
    grid = (n, t // block_q)
    in_specs = [
        pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [key_bias[:, None, :]]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    elif mask is not None:
        in_specs.append(
            pl.BlockSpec((1, block_q, t), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    in_specs += [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [q, k, v]
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, scale=scale,
                          rate=rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), q.dtype),
            jax.ShapeDtypeStruct((n, 1, t), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
    )(*args)


def _bwd_impl(q, k, v, key_bias, mask, seed, rate, out, lse, g, scale,
              block_q, block_k, interpret):
    n, t, d = q.shape
    if t <= _resident_max_t():
        return _bwd_impl_resident(q, k, v, key_bias, mask, seed, rate, out,
                                  lse, g, scale, interpret)
    interpret = _resolve_interpret(interpret)
    bias3 = key_bias[:, None, :]
    # delta_i = rowsum(dO_i * O_i), cheap elementwise reduce left to XLA.
    # (Holds under dropout too: rowsum(P o dP~) = dO . O.)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (N, 1, T)

    full_seq = lambda b, i: (b, 0, 0)
    row_blk_q = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    seq_ref = pl.BlockSpec((1, t, d), full_seq, memory_space=pltpu.VMEM)
    stat_blk_q = pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                              memory_space=pltpu.VMEM)
    stat_full = pl.BlockSpec((1, 1, t), full_seq, memory_space=pltpu.VMEM)

    dq_specs = [stat_full]
    dq_args = [bias3]
    if rate > 0.0:
        dq_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        dq_args.append(seed)
    elif mask is not None:
        dq_specs.append(
            pl.BlockSpec((1, block_q, t), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
        dq_args.append(mask)
    dq_specs += [row_blk_q, seq_ref, seq_ref, row_blk_q, stat_blk_q, stat_blk_q]
    dq_args += [q, k, v, g, lse, delta]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale,
                          rate=rate),
        grid=(n, t // block_q),
        in_specs=dq_specs,
        out_specs=row_blk_q,
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        interpret=interpret,
    )(*dq_args)

    row_blk_k = pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    bias_blk_k = pl.BlockSpec((1, 1, block_k), lambda b, i: (b, 0, i),
                              memory_space=pltpu.VMEM)
    dkv_specs = [bias_blk_k]
    dkv_args = [bias3]
    if rate > 0.0:
        dkv_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        dkv_args.append(seed)
    elif mask is not None:
        # column block of the (N, Tq, Tk) mask: all q rows, this k block
        dkv_specs.append(
            pl.BlockSpec((1, t, block_k), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
        )
        dkv_args.append(mask)
    dkv_specs += [seq_ref, row_blk_k, row_blk_k, seq_ref, stat_full, stat_full]
    dkv_args += [q, k, v, g, lse, delta]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, scale=scale,
                          rate=rate),
        grid=(n, t // block_k),
        in_specs=dkv_specs,
        out_specs=[row_blk_k, row_blk_k],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, d), k.dtype),
            jax.ShapeDtypeStruct((n, t, d), v.dtype),
        ],
        interpret=interpret,
    )(*dkv_args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_attention(q, k, v, key_bias, mask, seed, scale, block_q, block_k,
                     interpret, has_dropout, rate):
    out, _ = _fwd_impl(q, k, v, key_bias, mask if has_dropout else None,
                       seed, rate, scale, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, key_bias, mask, seed, scale, block_q,
                         block_k, interpret, has_dropout, rate):
    out, lse = _fwd_impl(q, k, v, key_bias, mask if has_dropout else None,
                         seed, rate, scale, block_q, block_k, interpret)
    return out, (q, k, v, key_bias, mask, seed, out, lse)


def _flash_attention_bwd(scale, block_q, block_k, interpret, has_dropout,
                         rate, res, g):
    q, k, v, key_bias, mask, seed, out, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, key_bias, mask if has_dropout else None,
                           seed, rate, out, lse, g, scale, block_q, block_k,
                           interpret)
    return (dq, dk, dv, jnp.zeros_like(key_bias), jnp.zeros_like(mask),
            jnp.zeros_like(seed))


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret",
                     "dropout_rate"),
)
def flash_attention(
    q: jax.Array,  # (N, T, D)
    k: jax.Array,  # (N, T, D)
    v: jax.Array,  # (N, T, D)
    key_bias: jax.Array,  # (N, T) additive bias (0 valid, very negative pad)
    scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
    dropout_mask: jax.Array | None = None,  # (N, T, T) entries 0 or 1/keep
    dropout_rate: float = 0.0,  # in-kernel PRNG dropout (TPU lowering only)
    dropout_seed: jax.Array | None = None,  # (2,) int32, with dropout_rate
) -> jax.Array:
    """dropout_mask and (dropout_rate, dropout_seed) are mutually exclusive:
    the former streams an explicit pre-scaled mask through the kernels
    (works everywhere, testable against an eager reference), the latter
    regenerates the mask inside each kernel from the seed and the tile
    coordinates (TPU Mosaic only — no interpret-mode prng_seed rule)."""
    dummy_seed = jnp.zeros((2,), jnp.int32)
    if dropout_rate > 0.0:
        if dropout_mask is not None:
            raise ValueError("pass dropout_mask or dropout_rate, not both")
        if dropout_seed is None:
            raise ValueError("dropout_rate needs dropout_seed")
        dummy = jnp.zeros((1, 1, 1), q.dtype)
        return _flash_attention(q, k, v, key_bias, dummy,
                                dropout_seed.astype(jnp.int32), scale,
                                block_q, block_k, interpret, False,
                                float(dropout_rate))
    if dropout_mask is None:
        dummy = jnp.zeros((1, 1, 1), q.dtype)
        return _flash_attention(q, k, v, key_bias, dummy, dummy_seed, scale,
                                block_q, block_k, interpret, False, 0.0)
    return _flash_attention(q, k, v, key_bias, dropout_mask, dummy_seed,
                            scale, block_q, block_k, interpret, True, 0.0)


def mha_flash(
    q: jax.Array,  # (B, T, H, Dh)
    k: jax.Array,
    v: jax.Array,
    padding_mask: jax.Array | None,  # (B, T) True = valid, or None
    scale: float,
    block: int = 128,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Multi-head wrapper: (B, T, H, Dh) -> (B, T, H, Dh), T padded to block.

    dropout_rate > 0 with a PRNG key applies attention-prob dropout inside
    the kernel (reference attention_dropout, HF Wav2Vec2Attention): the
    pre-scaled keep mask is drawn here once and shared by forward and both
    backward kernels via the VJP residuals.
    """
    b, t, h, dh = q.shape
    pad = (-t) % block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    tp = t + pad
    if padding_mask is None:
        bias = jnp.zeros((b, tp), jnp.float32)
        if pad:
            bias = bias.at[:, t:].set(NEG_INF)
    else:
        valid = jnp.pad(padding_mask, ((0, 0), (0, pad)))
        bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)

    def to_rows(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, tp, dh)

    mask = None
    seed = None
    rate = 0.0
    if dropout_rate > 0.0 and dropout_rng is not None:
        if jax.default_backend() == "tpu":
            # in-kernel PRNG dropout: no (N, T, T) mask generation or HBM
            # traffic; seed words derived from the layer's dropout key
            kd = dropout_rng
            if jax.dtypes.issubdtype(kd.dtype, jax.dtypes.prng_key):
                kd = jax.random.key_data(kd)
            seed = jax.lax.bitcast_convert_type(
                kd.reshape(-1)[-2:], jnp.int32
            )
            rate = float(dropout_rate)
        else:
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(
                dropout_rng, keep, (b * h, tp, tp)
            ).astype(q.dtype) / jnp.asarray(keep, q.dtype)

    out = flash_attention(
        to_rows(q), to_rows(k), to_rows(v),
        jnp.repeat(bias, h, axis=0), scale=scale,
        block_q=block, block_k=block, dropout_mask=mask,
        dropout_rate=rate, dropout_seed=seed,
    )
    out = out.reshape(b, h, tp, dh).transpose(0, 2, 1, 3)
    return out[:, :t]
