"""One Pallas program per decoder layer per decode step.

Motivation (device trace at 224 audio-s/s): the beam-loop floor was ~783
us/step at B=8 — 6 fused attention kernels ~240 us, decoder FFN/cross-attn
weight reads ~210 us (true HBM floor), and ~150 small XLA ops of per-op
launch overhead (~300 us). Fusing each layer's norm1 + QKV + self-attention
(with lazy beam reorder) + cross-attention + FFN into ONE kernel removes
the per-op overhead entirely while keeping the weight reads at the HBM
floor: the layer weights are VMEM-resident blocks whose index map is
constant across the grid, so Pallas DMAs them once per layer step and all
utterance groups reuse them.

Replaces, per layer per step, the reference's ~25-op incremental path
(/root/reference/src/nets/backend/transformer/decoder_layer.py:16,
decoder.py:153-183 forward_one_step) and this repo's earlier split
attention kernel (ops/pallas/decode_attention.py, kept for the non-fused
path and tests).

Formulation: identical block-diagonal matmul trick as decode_attention v2
for BOTH attentions (per-head structure enters through constant iota masks
on packed 2-D axes; cross-utterance blocks are masked to -inf):

  lanes  U  = G * K          rows of the group's residual stream
  cols   W  = G * H * K      (utterance, head, lane) score columns
  self   R  = U * S_dec      lane-major K/V cache rows of the group
  cross  R2 = G * S_enc      per-utterance encoder rows

Self-attention K/V: the group's rows stream in by manual DMA from the
(N, S, 2C) fused cache. The CURRENT step's K|V row (computed in-kernel from
the same QKV matmul) enters the softmax analytically from registers — the
stale cache row at `pos` is masked out — because Mosaic cannot express a
dynamically-positioned single-row store into the tiled cache memref; the
fresh row leaves the kernel as a small output and XLA writes it into the
cache with one dynamic_update_slice per layer (the same op the non-fused
path uses).

Residual stream runs fp32 inside the kernel; weight matmuls run in the
parameter dtype (bfloat16 for serving) with fp32 accumulation; softmax
statistics are fp32 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
LN_EPS = 1e-12


def _layer_norm(x, scale, bias):
    """fp32 LayerNorm over the last axis (eps 1e-12, reference layer_norm.py:12)."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    c = x - m
    v = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(v + LN_EPS) * scale + bias


def _kernel(
    pos_ref,  # SMEM (1,) int32 current position
    x_ref,  # (1, U, C) residual stream of the group
    lanebias_ref,  # (1, R, K) ancestry+causal bias, lane-major rows
    membias_ref,  # (1, R2, 1) additive cross-attn row bias (0 / NEG)
    lnw_ref,  # (3, C) norm1/2/3 scales
    lnb_ref,  # (3, C) norm1/2/3 biases
    wqkv_ref,  # (C, 3C)
    bqkv_ref,  # (1, 3C)
    wout_ref,  # (C, C) self out-proj
    bout_ref,  # (1, C)
    wq2_ref,  # (C, C) cross q-proj
    bq2_ref,  # (1, C)
    wout2_ref,  # (C, C) cross out-proj
    bout2_ref,  # (1, C)
    w1_ref,  # (C, F)
    b1_ref,  # (1, F)
    w2_ref,  # (F, C)
    b2_ref,  # (1, C)
    srck_ref,  # (1, G*S_enc, C) packed-head src keys for the group
    srcv_ref,  # (1, G*S_enc, C)
    kv_hbm,  # (N, S_dec, 2C) ANY fused self K|V cache (read-only)
    xout_ref,  # (1, U, C)
    kvrow_ref,  # (1, U, 2C) fresh K|V row out (XLA writes it into the cache)
    kscr,  # (U, S_dec, C) VMEM scratch
    vscr,  # (U, S_dec, C)
    sem_k, sem_v,
    *, group: int, lanes: int, heads: int,
):
    f32 = jnp.float32
    s_dec = kv_hbm.shape[1]
    c_dim = wout_ref.shape[0]
    dh = c_dim // heads
    hk = heads * lanes
    u = group * lanes
    w = group * hk
    r = u * s_dec
    s_enc = srck_ref.shape[1] // group
    r2 = group * s_enc
    n0 = pl.program_id(0) * u
    pos = pos_ref[0]
    wdtype = wqkv_ref.dtype

    rk = pltpu.make_async_copy(
        kv_hbm.at[pl.ds(n0, u), :, pl.ds(0, c_dim)], kscr, sem_k
    )
    rv = pltpu.make_async_copy(
        kv_hbm.at[pl.ds(n0, u), :, pl.ds(c_dim, c_dim)], vscr, sem_v
    )
    rk.start()
    rv.start()

    iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)  # noqa: E731
    # rep (U, W): row (g,l) feeds cols (g, :, l)
    rw_row = iota((u, w), 0)
    rw_col = iota((u, w), 1)
    rep = (
        (rw_row % lanes == rw_col % lanes) & (rw_row // lanes == rw_col // hk)
    ).astype(f32)
    # headmask (W, C): col block of head (col % HK) // K
    wc_row = iota((w, c_dim), 0)
    wc_col = iota((w, c_dim), 1)
    headmask = ((wc_row % hk) // lanes == wc_col // dh).astype(f32)
    # rep_col (K, W): lane selector for the (R, K) lane bias
    kw_row = iota((lanes, w), 0)
    kw_col = iota((lanes, w), 1)
    rep_col = (kw_col % lanes == kw_row).astype(f32)
    # self crossmask (R, W): row utterance != col utterance -> -inf
    rwx_row = iota((r, w), 0) // (lanes * s_dec)
    rwx_col = iota((r, w), 1) // hk
    crossmask = jnp.where(rwx_row == rwx_col, 0.0, NEG_INF)
    # cross-attn crossmask (R2, W)
    r2_row = iota((r2, w), 0) // s_enc
    r2_col = iota((r2, w), 1) // hk
    crossmask2 = jnp.where(r2_row == r2_col, 0.0, NEG_INF)

    x = x_ref[0].astype(f32)  # (U, C) residual stream
    ln_w = lnw_ref[...].astype(f32)
    ln_b = lnb_ref[...].astype(f32)

    def dense(h, w_ref, b_ref):
        return jax.lax.dot_general(
            h.astype(wdtype), w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b_ref[0].astype(f32)

    # ---- self-attention sub-block ----
    h = _layer_norm(x, ln_w[0], ln_b[0])
    qkv = dense(h, wqkv_ref, bqkv_ref)  # (U, 3C) fp32
    q = qkv[:, :c_dim] * (dh ** -0.5)
    k_new = qkv[:, c_dim : 2 * c_dim]
    v_new = qkv[:, 2 * c_dim :]

    # export the fresh K|V row; the enclosing XLA program writes it into the
    # cache with ONE dynamic_update_slice per layer (Mosaic cannot express a
    # dynamically-positioned 1-row slice of the tiled cache memref — both
    # VMEM and HBM views carry (8,128) tiling — so the write stays outside).
    # The current step's own attention contribution never needs the cache:
    # it is added to the softmax analytically from registers below.
    kvrow_ref[0, :, :c_dim] = k_new.astype(kvrow_ref.dtype)
    kvrow_ref[0, :, c_dim:] = v_new.astype(kvrow_ref.dtype)

    q_rep = jax.lax.dot_general(
        q, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (C, W)
    q_bd = (q_rep * headmask.T).astype(wdtype)

    lanebias = lanebias_ref[0].astype(f32)  # (R, K)
    b_rep = jax.lax.dot_general(
        lanebias, rep_col, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + crossmask  # (R, W)

    # current-position scores straight from registers: lane (g,l)'s only
    # valid ancestor at s == pos is itself, which is exactly the rep mask.
    # k/v go through the cache dtype so this step scores the row exactly as
    # future steps will read it back.
    cur = jax.lax.dot_general(
        k_new.astype(kscr.dtype), q_bd.astype(kscr.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (U, W)
    cur = jnp.where(rep > 0, cur, NEG_INF)
    # ...and the (stale) cache row at pos is masked out of the cache scores
    srow = iota((r, 1), 0) % s_dec
    curmask = jnp.where(srow == pos, NEG_INF, 0.0)

    rk.wait()
    k_rows = kscr[...].reshape(r, c_dim)
    scores = jax.lax.dot_general(
        k_rows, q_bd.astype(kscr.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b_rep + curmask  # (R, W)
    m = jnp.maximum(
        scores.max(axis=0, keepdims=True), cur.max(axis=0, keepdims=True)
    )
    p = jnp.exp(scores - m)
    p_cur = jnp.exp(cur - m)  # (U, W)
    denom = jnp.maximum(
        p.sum(axis=0, keepdims=True) + p_cur.sum(axis=0, keepdims=True), 1e-30
    )
    p = p / denom
    p_cur = p_cur / denom

    rv.wait()
    v_rows = vscr[...].reshape(r, c_dim)
    o_bd = jax.lax.dot_general(
        p.astype(vscr.dtype), v_rows, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        p_cur.astype(vscr.dtype), v_new.astype(vscr.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (W, C)
    attn = jax.lax.dot_general(
        rep, o_bd * headmask, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (U, C)
    x = x + dense(attn, wout_ref, bout_ref)

    # ---- cross-attention sub-block ----
    h = _layer_norm(x, ln_w[1], ln_b[1])
    q2 = dense(h, wq2_ref, bq2_ref) * (dh ** -0.5)
    q2_rep = jax.lax.dot_general(
        q2, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    q2_bd = (q2_rep * headmask.T).astype(wdtype)
    k2 = srck_ref[0]  # (R2, C)
    scores2 = jax.lax.dot_general(
        k2, q2_bd.astype(k2.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + crossmask2 + membias_ref[0].astype(f32)  # (R2, W)
    m2 = scores2.max(axis=0, keepdims=True)
    p2 = jnp.exp(scores2 - m2)
    p2 = p2 / jnp.maximum(p2.sum(axis=0, keepdims=True), 1e-30)
    v2 = srcv_ref[0]
    o2_bd = jax.lax.dot_general(
        p2.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (W, C)
    attn2 = jax.lax.dot_general(
        rep, o2_bd * headmask, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    x = x + dense(attn2, wout2_ref, bout2_ref)

    # ---- FFN sub-block ----
    h = _layer_norm(x, ln_w[2], ln_b[2])
    h = jax.nn.relu(dense(h, w1_ref, b1_ref))
    x = x + dense(h, w2_ref, b2_ref)

    xout_ref[0] = x.astype(xout_ref.dtype)


def pack_layer_params(layer_params, dtype) -> tuple:
    """Flatten one DecoderLayer param tree into the kernel's weight arrays.

    Done once at cache init (loop-invariant); layer_params is one entry of
    DecoderCache.params.
    """
    p = layer_params
    sa, ca = p["self_attn"], p["src_attn"]
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    ln_w = jnp.stack(
        [p["norm1"]["scale"], p["norm2"]["scale"], p["norm3"]["scale"]]
    )
    ln_b = jnp.stack([p["norm1"]["bias"], p["norm2"]["bias"], p["norm3"]["bias"]])
    w_qkv = jnp.concatenate(
        [sa["linear_q"]["kernel"], sa["linear_k"]["kernel"],
         sa["linear_v"]["kernel"]], axis=1,
    )
    b_qkv = jnp.concatenate(
        [sa["linear_q"]["bias"], sa["linear_k"]["bias"], sa["linear_v"]["bias"]]
    )
    return tuple(
        cast(a)
        for a in (
            ln_w, ln_b,
            w_qkv, b_qkv[None],
            sa["linear_out"]["kernel"], sa["linear_out"]["bias"][None],
            ca["linear_q"]["kernel"], ca["linear_q"]["bias"][None],
            ca["linear_out"]["kernel"], ca["linear_out"]["bias"][None],
            p["w_1"]["kernel"], p["w_1"]["bias"][None],
            p["w_2"]["kernel"], p["w_2"]["bias"][None],
        )
    )


def decoder_layer_step(
    pos: jax.Array,  # scalar int32
    x: jax.Array,  # (N, C) residual stream (all lanes)
    kv_cache: jax.Array,  # (N, S_dec, 2C) fused K|V
    src_k: jax.Array,  # (B, S_enc, C) packed heads
    src_v: jax.Array,  # (B, S_enc, C)
    mem_bias: jax.Array,  # (B, S_enc) f32 additive (0 valid / NEG pad)
    lane_bias: jax.Array,  # (B, K, S_dec, J) as decode_attention
    packed: tuple,  # pack_layer_params output
    lanes: int,
    heads: int,
    group: int = 2,
    interpret: bool | None = None,
):
    """Run one fused decoder layer step; returns (x_new, kv_cache_new)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s_dec, c2 = kv_cache.shape
    c = c2 // 2
    b = n // lanes
    group = min(group, b)
    while b % group:
        group -= 1
    u = group * lanes
    s_enc = src_k.shape[1]

    bias2 = jnp.transpose(lane_bias, (0, 3, 2, 1)).reshape(
        b // group, u * s_dec, lanes
    )
    mem_rows = mem_bias.reshape(b // group, group * s_enc, 1)
    srck = src_k.reshape(b // group, group * s_enc, c)
    srcv = src_v.reshape(b // group, group * s_enc, c)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec((1, u, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
        row,  # x
        pl.BlockSpec((1, u * s_dec, lanes), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # lane bias
        pl.BlockSpec((1, group * s_enc, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # mem bias rows
    ]
    in_specs += [const(p.shape) for p in packed]  # weights: grid-invariant
    in_specs += [
        pl.BlockSpec((1, group * s_enc, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # src k
        pl.BlockSpec((1, group * s_enc, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # src v
        pl.BlockSpec(memory_space=pltpu.ANY),  # kv cache (read-only)
    ]
    x_out, kv_row = pl.pallas_call(
        functools.partial(_kernel, group=group, lanes=lanes, heads=heads),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=[
            row,
            pl.BlockSpec((1, u, 2 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b // group, u, c), x.dtype),
            jax.ShapeDtypeStruct((b // group, u, 2 * c), kv_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((u, s_dec, c), kv_cache.dtype),
            pltpu.VMEM((u, s_dec, c), kv_cache.dtype),
        ] + [pltpu.SemaphoreType.DMA] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.reshape(pos, (1,)).astype(jnp.int32),
      x.reshape(b // group, u, c), bias2, mem_rows, *packed,
      srck, srcv, kv_cache)
    # one contiguous row write per layer (same op the non-fused path uses;
    # XLA aliases the cache buffer, so this is a row write, not a copy)
    kv_out = jax.lax.dynamic_update_slice(
        kv_cache, kv_row.reshape(n, 1, 2 * c), (0, pos, 0)
    )
    return x_out.reshape(n, c), kv_out
