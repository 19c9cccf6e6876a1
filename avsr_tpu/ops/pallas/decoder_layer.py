"""One Pallas program per decoder layer per decode step.

Motivation (device trace at 224 audio-s/s): the beam-loop floor was ~783
us/step at B=8 — 6 fused attention kernels ~240 us, decoder FFN/cross-attn
weight reads ~210 us (true HBM floor), and ~150 small XLA ops of per-op
launch overhead (~300 us). Fusing each layer's norm1 + QKV + self-attention
(with lazy beam reorder) + cross-attention + FFN into ONE kernel removes
the per-op overhead entirely while keeping the weight reads at the HBM
floor.

Replaces, per layer per step, the reference's ~25-op incremental path
(/root/reference/src/nets/backend/transformer/decoder_layer.py:16,
decoder.py:153-183 forward_one_step) and this repo's earlier split
attention kernel (ops/pallas/decode_attention.py, kept for the non-fused
path and tests).

SELFCHECK-EXEMPT: opt-in path (cfg.decode_fused_layer, default OFF — lost
the round-3 device A/B to the split kernels, 816 vs 502 ms/batch at B=16);
no config the driver benches can reach it. Token-exact parity covered by
test_beam_parity.py when enabled. If this ever defaults on, it must gain a
selfcheck entry at serving shapes first (see tests/test_robustness.py
kernel-coverage guard).

Structure: ONE grid program per layer step. A first version used
grid=(B/G,) with grid-invariant weight BlockSpecs, but the pipeline
re-fetched the ~24 MB of layer weights for every grid program (device
trace: ~215 us/layer-step = 8 programs x 24 MB; the revisit optimization
does not apply across programs here), so v2 runs the utterance-group loop
INSIDE the kernel: weights are copied to VMEM once per layer step, and the
per-group K/V cache rows and encoder K/V stream through double-buffered
scratch (DMA for group g+1 issued before computing group g).

Formulation per group: identical block-diagonal matmul trick as
decode_attention v2 for BOTH attentions (per-head structure enters through
constant iota masks on packed 2-D axes; cross-utterance blocks are masked
to -inf):

  lanes  U  = G * K          rows of the group's residual stream
  cols   W  = G * H * K      (utterance, head, lane) score columns
  self   R  = U * S_dec      lane-major K/V cache rows of the group
  cross  R2 = G * S_enc      per-utterance encoder rows

The CURRENT step's K|V row (computed in-kernel from the QKV matmul) enters
the softmax analytically from registers — the stale cache row at `pos` is
masked out — because Mosaic cannot express a dynamically-positioned
single-row store into the tiled cache memref; the fresh row leaves the
kernel as a small output and XLA writes it into the cache with one
dynamic_update_slice per layer (the same op the non-fused path uses).

Bias layouts keep the LONG axis on lanes: the ancestry bias travels as
(NG, K, R) and the encoder-padding bias as (NG, 1, R2) — a (R, K=3)
layout would pad 3 lanes to 128 (21x the VMEM traffic) — and both are
expanded to (R, W) score shape by tiny constant-operand matmuls.

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
    x_ref,  # (NG, U, C) residual stream, grouped
    lanebias_ref,  # (NG, K, R) ancestry+causal bias (see module docstring)
    membias_ref,  # (NG, 1, R2) additive cross-attn row bias (0 / NEG)
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
    srck_hbm,  # (B, S_enc, C) ANY packed-head encoder keys
    srcv_hbm,  # (B, S_enc, C) ANY
    kv_hbm,  # (N, S_dec, 2C) ANY fused self K|V cache (read-only)
    xout_ref,  # (NG, U, C)
    kvrow_ref,  # (NG, U, 2C) fresh K|V rows (XLA writes them into the cache)
    kscr,  # (2, U, S_dec, C) double-buffered cache K rows
    vscr,  # (2, U, S_dec, C)
    skscr,  # (2, G, S_enc, C) double-buffered encoder K
    svscr,  # (2, G, S_enc, C)
    sem_k, sem_v, sem_sk, sem_sv,  # (2,) DMA semaphore arrays
    *, group: int, lanes: int, heads: int, n_groups: int,
):
    f32 = jnp.float32
    s_dec = kv_hbm.shape[1]
    c_dim = wout_ref.shape[0]
    dh = c_dim // heads
    hk = heads * lanes
    u = group * lanes
    w = group * hk
    r = u * s_dec
    s_enc = srck_hbm.shape[1]
    r2 = group * s_enc
    pos = pos_ref[0]
    wdtype = wqkv_ref.dtype

    def copies(g, slot):
        n0 = g * u
        b0 = g * group
        return (
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(n0, u), :, pl.ds(0, c_dim)],
                kscr.at[slot], sem_k.at[slot],
            ),
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(n0, u), :, pl.ds(c_dim, c_dim)],
                vscr.at[slot], sem_v.at[slot],
            ),
            pltpu.make_async_copy(
                srck_hbm.at[pl.ds(b0, group)], skscr.at[slot], sem_sk.at[slot]
            ),
            pltpu.make_async_copy(
                srcv_hbm.at[pl.ds(b0, group)], svscr.at[slot], sem_sv.at[slot]
            ),
        )

    def start(g, slot):
        for cp in copies(g, slot):
            cp.start()

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
    # rep_col (K, W): lane selector expanding the (K, R) bias to (R, W)
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
    ones_w = jnp.ones((1, w), f32)
    # stale cache row at pos is masked; its fresh value enters analytically
    srow = iota((r, 1), 0) % s_dec
    curmask = jnp.where(srow == pos, NEG_INF, 0.0)

    ln_w = lnw_ref[...].astype(f32)
    ln_b = lnb_ref[...].astype(f32)

    def dense(h, w_ref, b_ref):
        return jax.lax.dot_general(
            h.astype(wdtype), w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b_ref[0].astype(f32)

    start(0, 0)

    def body(g, carry):
        slot = jax.lax.rem(g, 2)
        cp_k, cp_v, cp_sk, cp_sv = copies(g, slot)

        @pl.when(g + 1 < n_groups)
        def _():
            start(g + 1, jax.lax.rem(g + 1, 2))

        x = x_ref[g].astype(f32)  # (U, C)

        # ---- self-attention sub-block ----
        h = _layer_norm(x, ln_w[0], ln_b[0])
        qkv = dense(h, wqkv_ref, bqkv_ref)  # (U, 3C) fp32
        q = qkv[:, :c_dim] * (dh ** -0.5)
        k_new = qkv[:, c_dim : 2 * c_dim]
        v_new = qkv[:, 2 * c_dim :]
        kvrow_ref[g, :, :c_dim] = k_new.astype(kvrow_ref.dtype)
        kvrow_ref[g, :, c_dim:] = v_new.astype(kvrow_ref.dtype)

        q_rep = jax.lax.dot_general(
            q, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (C, W)
        q_bd = (q_rep * headmask.T).astype(wdtype)

        # (K, R) bias -> (R, W): contraction over the query-lane axis
        b_rep = jax.lax.dot_general(
            lanebias_ref[g].astype(f32), rep_col,
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (R, W)

        # current-position scores from registers: lane (g,l)'s only valid
        # ancestor at s == pos is itself, which is exactly the rep mask.
        # k/v go through the cache dtype so this step scores the row exactly
        # as future steps will read it back.
        cur = jax.lax.dot_general(
            k_new.astype(kscr.dtype), q_bd.astype(kscr.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (U, W)
        cur = jnp.where(rep > 0, cur, NEG_INF)

        # split waits: self-attention only needs the cache rows; the encoder
        # K/V copies keep streaming until cross-attention actually reads them
        cp_k.wait()
        k_rows = kscr[slot].reshape(r, c_dim)
        scores = jax.lax.dot_general(
            k_rows, q_bd.astype(kscr.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b_rep + crossmask + curmask  # (R, W)
        m = jnp.maximum(
            scores.max(axis=0, keepdims=True), cur.max(axis=0, keepdims=True)
        )
        p = jnp.exp(scores - m)
        p_cur = jnp.exp(cur - m)  # (U, W)
        denom = jnp.maximum(
            p.sum(axis=0, keepdims=True) + p_cur.sum(axis=0, keepdims=True),
            1e-30,
        )
        p = p / denom
        p_cur = p_cur / denom

        cp_v.wait()
        v_rows = vscr[slot].reshape(r, c_dim)
        o_bd = jax.lax.dot_general(
            p.astype(vscr.dtype), v_rows, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + jax.lax.dot_general(
            p_cur.astype(vscr.dtype), v_new.astype(vscr.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
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
        cp_sk.wait()
        k2 = skscr[slot].reshape(r2, c_dim)
        mem_rows = jax.lax.dot_general(
            membias_ref[g].astype(f32), ones_w,
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (R2, W) outer product of the (1, R2) bias with ones
        scores2 = jax.lax.dot_general(
            k2, q2_bd.astype(k2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + crossmask2 + mem_rows  # (R2, W)
        m2 = scores2.max(axis=0, keepdims=True)
        p2 = jnp.exp(scores2 - m2)
        p2 = p2 / jnp.maximum(p2.sum(axis=0, keepdims=True), 1e-30)
        cp_sv.wait()
        v2 = svscr[slot].reshape(r2, c_dim)
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

        xout_ref[g] = x.astype(xout_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


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
    group: int = 4,
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
    # encoder length must be sublane-aligned for the per-group DMA slice of
    # the tiled (B, S_enc, C) memref; padded rows are masked by mem_bias.
    # Loop-invariant (src K/V are fixed per utterance), so XLA hoists the
    # pads out of the decode loop.
    pad = (-src_k.shape[1]) % 8
    if pad:
        src_k = jnp.pad(src_k, ((0, 0), (0, pad), (0, 0)))
        src_v = jnp.pad(src_v, ((0, 0), (0, pad), (0, 0)))
        mem_bias = jnp.pad(
            mem_bias, ((0, 0), (0, pad)), constant_values=NEG_INF
        )
    s_enc = src_k.shape[1]
    ng = b // group

    # (B, K, S, J) -> (NG, K, R) with R rows ordered (g_in_group, j, s)
    bias_k = jnp.transpose(lane_bias, (0, 1, 3, 2)).reshape(
        ng, group, lanes, lanes * s_dec
    )
    bias_k = jnp.transpose(bias_k, (0, 2, 1, 3)).reshape(
        ng, lanes, u * s_dec
    )
    mem_rows = mem_bias.reshape(ng, 1, group * s_enc)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # pos
    in_specs += [full(), full(), full()]  # x, lane bias, mem bias
    in_specs += [full() for _ in packed]  # weights (copied once per call)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),  # src k (streamed per group)
        pl.BlockSpec(memory_space=pltpu.ANY),  # src v
        pl.BlockSpec(memory_space=pltpu.ANY),  # kv cache (read-only)
    ]
    x_out, kv_row = pl.pallas_call(
        functools.partial(_kernel, group=group, lanes=lanes, heads=heads,
                          n_groups=ng),
        in_specs=in_specs,
        out_specs=[full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((ng, u, c), x.dtype),
            jax.ShapeDtypeStruct((ng, u, 2 * c), kv_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u, s_dec, c), kv_cache.dtype),
            pltpu.VMEM((2, u, s_dec, c), kv_cache.dtype),
            pltpu.VMEM((2, group, s_enc, c), src_k.dtype),
            pltpu.VMEM((2, group, s_enc, c), src_v.dtype),
        ] + [pltpu.SemaphoreType.DMA((2,))] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.reshape(pos, (1,)).astype(jnp.int32),
      x.reshape(ng, u, c), bias_k, mem_rows, *packed,
      src_k, src_v, kv_cache)
    # one contiguous row write per layer (same op the non-fused path uses;
    # XLA aliases the cache buffer, so this is a row write, not a copy)
    kv_out = jax.lax.dynamic_update_slice(
        kv_cache, kv_row.reshape(n, 1, 2 * c), (0, pos, 0)
    )
    return x_out.reshape(n, c), kv_out
