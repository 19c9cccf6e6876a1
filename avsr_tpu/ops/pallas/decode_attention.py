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
dot pairs per chunk and ran latency-bound at ~76 us/layer/step; v2 runs
~47 us at one utterance per program). Each grid program handles a GROUP of
G utterances to amortize per-program launch/DMA overhead; cross-utterance
score blocks are computed (the MXU does them for free inside one big
matmul) and masked to -inf so they contribute exp(-1e30 - m) = 0.

  rows  R = G * K * S     lane-major cache rows for the group
  cols  W = G * H * K     (utterance, head, lane) score columns

  Q_bd (C, W)   block-diagonal queries: col (g,h,l) holds query (g,l) on
                head h's Dh-block — one (GK,C)x(GK,W) matmul + iota masks
  S    (R, W) = KV_rows (R, C) @ Q_bd           per-head scores
  B    (R, W) = bias2 (R, K) @ rep + crossmask  ancestry bias, head-bcast
  P    (R, W) = exp(S + B - colmax) / colsum    full softmax in VMEM
  O_bd (W, C) = P^T @ V_rows                    contract over rows
  out (GK, C) = sel (GK, W) @ (O_bd * headmask) pick matching-head blocks

Mosaic shape rules: head dim 64 is below the 128-lane tile, so vectors are
never reshaped to (..., H, Dh); per-head and per-utterance structure enter
through constant 0/1 iota masks on packed 2-D axes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


_PREFIX_CHUNK = 64  # S-axis granularity of the prefix-bounded cache reads


def _kernel(pos_ref, *refs, group: int, lanes: int, heads: int, dh: int,
            write_row: bool):
    """One group of `group` utterances: block-diagonal attention.

    Block shapes (U = group*lanes, R = U*S, W = group*heads*lanes):
      pos_ref  (1,)          SMEM  current decode position (scalar)
      q_ref    (1, U, C)     VMEM  queries, pre-scaled by dh**-0.5
      bias_ref (1, R, K)     VMEM  ancestry+causal bias, lane-major rows
      new_ref  (1, U, 1, 2C) VMEM  this step's K|V row (write_row only)
      kv_hbm   (N, S, 2C)    ANY   fused K|V cache; when write_row the
                                   kernel itself stores row `pos` (aliased
                                   output), replacing the upstream XLA
                                   dynamic-update-slice launch per layer
      out_ref  (1, U, C)     VMEM  attention output
      kv_out   (N, S, 2C)    ANY   aliased cache output (write_row only)
      kscr/vscr (U, S, C)    VMEM  the group's K / V rows

    Cache reads are PREFIX-BOUNDED: only the _PREFIX_CHUNK-aligned prefix
    covering rows [0, pos] is DMA'd (the dominant per-step HBM traffic —
    averaged over a full 375-step decode only ~75% of the buffer is ever
    valid). Skipped chunks are zero-filled: uninitialized VMEM scratch can
    hold non-finite bf16 patterns which would poison the score matmul
    (exp(-inf + NaN) = NaN), while zero rows are exactly annihilated by the
    NEG_INF bias. VPU zero-fill is ~10x cheaper than the HBM DMA it avoids.

    write_row mode: the prefix read of the chunk containing `pos` may race
    the row-write DMA over the same HBM bytes, but the VMEM copy of row
    `pos` is unconditionally patched from new_ref after the read completes,
    so the scores never see stale or torn data.
    """
    it = iter(refs)
    q_ref = next(it)
    bias_ref = next(it)
    new_ref = next(it) if write_row else None
    kv_hbm = next(it)
    out_ref = next(it)
    kv_out = next(it) if write_row else None
    kscr = next(it)
    vscr = next(it)
    rsem_k = next(it)
    rsem_v = next(it)
    wsem = next(it) if write_row else None

    s_max = kv_hbm.shape[1]
    c_dim = heads * dh
    hk = heads * lanes
    u = group * lanes
    w = group * hk
    r = u * s_max
    n0 = pl.program_id(0) * u
    s_valid = pos_ref[0] + 1  # rows [0, pos] hold written K/V

    if write_row:
        # write-through of this step's K|V row to the aliased HBM cache;
        # started first so it overlaps the score/bias precompute below
        wcopy = pltpu.make_async_copy(
            new_ref.at[0],
            kv_out.at[pl.ds(n0, u), pl.ds(pos_ref[0], 1), :],
            wsem,
        )
        wcopy.start()

    # buffers are rounded to 64 upstream (Recognizer/BeamSearch); tiny test
    # caps fall back to one unconditional full copy
    chunk = _PREFIX_CHUNK if s_max % _PREFIX_CHUNK == 0 else s_max
    copies = []
    for j in range(s_max // chunk):
        s0 = j * chunk
        rk = pltpu.make_async_copy(
            kv_hbm.at[pl.ds(n0, u), pl.ds(s0, chunk), pl.ds(0, c_dim)],
            kscr.at[:, pl.ds(s0, chunk), :], rsem_k,
        )
        rv = pltpu.make_async_copy(
            kv_hbm.at[pl.ds(n0, u), pl.ds(s0, chunk), pl.ds(c_dim, c_dim)],
            vscr.at[:, pl.ds(s0, chunk), :], rsem_v,
        )
        needed = s0 < s_valid

        @pl.when(needed)
        def _start(rk=rk, rv=rv):
            rk.start()
            rv.start()

        @pl.when(jnp.logical_not(needed))
        def _zero(s0=s0):
            zeros = jnp.zeros((u, chunk, c_dim), kscr.dtype)
            kscr[:, pl.ds(s0, chunk), :] = zeros
            vscr[:, pl.ds(s0, chunk), :] = zeros

        copies.append((needed, rk, rv))

    f32 = jnp.float32
    iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)  # noqa: E731
    # rep (U, W): [(row % K == col % K) and (row // K == col // HK)]
    rw_row = iota((u, w), 0)
    rw_col = iota((u, w), 1)
    rep = (
        (rw_row % lanes == rw_col % lanes)
        & (rw_row // lanes == rw_col // hk)
    ).astype(f32)
    # headmask (W, C): [c // dh == (col % HK) // K]
    wc_row = iota((w, c_dim), 0)
    wc_col = iota((w, c_dim), 1)
    headmask = ((wc_row % hk) // lanes == wc_col // dh).astype(f32)
    # rep_col (K, W): [col % K == row] — bias lane selector (group-agnostic)
    kw_row = iota((lanes, w), 0)
    kw_col = iota((lanes, w), 1)
    rep_col = (kw_col % lanes == kw_row).astype(f32)
    # crossmask (R, W): NEG where row utterance != col utterance
    rwx_row = iota((r, w), 0) // (lanes * s_max)
    rwx_col = iota((r, w), 1) // hk
    crossmask = jnp.where(rwx_row == rwx_col, 0.0, NEG_INF)

    q = q_ref[0].astype(f32)  # (U, C)
    q_rep = jax.lax.dot_general(
        q, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (C, W): col (g,h,l) = q[(g,l), :]
    q_bd = q_rep * headmask.T

    bias = bias_ref[0].astype(f32)  # (R, K)
    b_rep = jax.lax.dot_general(
        bias, rep_col, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + crossmask  # (R, W)

    for needed, rk, _rv in copies:
        @pl.when(needed)
        def _wait(rk=rk):
            rk.wait()

    if write_row:
        # patch row `pos` in VMEM from the input (the HBM prefix read holds
        # the pre-write bytes for that row)
        kscr[:, pl.ds(pos_ref[0], 1), :] = new_ref[0][:, :, :c_dim]

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

    for needed, _rk, rv in copies:
        @pl.when(needed)
        def _wait(rv=rv):
            rv.wait()

    if write_row:
        vscr[:, pl.ds(pos_ref[0], 1), :] = new_ref[0][:, :, c_dim:]

    v_rows = vscr[...].reshape(r, c_dim)
    o_bd = jax.lax.dot_general(
        p.astype(kv_dtype), v_rows, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (W, C)

    out = jax.lax.dot_general(
        rep, o_bd * headmask, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (U, C)
    out_ref[0] = out.astype(out_ref.dtype)
    if write_row:
        wcopy.wait()


def _kernel_resident(pos_ref, *refs, ngroups: int, group: int,
                     lanes: int, heads: int, dh: int, write_row: bool):
    """v3: ONE program per layer per step; group loop runs in-kernel.

    The v2 grid ran B/G programs per layer (96 launches/step at B=32 across
    the 6 layers) and the ~1.9 us/program launch+semaphore cost put the
    kernels at ~56% of their own DMA floor. Here the grid is 1 and the
    (Python-unrolled, ngroups is static) group loop runs inside the
    program with DOUBLE-BUFFERED K/V scratch: group g+1's prefix DMAs are
    issued before group g's matmuls, so the HBM engine stays saturated and
    per-launch overhead is paid 6x/step instead of 96x. Compute per group
    is identical to the v2 kernel body (same block-diagonal formulation,
    same prefix-bounding, same zero-fill of skipped chunks).

    Block shapes (U = group*lanes, R = U*S, W = group*heads*lanes):
      pos_ref  (1,)            SMEM
      q_ref    (NG, U, C)      VMEM  all groups' queries, pre-scaled
      bias_ref (NG, K, R)      VMEM  ancestry bias, LANE-major last axis
                                     (the v2 (R, K) layout would pad K=3
                                     lanes to 128 when fully resident)
      new_ref  (NG, U, 1, 2C)  VMEM  this step's K|V rows (write_row only;
                                     explicit unit S dim so the in-kernel
                                     row patch slices without None)
      kv_hbm   (N, S, 2C)      ANY
      out_ref  (NG, U, C)      VMEM
      kv_out   (N, S, 2C)      ANY   aliased cache output (write_row only)
      kscr/vscr (2, U, S, C)   VMEM  double-buffered group K / V rows

    write_row mode — the fix for the v2-era Mosaic blocker: a size-1 DMA
    slice at a dynamic position on the (8,128)-tiled S axis is rejected,
    but an 8-ALIGNED 8-row block slice is legal. The prefix read always
    covers the chunk containing `pos` (s0 <= pos < s_valid), so after
    patching row `pos` in VMEM from new_ref, the kernel DMAs the aligned
    8-row block [8*(pos//8), +8) back to the aliased HBM cache —
    write-only traffic (the other 7 rows are re-written with the bytes
    just read, bit-identical). This replaces the XLA
    dynamic-update-slice row write whose unaligned tiled-dim RMW +
    relayout copy cost ~25 us/layer/step at B=32 (HLO: copy.148x +
    dynamic_update_slice.7x) with ~0.6 us of pure write DMA.
    """
    it = iter(refs)
    q_ref = next(it)
    bias_ref = next(it)
    new_ref = next(it) if write_row else None
    kv_hbm = next(it)
    out_ref = next(it)
    kv_out = next(it) if write_row else None
    # two independent 3-D scratch buffers per side (NOT one 4-D (2, ...)
    # buffer): the buffer index is static in the unrolled group loop, and
    # 3-D refs keep every load/store/DMA in the v2-proven Mosaic patterns
    # (a 4-D ref mixing an int index with a dynamic pl.ds lowers through an
    # unsupported gather)
    kbufs = (next(it), next(it))
    vbufs = (next(it), next(it))
    rsem_k = next(it)
    rsem_v = next(it)
    wsem = next(it) if write_row else None

    s_max = kv_hbm.shape[1]
    c_dim = heads * dh
    hk = heads * lanes
    u = group * lanes
    w = group * hk
    r = u * s_max
    s_valid = pos_ref[0] + 1
    chunk = _PREFIX_CHUNK if s_max % _PREFIX_CHUNK == 0 else s_max
    nchunks = s_max // chunk

    def issue(g: int):
        """Start group g's prefix-bounded K/V chunk copies into buffer g%2.

        Returns the (needed, copy) lists so compute(g) can wait exactly the
        copies that were started (conditional starts need conditional
        waits with matching predicates)."""
        kscr, vscr = kbufs[g % 2], vbufs[g % 2]
        buf = g % 2
        n0 = g * u
        started = []
        for j in range(nchunks):
            s0 = j * chunk
            # per-buffer semaphores: both buffers' copies are in flight
            # concurrently, and a shared semaphore would let one buffer's
            # completion satisfy the other's wait
            rk = pltpu.make_async_copy(
                kv_hbm.at[pl.ds(n0, u), pl.ds(s0, chunk), pl.ds(0, c_dim)],
                kscr.at[:, pl.ds(s0, chunk), :], rsem_k.at[buf],
            )
            rv = pltpu.make_async_copy(
                kv_hbm.at[pl.ds(n0, u), pl.ds(s0, chunk), pl.ds(c_dim, c_dim)],
                vscr.at[:, pl.ds(s0, chunk), :], rsem_v.at[buf],
            )
            needed = s0 < s_valid

            @pl.when(needed)
            def _start(rk=rk, rv=rv):
                rk.start()
                rv.start()

            @pl.when(jnp.logical_not(needed))
            def _zero(s0=s0, kscr=kscr, vscr=vscr):
                zeros = jnp.zeros((u, chunk, c_dim), kscr.dtype)
                kscr[:, pl.ds(s0, chunk), :] = zeros
                vscr[:, pl.ds(s0, chunk), :] = zeros

            started.append((needed, rk, rv))
        return started

    f32 = jnp.float32
    iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)  # noqa: E731
    rw_row = iota((u, w), 0)
    rw_col = iota((u, w), 1)
    rep = (
        (rw_row % lanes == rw_col % lanes)
        & (rw_row // lanes == rw_col // hk)
    ).astype(f32)
    wc_row = iota((w, c_dim), 0)
    wc_col = iota((w, c_dim), 1)
    headmask = ((wc_row % hk) // lanes == wc_col // dh).astype(f32)
    kw_row = iota((lanes, w), 0)
    kw_col = iota((lanes, w), 1)
    rep_col = (kw_col % lanes == kw_row).astype(f32)
    rwx_row = iota((r, w), 0) // (lanes * s_max)
    rwx_col = iota((r, w), 1) // hk
    crossmask = jnp.where(rwx_row == rwx_col, 0.0, NEG_INF)

    def compute(g: int, started):
        kscr, vscr = kbufs[g % 2], vbufs[g % 2]
        n0 = g * u
        q = q_ref[g].astype(f32)  # (U, C)
        q_rep = jax.lax.dot_general(
            q, rep, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        q_bd = q_rep * headmask.T

        bias_t = bias_ref[g].astype(f32)  # (K, R) lane-major
        # B (R, W) = bias (R, K) @ rep_col (K, W); with the transposed
        # storage this is a dim-0/dim-0 contraction — same result
        b_rep = jax.lax.dot_general(
            bias_t, rep_col, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + crossmask  # (R, W)

        for needed, rk, _rv in started:
            @pl.when(needed)
            def _wait(rk=rk):
                rk.wait()

        wcopies = []
        # clamp like dynamic-update-slice: degenerate >cap hyps carry
        # pos >= S (see decoder.step); the write lands on the last row
        pos_c = jnp.minimum(pos_ref[0], s_max - 1)
        # 8-aligned block containing `pos`: every VMEM access on the
        # (8,128)-tiled S axis happens at block granularity — a
        # single-row vector store/DMA at a dynamic S index is what Mosaic
        # rejected in the v2 kernel ("cannot statically prove index is a
        # multiple of 8"); (pos//8)*8 IS statically provable
        blk = (pos_c // 8) * 8

        def patch_row(scr, new_rows):
            """Blend this step's row into scr's 8-row block at blk.

            new_rows (U, 1, C) — explicit unit S dim from the operand
            shape (None-indexing lowers through an unsupported gather).
            """
            rows8 = scr[:, pl.ds(blk, 8), :]  # (U, 8, C)
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (u, 8, c_dim), 1
            ) == (pos_c - blk)
            scr[:, pl.ds(blk, 8), :] = jnp.where(
                sel, jnp.broadcast_to(new_rows, rows8.shape), rows8
            )

        if write_row:
            patch_row(kscr, new_ref[g][:, :, :c_dim])
            wk = pltpu.make_async_copy(
                kscr.at[:, pl.ds(blk, 8), :],
                kv_out.at[pl.ds(n0, u), pl.ds(blk, 8), pl.ds(0, c_dim)],
                wsem,
            )
            wk.start()  # source block fully patched; overlap with scores
            wcopies.append(wk)

        kv_dtype = kscr.dtype
        k_rows = kscr[...].reshape(r, c_dim)
        scores = jax.lax.dot_general(
            k_rows, q_bd.astype(kv_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b_rep

        m = scores.max(axis=0, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.maximum(p.sum(axis=0, keepdims=True), 1e-30)
        p = p / denom

        for needed, _rk, rv in started:
            @pl.when(needed)
            def _wait(rv=rv):
                rv.wait()

        if write_row:
            patch_row(vscr, new_ref[g][:, :, c_dim:])
            wv = pltpu.make_async_copy(
                vscr.at[:, pl.ds(blk, 8), :],
                kv_out.at[pl.ds(n0, u), pl.ds(blk, 8), pl.ds(c_dim, c_dim)],
                wsem,
            )
            wv.start()
            wcopies.append(wv)

        v_rows = vscr[...].reshape(r, c_dim)
        o_bd = jax.lax.dot_general(
            p.astype(kv_dtype), v_rows, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        out = jax.lax.dot_general(
            rep, o_bd * headmask, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        out_ref[g] = out.astype(out_ref.dtype)
        # write-backs must land before this buffer is refilled (issue(g+2)
        # runs right after compute(g) returns); the DMAs overlapped the
        # o_bd/out matmuls above
        for wc in wcopies:
            wc.wait()

    pending = [issue(0)]
    if ngroups > 1:
        pending.append(issue(1))
    for g in range(ngroups):
        compute(g, pending[g])
        if g + 2 < ngroups:
            # buffer g%2 is free once compute(g) returns (reads are
            # synchronous in program order): refill it with group g+2
            pending.append(issue(g + 2))


def decode_attention(
    pos: jax.Array,  # scalar int32 position (masking is carried by the bias)
    q: jax.Array,  # (N, H*Dh) queries, pre-scaled
    kv_cache: jax.Array,  # (N, S, 2*H*Dh) fused K|V
    lane_bias: jax.Array,  # (B, K, S, J): 0 on ancestor lanes with s <= pos
    lanes: int,
    heads: int,
    group: int = 2,
    chunk: int | None = None,  # unused (v1 compat)
    kv_row: jax.Array | None = None,  # (N, 2*H*Dh) this step's K|V row
    interpret: bool | None = None,
    resident: bool | None = None,  # ONE program per layer (v3); env default
):
    """Attention output (N, H*Dh). Always called inside an enclosing jit
    (the beam-search program). Rows with bias NEG_INF (s > pos,
    non-ancestor lanes, or other group members) contribute exp(-1e30-m)=0,
    so reads past the logical position are harmless. `group` utterances
    share one grid program (clamped to a divisor of the batch).

    With kv_row=None the cache is read-only and row `pos` must already be
    written (one XLA dynamic-update-slice per layer upstream). With kv_row
    given, the kernel itself stores the row (aliased in-place cache output,
    bit-identical bytes) and returns (out, updated_cache) — one fewer
    launch-bound XLA op per layer per decode step."""
    del chunk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # group-size sweep knob (r2's G=2 verdict predates prefix-bounded
    # reads + the raised scoped-VMEM limit; re-measure per generation)
    group = int(os.environ.get("AVSR_DECODE_ATTN_GROUP", group))
    n, s_max, c2 = kv_cache.shape
    c = c2 // 2
    b = n // lanes
    dh = c // heads
    group = min(group, b)
    while b % group:
        group -= 1
    write_row = kv_row is not None
    if resident is None:
        resident = os.environ.get("AVSR_DECODE_ATTN_RESIDENT", "1") == "1"
    if resident:
        return _decode_attention_resident(
            pos, q, kv_cache, lane_bias, lanes=lanes, heads=heads,
            group=group, kv_row=kv_row, interpret=interpret,
        )

    # (B, K, S, J) -> lane-major rows (B, J*S, K) -> group rows
    bias2 = jnp.transpose(lane_bias, (0, 3, 2, 1)).reshape(
        b // group, group * lanes * s_max, lanes
    )

    u = group * lanes
    pos_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row = pl.BlockSpec((1, u, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, u * s_max, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cache = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pos_spec, row, bias]
    operands = [
        jnp.asarray(pos, jnp.int32).reshape(1),
        q.reshape(b // group, u, c),
        bias2,
    ]
    if write_row:
        in_specs.append(
            pl.BlockSpec((1, u, 1, c2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(
            kv_row.astype(kv_cache.dtype).reshape(b // group, u, 1, c2)
        )
    in_specs.append(cache)
    operands.append(kv_cache)
    out_shape = [jax.ShapeDtypeStruct((b // group, u, c), q.dtype)]
    out_specs = [row]
    if write_row:
        out_shape.append(
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)
        )
        out_specs.append(cache)
    scratch = [
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if write_row:
        scratch.append(pltpu.SemaphoreType.DMA)
    res = pl.pallas_call(
        functools.partial(_kernel, group=group, lanes=lanes, heads=heads,
                          dh=dh, write_row=write_row),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # the cache input aliases the cache output: in-place row write
        input_output_aliases={4: 1} if write_row else {},
        # G=2 is the measured sweet spot: the cross-utterance score blocks
        # grow as G^2 and outpace the per-program launch savings beyond it
        # (G=8: 61 us/layer vs G=2: 39). The raised scoped-VMEM limit keeps
        # headroom for long caches.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    out = res[0].reshape(n, c)
    if write_row:
        return out, res[1]
    return out


def _decode_attention_resident(
    pos: jax.Array,
    q: jax.Array,  # (N, H*Dh) pre-scaled queries
    kv_cache: jax.Array,  # (N, S, 2*H*Dh)
    lane_bias: jax.Array,  # (B, K, S, J)
    lanes: int,
    heads: int,
    group: int,
    kv_row: jax.Array | None,
    interpret: bool | None,
):
    """v3 entry: one pallas program per layer per step (see _kernel_resident).

    Same math and bias semantics as the v2 grid path; only the launch
    structure (in-kernel group loop, double-buffered scratch) and the bias
    layout ((NG, K, R) lane-major instead of (NG, R, K), which would pad
    K=3 lanes to 128 when fully resident) differ. With kv_row given the
    kernel also stores this step's K|V row via an 8-aligned block
    write-back (requires S % 8 == 0; the serving buckets are 64-aligned).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s_max, c2 = kv_cache.shape
    c = c2 // 2
    b = n // lanes
    dh = c // heads
    write_row = kv_row is not None
    if write_row and s_max % 8 != 0:
        raise ValueError(
            f"resident write_row needs S % 8 == 0, got S={s_max}"
        )
    ngroups = b // group
    u = group * lanes

    # (B, K, S, J) -> (NG, K, R) with R rows ordered (g, j, s) to match the
    # kscr (lane-major) row order
    bias_t = (
        jnp.transpose(lane_bias, (0, 1, 3, 2))  # (B, K, J, S)
        .reshape(ngroups, group, lanes, lanes * s_max)
        .transpose(0, 2, 1, 3)  # (NG, K, G, J*S)
        .reshape(ngroups, lanes, group * lanes * s_max)
    )

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
        vmem,  # q
        vmem,  # bias_t
    ]
    operands = [
        jnp.asarray(pos, jnp.int32).reshape(1),
        q.reshape(ngroups, u, c),
        bias_t,
    ]
    if write_row:
        in_specs.append(vmem)
        operands.append(
            kv_row.astype(kv_cache.dtype).reshape(ngroups, u, 1, c2)
        )
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(kv_cache)
    out_shape = [jax.ShapeDtypeStruct((ngroups, u, c), q.dtype)]
    out_specs = [vmem]
    if write_row:
        out_shape.append(jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    scratch = [
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.VMEM((u, s_max, c), kv_cache.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if write_row:
        scratch.append(pltpu.SemaphoreType.DMA)
    res = pl.pallas_call(
        functools.partial(
            _kernel_resident, ngroups=ngroups, group=group, lanes=lanes,
            heads=heads, dh=dh, write_row=write_row,
        ),
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={4: 1} if write_row else {},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    out = res[0].reshape(n, c)
    if write_row:
        return out, res[1]
    return out
