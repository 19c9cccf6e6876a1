"""The beam-search bookkeeping step as ONE Pallas program.

Everything in beam_search_batched's loop body after CTC candidate scoring
and before the CTC state update — candidate weighting, the flat top-k over
(K, S'+1), successor gathers (token buffer + lazy-reorder ancestry), eos
retirement, running-best tracking, and end detection (e2e_asr_common.py:18)
— is ~100 scalar-shaped XLA ops per decode step. Each costs ~1-2 us of
launch overhead on TPU against nanoseconds of work (device trace: ~370 us
of a 1.12 ms step at B=16 was this tail), so the step is launch-bound, not
compute- or bandwidth-bound. All operands together are <1 MB: load them
into VMEM once and run the whole update in-register.

Exactness: every operation is the same fp32/int32 arithmetic the XLA path
performs, in the same order — max/min reductions, selects, and one-hot
sum-selects (a single nonzero term, so float sums are exact). The top-k
rounds replicate _exact_topk / topk_lastdim semantics (descending,
lower-index ties, torch.topk-compatible). Gathers over the beam axis (K~3)
are unrolled nested selects. Token-exactness vs the reference
BatchBeamSearch (/root/reference/src/nets/batch_beam_search.py) is enforced
by tests/test_beam_parity.py with the kernel both on and off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I32 = 2**31 - 1


def _kernel(
    i_ref,  # (1,) i32 SMEM: current decode step
    *refs,  # VMEM inputs then outputs, in the order built by beam_update();
            # the CTC operands exist only when use_ctc, ancestry only when lazy
    k: int,
    w_dec: float,
    w_ctc: float,
    penalty: float,
    eos: int,
    use_ctc: bool,
    lazy: bool,
    neg: float,
    d_end: float,
    m_end: int,
):
    it = iter(refs)
    xlens_ref = next(it)       # (B, 1) i32
    dec_top_ref = next(it)     # (B, K, S') f32  pre-beam decoder log-probs
    dec_eos_ref = next(it)     # (B, K) f32      decoder log-prob of eos
    if use_ctc:
        psi_cand_ref = next(it)  # (B, K, S') f32  CTC prefix scores
        psi_eos_ref = next(it)   # (B, K) f32
        ctc_s_ref = next(it)     # (B, K) f32      previous prefix score
    part_ids_ref = next(it)    # (B, K, S') i32  pre-beam token ids
    score_ref = next(it)       # (B, K) f32
    alive_ref = next(it)       # (B, K) i32
    stop_ref = next(it)        # (B, 1) i32
    yseq_ref = next(it)        # (B, K, L) i32
    if lazy:
        anc_ref = next(it)     # (S, B, K) i32
    ended_best_ref = next(it)  # (B, L) f32
    ended_cnt_ref = next(it)   # (B, L) i32
    best_score_ref = next(it)  # (B, 1) f32
    best_yseq_ref = next(it)   # (B, L) i32
    best_len_ref = next(it)    # (B, 1) i32
    # outputs
    token_o = next(it)         # (B, K) i32
    prev_o = next(it)          # (B, K) i32
    slot_o = next(it)          # (B, K) i32
    psi_sel_o = next(it)       # (B, K) f32
    score_o = next(it)         # (B, K) f32
    alive_o = next(it)         # (B, K) i32
    yseq_o = next(it)          # (B, K, L) i32
    if lazy:
        anc_o = next(it)       # (S, B, K) i32
    ended_best_o = next(it)    # (B, L) f32
    ended_cnt_o = next(it)     # (B, L) i32
    best_score_o = next(it)    # (B, 1) f32
    best_yseq_o = next(it)     # (B, L) i32
    best_len_o = next(it)      # (B, 1) i32
    stop_o = next(it)          # (B, 1) i32

    i = i_ref[0]
    b, _, sp = part_ids_ref.shape
    c = sp + 1  # candidates per lane: pre-beam tokens + explicit eos slot
    ll = yseq_ref.shape[2]

    xlens = xlens_ref[...]                      # (B, 1)
    stop_in = stop_ref[...] != 0                # (B, 1)
    alive_i = alive_ref[...]                    # (B, K) i32
    alive_in = alive_i != 0                     # (B, K)
    score_in = score_ref[...]
    part_ids = part_ids_ref[...]

    # Masks that need a trailing broadcast dim are kept int32: Mosaic only
    # supports minor-dim insertion (reshape (B,K)->(B,K,1)) for 32-bit
    # types, so expand the i32 and compare at the broadcast rank.
    lane_active = jnp.logical_and(~stop_in, i < xlens)   # (B, 1)
    lane_i = lane_active.astype(jnp.int32)               # (B, 1) i32
    forced = i >= xlens - 1                              # (B, 1)
    forced_i = forced.astype(jnp.int32)

    # --- candidate scores, replicated from the XLA path expression order ---
    cand_dec = jnp.concatenate(
        [dec_top_ref[...], dec_eos_ref[...][:, :, None]], axis=-1
    )  # (B, K, C)
    cand_tok = jnp.concatenate(
        [part_ids, jnp.full((b, k, 1), eos, jnp.int32)], axis=-1
    )
    weighted = w_dec * cand_dec
    if use_ctc:
        psi_all = jnp.concatenate(
            [psi_cand_ref[...], psi_eos_ref[...][:, :, None]], axis=-1
        )
        weighted = weighted + w_ctc * (psi_all - ctc_s_ref[...][:, :, None])
    else:
        psi_all = jnp.zeros((b, k, c), jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k, c), 2)
    # any() as an int32 max: i1 reductions are shaky in Mosaic
    eos_dup_i = jnp.max((part_ids == eos).astype(jnp.int32), axis=-1,
                        keepdims=True)  # (B, K, 1) i32
    weighted = jnp.where(
        jnp.logical_and(c_iota == c - 1, eos_dup_i > 0), neg, weighted
    )
    if penalty != 0.0:
        weighted = weighted + penalty
    weighted = weighted + score_in[:, :, None]
    weighted = jnp.where(alive_i[:, :, None] != 0, weighted, neg)

    # --- flat top-k over (K, C): k rounds of max / min-index / mask ---
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k, c), 1)
    idx3 = k_iota * c + c_iota

    # axis-at-a-time reductions: a multi-axis keepdims reduce goes through a
    # rank-1 (B,) intermediate whose reshape to (B,1,1) crashes Mosaic's
    # layout inference; per-axis keepdims stays >=2-D throughout.
    def _rmax(v):  # (B,K,C) -> (B,1,1)
        return jnp.max(jnp.max(v, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    def _rmin(v):
        return jnp.min(jnp.min(v, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    def _rsum(v):
        return jnp.sum(jnp.sum(v, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    tops, idxs, toks, psis = [], [], [], []
    x = weighted
    for _ in range(k):
        m = _rmax(x)                                                  # (B,1,1)
        hit = x == m
        sel = _rmin(jnp.where(hit, idx3, _BIG_I32))                   # (B,1,1)
        one = idx3 == sel
        tops.append(m[:, :, 0])
        idxs.append(sel[:, :, 0])
        # one-hot sum-select: exactly one term is nonzero
        toks.append(_rsum(jnp.where(one, cand_tok, 0))[:, :, 0])
        psis.append(_rsum(jnp.where(one, psi_all, 0.0))[:, :, 0])
        x = jnp.where(one, -jnp.inf, x)
    top_scores = jnp.concatenate(tops, axis=1)   # (B, K)
    top_idx = jnp.concatenate(idxs, axis=1)
    token = jnp.concatenate(toks, axis=1)
    psi_sel = jnp.concatenate(psis, axis=1)
    prev = top_idx // c
    slot = top_idx - prev * c

    token_o[...] = token
    prev_o[...] = prev
    slot_o[...] = slot
    psi_sel_o[...] = psi_sel

    # --- successor token buffers: gather rows by `prev`, then this step's
    # column writes (position i+1 = new token; i+2 = forced final eos) ---
    yseq_in = yseq_ref[...]
    # gather along the beam axis by unrolled nested selects (K is tiny).
    # Static rows via lax.slice_in_dim: int-index + newaxis goes through
    # jnp's gather path, which Mosaic only lowers in 2D.
    def _row(j):  # (B, 1, L)
        return jax.lax.slice_in_dim(yseq_in, j, j + 1, axis=1)

    y_new = jnp.broadcast_to(_row(k - 1), (b, k, ll))
    for j in range(k - 2, -1, -1):
        y_new = jnp.where(prev[:, :, None] == j, _row(j), y_new)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k, ll), 2)
    y_new = jnp.where(l_iota == i + 1, token[:, :, None], y_new)
    y_new = jnp.where(
        jnp.logical_and(l_iota == i + 2, forced_i[:, :, None] != 0), eos, y_new
    )
    yseq_o[...] = jnp.where(lane_i[:, :, None] != 0, y_new, yseq_in)

    # --- lazy-reorder ancestry: anc[s, b, k] <- anc[s, b, prev[b, k]] ---
    if lazy:
        anc_in = anc_ref[...]  # (S, B, K)

        def _lane(j):  # (S, B, 1)
            return jax.lax.slice_in_dim(anc_in, j, j + 1, axis=2)

        a_new = jnp.broadcast_to(_lane(k - 1), anc_in.shape)
        for j in range(k - 2, -1, -1):
            a_new = jnp.where(prev[None] == j, _lane(j), a_new)
        anc_o[...] = a_new

    # --- retirement + per-step ended statistics ---
    ended = jnp.logical_and(
        jnp.logical_or(token == eos, forced), lane_active
    )  # (B, K)
    hyp_len = jnp.where(forced, i + 3, i + 2)  # (B, 1)
    ended_scores = jnp.where(ended, top_scores, neg)
    step_best = jnp.max(ended_scores, axis=1, keepdims=True)  # (B, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, ll), 1)
    ended_best = jnp.maximum(
        ended_best_ref[...], jnp.where(col == i, step_best, -jnp.inf)
    )
    ended_best_o[...] = ended_best
    n_ended = jnp.sum(ended.astype(jnp.int32), axis=1, keepdims=True)
    ended_cnt = ended_cnt_ref[...] + jnp.where(col == i, n_ended, 0)
    ended_cnt_o[...] = ended_cnt

    # --- running best (argmax ties toward the lower slot, like jnp.argmax) ---
    best_slot = jnp.min(
        jnp.where(ended_scores == step_best,
                  jax.lax.broadcasted_iota(jnp.int32, (b, k), 1), _BIG_I32),
        axis=1, keepdims=True,
    )  # (B, 1)
    better = jnp.logical_and(step_best > best_score_ref[...], lane_active)
    best_score_new = jnp.where(better, step_best, best_score_ref[...])
    best_score_o[...] = best_score_new
    def _pick(j):  # (B, L)
        return jax.lax.slice_in_dim(y_new, j, j + 1, axis=1)[:, 0, :]

    picked = _pick(k - 1)
    for j in range(k - 2, -1, -1):
        picked = jnp.where(best_slot == j, _pick(j), picked)
    best_yseq_o[...] = jnp.where(better, picked, best_yseq_ref[...])
    best_len_o[...] = jnp.where(better, hyp_len, best_len_ref[...])

    # --- freeze small state on finished lanes ---
    # select on int32, not i1: Mosaic can't truncate select results to i1
    alive_new = jnp.logical_and(~ended, lane_active)
    score_new = jnp.where(alive_new, top_scores, neg)
    score_o[...] = jnp.where(lane_active, score_new, score_in)
    alive_out = jnp.where(lane_active, alive_new.astype(jnp.int32), alive_i)
    alive_o[...] = alive_out

    # --- end detection (e2e_asr_common.end_detect) ---
    count = jnp.zeros((b, 1), jnp.int32)
    for m in range(m_end):
        j = i - m - 2
        jc = jnp.maximum(j, 0)
        cnt_jc = jnp.sum(jnp.where(col == jc, ended_cnt, 0),
                         axis=1, keepdims=True)
        eb_jc = jnp.sum(jnp.where(col == jc, ended_best, 0.0),
                        axis=1, keepdims=True)
        ok = jnp.logical_and(j >= 0, cnt_jc > 0)
        worse = (eb_jc - best_score_new) < d_end
        count = count + jnp.logical_and(ok, worse).astype(jnp.int32)
    any_alive = jnp.max(alive_out, axis=1, keepdims=True) > 0
    newly = jnp.logical_or(count >= m_end, ~any_alive)
    stop_o[...] = jnp.logical_or(
        stop_in, jnp.logical_and(newly, lane_active)
    ).astype(jnp.int32)


def beam_update(
    i: jax.Array,          # scalar int32 step
    xlens: jax.Array,      # (B,) i32
    dec_top: jax.Array,    # (B, K, S') f32
    dec_eos: jax.Array,    # (B, K) f32
    psi_cand,              # (B, K, S') f32 or None
    psi_eos,               # (B, K) f32 or None
    ctc_s,                 # (B, K) f32 or None
    part_ids: jax.Array,   # (B, K, S') i32
    score: jax.Array,      # (B, K) f32
    alive: jax.Array,      # (B, K) bool
    stop: jax.Array,       # (B,) bool
    yseq: jax.Array,       # (B, K, L) i32
    anc: jax.Array,        # (S, B, K) i32 ((1,1,1) dummy when lazy=False)
    ended_best: jax.Array, # (B, L) f32
    ended_cnt: jax.Array,  # (B, L) i32
    best_score: jax.Array, # (B,) f32
    best_yseq: jax.Array,  # (B, L) i32
    best_len: jax.Array,   # (B,) i32
    *,
    w_dec: float,
    w_ctc: float,
    penalty: float,
    eos: int,
    lazy: bool,
    neg: float,
    d_end: float,
    m_end: int,
    interpret: bool | None = None,
):
    """Run one fused bookkeeping update. Returns the post-step state pieces
    (see kernel outputs); bool inputs/outputs cross the boundary as int32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k, sp = part_ids.shape
    ll = yseq.shape[2]
    use_ctc = psi_cand is not None

    ins = [xlens.reshape(b, 1).astype(jnp.int32), dec_top, dec_eos]
    if use_ctc:
        ins += [psi_cand, psi_eos, ctc_s]
    ins += [
        part_ids.astype(jnp.int32),
        score,
        alive.astype(jnp.int32),
        stop.reshape(b, 1).astype(jnp.int32),
        yseq,
    ]
    if lazy:
        ins.append(anc)
    ins += [
        ended_best, ended_cnt,
        best_score.reshape(b, 1), best_yseq,
        best_len.reshape(b, 1).astype(jnp.int32),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, k), jnp.int32),    # token
        jax.ShapeDtypeStruct((b, k), jnp.int32),    # prev
        jax.ShapeDtypeStruct((b, k), jnp.int32),    # slot
        jax.ShapeDtypeStruct((b, k), jnp.float32),  # psi_sel
        jax.ShapeDtypeStruct((b, k), jnp.float32),  # score
        jax.ShapeDtypeStruct((b, k), jnp.int32),    # alive
        jax.ShapeDtypeStruct((b, k, ll), jnp.int32),  # yseq
    ] + (
        [jax.ShapeDtypeStruct(anc.shape, jnp.int32)] if lazy else []
    ) + [
        jax.ShapeDtypeStruct((b, ll), jnp.float32),   # ended_best
        jax.ShapeDtypeStruct((b, ll), jnp.int32),     # ended_cnt
        jax.ShapeDtypeStruct((b, 1), jnp.float32),    # best_score
        jax.ShapeDtypeStruct((b, ll), jnp.int32),     # best_yseq
        jax.ShapeDtypeStruct((b, 1), jnp.int32),      # best_len
        jax.ShapeDtypeStruct((b, 1), jnp.int32),      # stop
    ]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array resident
    outs = pl.pallas_call(
        functools.partial(
            _kernel, k=k, w_dec=w_dec, w_ctc=w_ctc, penalty=penalty,
            eos=eos, use_ctc=use_ctc, lazy=lazy, neg=neg, d_end=d_end,
            m_end=m_end,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full for _ in ins],
        out_specs=[full for _ in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(i, jnp.int32).reshape(1), *ins)
    it = iter(outs)
    out = dict(
        token=next(it), prev=next(it), slot=next(it), psi_sel=next(it),
        score=next(it), alive=next(it) != 0, yseq=next(it),
    )
    out["anc"] = next(it) if lazy else anc
    out.update(
        ended_best=next(it), ended_cnt=next(it),
        best_score=next(it)[:, 0], best_yseq=next(it),
        best_len=next(it)[:, 0], stop=next(it)[:, 0] != 0,
    )
    return out
