"""CTC prefix scoring (hybrid CTC/attention) as closed-form parallel ops.

Re-design of the reference CTCPrefixScoreTH
(/root/reference/src/nets/ctc_prefix_score.py:11-187), which runs a Python
loop over T frames per decode step (:156-161). The forward recursions

    r_n[t] = logaddexp(r_n[t-1], phi[t-1]) + x[t]
    r_b[t] = logaddexp(r_n[t-1], r_b[t-1]) + b[t]

are first-order linear recurrences in the log semiring, so they have closed
forms via prefix sums:

    r_n[t] = cumX[t] + logcumsumexp_j<=t( phi[j-1] - cumX[j-1] )
    r_b[t] = cumB[t] + logcumsumexp_j<=t( r_n[j-1] - cumB[j-1] )
    psi    = logsumexp_t( phi[t-1] + x[t] )  (+ init term)

turning each decode step into O(1)-depth (T, K, S) tensor ops — ideal for
the TPU VPU — instead of a T-step sequential scan.

All shapes are static; the utterance length enters via pre-padded log-probs
(frames >= xlen carry log-prob 0 for blank, LOG_ZERO elsewhere), exactly like
the reference's padding (:47-50).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# the reference's logzero constant (ctc_prefix_score.py:33)
LOG_ZERO = -1.0e10


class CTCPrefixState(NamedTuple):
    r: jax.Array  # (K, T, 2) forward probs [n, b] for each hyp's prefix
    s: jax.Array  # (K,) absolute prefix score log(psi) of each hyp
    last: jax.Array  # (K,) last token id of each prefix
    out_len: jax.Array  # scalar int32: generated tokens so far (excl. sos)


def _tri_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive cumsum over axis 0 as one lower-triangular matmul.

    Both lax.cumsum and lax.associative_scan lower to many small sequential
    ops on TPU (reduce-window / log2(T) elementwise passes), each paying
    per-op launch overhead inside the beam while-loop. A (T, T) ones-tril
    contraction is a single MXU op; the tril constant is loop-invariant, so
    XLA hoists it out of the decode loop.
    """
    t = x.shape[0]
    tri = jnp.tril(jnp.ones((t, t), jnp.float32))
    # Precision.HIGHEST: TPU Precision.DEFAULT rounds fp32 operands to bf16
    # (8-bit mantissa), a multi-nat error over hundreds of summed log-probs
    # at T=375. These contractions are tiny; HIGHEST stays MXU-fast.
    return jax.lax.dot_general(
        tri, x.reshape(t, -1).astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(x.shape)


def _cumlogsumexp(x: jax.Array, axis: int = 0) -> jax.Array:
    """Cumulative logsumexp over axis 0 with prefix-local (running-max) shifts.

    Numerics matter here: a column-GLOBAL max + one triangular matmul (like
    _tri_cumsum) is tempting but wrong at depth — the u-sequences drift
    monotonically by ~|log p| per frame, so a global shift underflows every
    prefix sitting >87 nats below the column max; the flagship-scale T=375
    token-exactness test catches exactly this (tiny-T tests cannot, their
    total drift stays under the fp32 exp range). The Kogge-Stone recursion
    over (running max, shifted sum) pairs is exact; it runs as ONE Pallas
    program (ops/pallas/scan_logsumexp) instead of ~36 launch-overhead-bound
    XLA ops from lax.associative_scan.
    """
    assert axis == 0
    from avsr_tpu.ops.pallas.scan_logsumexp import cumlogsumexp

    return cumlogsumexp(x)


def pad_log_probs(log_probs: jax.Array, xlen: jax.Array, blank: int = 0) -> jax.Array:
    """Set frames beyond xlen to [blank: 0, others: LOG_ZERO] (reference :47-50)."""
    t = log_probs.shape[0]
    pad = jnp.arange(t)[:, None] >= xlen
    x = jnp.where(pad, LOG_ZERO, log_probs)
    blank_col = jnp.where(pad[:, 0], 0.0, log_probs[:, blank])
    return x.at[:, blank].set(blank_col)


def init_state(log_probs: jax.Array, beam: int, sos: int) -> CTCPrefixState:
    """Initial state for `beam` identical <sos> hypotheses.

    log_probs: (T, V) already padded via pad_log_probs.
    """
    t = log_probs.shape[0]
    r = jnp.full((beam, t, 2), LOG_ZERO, dtype=jnp.float32)
    r = r.at[:, :, 1].set(jnp.cumsum(log_probs[:, 0])[None, :])
    return CTCPrefixState(
        r=r,
        s=jnp.zeros((beam,), jnp.float32),
        last=jnp.full((beam,), sos, jnp.int32),
        out_len=jnp.asarray(0, jnp.int32),
    )


def score_candidates(
    log_probs: jax.Array,  # (T, V) padded
    xlen: jax.Array,  # scalar int32 true length
    state: CTCPrefixState,
    part_ids: jax.Array,  # (K, S) candidate token ids (pre-beam)
    eos: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Score the pre-beam candidate extensions of each prefix.

    Candidate-space form of the reference scorer: tokens outside part_ids
    score ~LOG_ZERO and can never win the beam, so only (K, S) candidate
    columns (+ the always-scored eos) are ever computed — no (K, V) scatter,
    no full-vocab top-k downstream.

    Returns:
      psi_cand: (K, S) absolute prefix scores at part_ids (eos/blank
                overrides applied)
      psi_eos:  (K,) absolute prefix-terminal score for eos
      r_cands:  (K, S, T, 2) forward probs of each candidate extension
    """
    t_max, v = log_probs.shape

    # candidate-column gather as a one-hot matmul: tiny MXU contraction
    # instead of a gather (TPU lowers dynamic gathers to slow loops).
    # HIGHEST precision: with DEFAULT the fp32 log-prob operand is rounded
    # to bf16 on TPU, so the "gather" would return truncated values.
    # (The beam loop instead pre-gathers xs with a DMA kernel — see
    # ops/pallas/row_gather — because this matmul re-reads the full (T, V)
    # tensor from HBM on every decode step; this path serves tests and
    # single-shot callers.)
    onehot = jax.nn.one_hot(part_ids.reshape(-1), v, dtype=log_probs.dtype)
    xs = jnp.matmul(
        log_probs, onehot.T, precision=jax.lax.Precision.HIGHEST
    ).reshape(t_max, *part_ids.shape)  # (T, K, S)
    cum_b = jnp.cumsum(log_probs[:, blank])  # (T,)
    return score_candidates_cols(xs, cum_b, xlen, state, part_ids, eos, blank)


def score_candidates_cols(
    xs: jax.Array,  # (T, K, S) log-probs at the candidate tokens
    cum_b: jax.Array,  # (T,) inclusive cumsum of blank log-probs
    xlen: jax.Array,
    state: CTCPrefixState,
    part_ids: jax.Array,  # (K, S)
    eos: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """score_candidates on pre-gathered candidate columns.

    The candidate gather and the blank cumsum are the only uses of the full
    (T, V) log-prob tensor; the beam loop hoists cum_b out of the decode loop
    entirely and gathers xs with ops/pallas/row_gather (12 row DMAs instead
    of a full-tensor read), then calls this.
    """
    t_max, k, s = xs.shape

    r_prev = jnp.transpose(state.r, (1, 2, 0))  # (T, 2, K)
    r_sum = jnp.logaddexp(r_prev[:, 0], r_prev[:, 1])  # (T, K)
    is_last = part_ids[None, :, :] == state.last[None, :, None]  # (1, K, S)
    phi = jnp.where(is_last, r_prev[:, 1, :, None], r_sum[:, :, None])  # (T, K, S)

    start = jnp.maximum(state.out_len, 1)
    tidx = jnp.arange(t_max)

    cum_x = _tri_cumsum(xs)  # (T, K, S) one MXU op (see _tri_cumsum)
    cum_x_m1 = jnp.concatenate([jnp.zeros_like(cum_x[:1]), cum_x[:-1]], axis=0)
    phi_m1 = jnp.concatenate([jnp.full_like(phi[:1], LOG_ZERO), phi[:-1]], axis=0)

    # r_n via log-semiring prefix sum. u[j] = phi[j-1] - cumX[j-1] for j>=start;
    # the init contribution (r_n[0] = x[0] when out_len==0) lands at j=start-1
    # as exactly 0 because cumX[0] == x[0].
    init_here = (tidx == start - 1) & (state.out_len == 0)
    u = jnp.where(
        (tidx >= start)[:, None, None],
        phi_m1 - cum_x_m1,
        jnp.where(init_here[:, None, None], 0.0, -jnp.inf),
    )
    # rows at padded frames (j >= xlen) never belong to a consumed prefix
    # (r_n[t >= xlen] floors to LOG_ZERO regardless), but their -cumX term
    # explodes positive (+1e10 per padded frame) and would hijack
    # _cumlogsumexp's column-global max shift — mask them out
    u = jnp.where((tidx < xlen)[:, None, None], u, -jnp.inf)
    r_n = cum_x + _cumlogsumexp(u, axis=0)  # (T, K, S)
    r_n = jnp.maximum(r_n, LOG_ZERO)

    # r_b[t] = cumB[t] + LSE_j<=t (r_n[j-1] - cumB[j-1]), j >= start
    cum_b_m1 = jnp.concatenate([jnp.zeros_like(cum_b[:1]), cum_b[:-1]])
    r_n_m1 = jnp.concatenate([jnp.full_like(r_n[:1], LOG_ZERO), r_n[:-1]], axis=0)
    vterm = jnp.where(
        ((tidx >= start) & (tidx < xlen + 1))[:, None, None],
        r_n_m1 - cum_b_m1[:, None, None],
        -jnp.inf,
    )
    r_b = cum_b[:, None, None] + _cumlogsumexp(vterm, axis=0)
    r_b = jnp.maximum(r_b, LOG_ZERO)

    # log psi = LSE(r_n[start-1], LSE_{t in [start, T)} phi[t-1] + x[t])
    phi_x = phi_m1 + xs  # (T, K, S)
    valid = (tidx >= start)[:, None, None]
    psi_terms = jnp.where(valid, phi_x, -jnp.inf)
    init_term = jnp.where(
        state.out_len == 0, xs[0], jnp.full_like(xs[0], LOG_ZERO)
    )  # (K, S): r_n[start-1]
    log_psi_c = jnp.logaddexp(
        jax.scipy.special.logsumexp(psi_terms, axis=0), init_term
    )  # (K, S)

    # eos always scores the prefix-terminal probability r_sum[xlen-1]
    psi_eos = r_sum[xlen - 1]  # (K,)
    psi_cand = jnp.where(part_ids == eos, psi_eos[:, None], log_psi_c)
    psi_cand = jnp.where(part_ids == blank, LOG_ZERO, psi_cand)

    r_cands = jnp.stack([r_n, r_b], axis=-1)  # (T, K, S, 2)
    r_cands = jnp.transpose(r_cands, (1, 2, 0, 3))  # (K, S, T, 2)
    return psi_cand, psi_eos, r_cands


def score(
    log_probs: jax.Array,
    xlen: jax.Array,
    state: CTCPrefixState,
    part_ids: jax.Array,
    eos: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full-vocab view of score_candidates (reference-shaped, for parity tests).

    Returns (delta (K, V), log_psi (K, V), r_cands (K, S, T, 2)).
    """
    k, _ = part_ids.shape
    v = log_probs.shape[1]
    psi_cand, psi_eos, r_cands = score_candidates(
        log_probs, xlen, state, part_ids, eos, blank
    )
    full = jnp.full((k, v), LOG_ZERO, jnp.float32)
    rows = jnp.arange(k)[:, None]
    full = full.at[rows, part_ids].set(psi_cand)
    full = full.at[:, eos].set(psi_eos)
    full = full.at[:, blank].set(LOG_ZERO)
    delta = full - state.s[:, None]
    return delta, full, r_cands


def select(
    state: CTCPrefixState,
    log_psi: jax.Array,  # (K, V) absolute scores from `score`
    r_cands: jax.Array,  # (K, S, T, 2)
    part_ids: jax.Array,  # (K, S)
    prev: jax.Array,  # (K',) selected source-hyp indices
    token: jax.Array,  # (K',) selected token ids
) -> CTCPrefixState:
    """Gather the new state for the selected (prev, token) pairs."""
    # position of token within part_ids[prev]; 0 if absent (only happens for
    # eos, whose state is never used again) — mirrors scoring_idmap==-1 -> 0.
    matches = part_ids[prev] == token[:, None]  # (K', S)
    pos = jnp.argmax(matches, axis=1)
    r_new = r_cands[prev, pos]  # (K', T, 2)
    s_new = log_psi[prev, token]
    return CTCPrefixState(
        r=r_new,
        s=s_new,
        last=token.astype(jnp.int32),
        out_len=state.out_len + 1,
    )


def score_candidates_cols_batched(
    xs: jax.Array,  # (T, B, K, S) candidate log-probs, T-major
    cum_b: jax.Array,  # (B, T)
    xlens: jax.Array,  # (B,)
    state: CTCPrefixState,  # leading B on every field; out_len (B,)
    part_ids: jax.Array,  # (B, K, S)
    eos: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All-utterance score_candidates_cols in T-major (T, N=B*K*S) layout.

    The vmapped per-utterance form leaves (K, S) in the two minor dims,
    which the TPU tiles to (8, 128): 12/1024 tile occupancy on every
    elementwise op, layout-conversion copies between ops that disagree, and
    a B-grid of 12-lane Kogge-Stone scans (profiled together at ~80 ms of a
    519 ms B=16 decode batch, ~213 us/step). Here every materialized tensor
    is 2D (T, N): lanes carry N (192 at B=16, 384 at B=32), sublanes carry
    T, the tril-matmul cumsum contracts over all utterances at once, and
    each scan is ONE pallas program. Math is identical to
    score_candidates_cols (equality-tested in test_ctc_prefix.py).

    Returns psi_cand (B, K, S), psi_eos (B, K), r_cands (B, K, S, T, 2).
    """
    t_max, b, k, s = xs.shape
    n = b * k * s
    nbk = b * k
    xs2 = xs.reshape(t_max, n)

    # (T, BK) forward probs of the current prefixes
    r_prev = jnp.transpose(state.r.reshape(nbk, t_max, 2), (1, 2, 0))
    r_bb = r_prev[:, 1]  # blank-terminated path
    r_sum = jnp.logaddexp(r_prev[:, 0], r_bb)  # (T, BK)

    def exp_s(x_tbk):  # (T, BK) -> (T, N): broadcast along the S slot axis
        return jnp.broadcast_to(
            x_tbk[:, :, None], (t_max, nbk, s)
        ).reshape(t_max, n)

    is_last = (part_ids == state.last[:, :, None]).reshape(1, n)
    phi = jnp.where(is_last, exp_s(r_bb), exp_s(r_sum))  # (T, N)

    start = jnp.maximum(state.out_len, 1)  # (B,)
    start_n = jnp.repeat(start, k * s)  # (N,) b-major, matches xs2 order
    out0_n = jnp.repeat(state.out_len == 0, k * s)
    xlen_n = jnp.repeat(xlens, k * s)
    tidx = jnp.arange(t_max)[:, None]  # (T, 1)

    cum_x = _tri_cumsum(xs2)  # (T, N) one MXU contraction for the batch
    cum_x_m1 = jnp.concatenate([jnp.zeros_like(cum_x[:1]), cum_x[:-1]], axis=0)
    phi_m1 = jnp.concatenate([jnp.full_like(phi[:1], LOG_ZERO), phi[:-1]], axis=0)

    ge_start = tidx >= start_n[None, :]  # (T, N)
    init_here = (tidx == start_n[None, :] - 1) & out0_n[None, :]
    u = jnp.where(
        ge_start, phi_m1 - cum_x_m1, jnp.where(init_here, 0.0, -jnp.inf)
    )
    u = jnp.where(tidx < xlen_n[None, :], u, -jnp.inf)
    r_n = cum_x + _cumlogsumexp(u, axis=0)
    r_n = jnp.maximum(r_n, LOG_ZERO)

    cum_b_n = jnp.broadcast_to(
        cum_b.T[:, :, None], (t_max, b, k * s)
    ).reshape(t_max, n)
    cum_b_m1 = jnp.concatenate(
        [jnp.zeros_like(cum_b_n[:1]), cum_b_n[:-1]], axis=0
    )
    r_n_m1 = jnp.concatenate(
        [jnp.full_like(r_n[:1], LOG_ZERO), r_n[:-1]], axis=0
    )
    vterm = jnp.where(
        ge_start & (tidx < xlen_n[None, :] + 1), r_n_m1 - cum_b_m1, -jnp.inf
    )
    r_b = cum_b_n + _cumlogsumexp(vterm, axis=0)
    r_b = jnp.maximum(r_b, LOG_ZERO)

    phi_x = phi_m1 + xs2
    psi_terms = jnp.where(ge_start, phi_x, -jnp.inf)
    init_term = jnp.where(
        out0_n, xs2[0], jnp.full_like(xs2[0], LOG_ZERO)
    )  # (N,)
    log_psi_c = jnp.logaddexp(
        jax.scipy.special.logsumexp(psi_terms, axis=0), init_term
    ).reshape(b, k, s)

    # eos scores the prefix-terminal probability r_sum[xlen-1] per (b, k):
    # one-hot select + sum instead of a per-b dynamic gather
    sel = tidx == (xlens - 1)[None, :]  # (T, B)
    sel_bk = jnp.broadcast_to(sel[:, :, None], (t_max, b, k)).reshape(t_max, nbk)
    psi_eos = jnp.sum(jnp.where(sel_bk, r_sum, 0.0), axis=0).reshape(b, k)

    psi_cand = jnp.where(part_ids == eos, psi_eos[:, :, None], log_psi_c)
    psi_cand = jnp.where(part_ids == blank, LOG_ZERO, psi_cand)

    r_cands = jnp.stack([r_n, r_b], axis=-1).reshape(t_max, b, k, s, 2)
    r_cands = jnp.transpose(r_cands, (1, 2, 3, 0, 4))  # (B, K, S, T, 2)
    return psi_cand, psi_eos, r_cands


def select_candidates(
    state: CTCPrefixState,
    psi_sel: jax.Array,  # (K',) absolute scores of the selections
    r_cands: jax.Array,  # (K, S, T, 2)
    prev: jax.Array,  # (K',) selected source-hyp indices
    slot: jax.Array,  # (K',) candidate slot (clamped to S-1 for the eos slot)
    token: jax.Array,  # (K',) selected token ids
) -> CTCPrefixState:
    """Candidate-space state selection (slot already resolved by the beam)."""
    k, s_max, t, _ = r_cands.shape
    # one-hot matmul instead of a gather (TPU lowers dynamic gathers to
    # slow per-element loops; a 0/1 dot sums exactly one element per row,
    # so it is bit-exact for fp32 payloads — but ONLY at HIGHEST precision:
    # TPU DEFAULT rounds the fp32 r-state operand itself to bf16)
    idx = prev * s_max + jnp.minimum(slot, s_max - 1)  # (K',)
    onehot = jax.nn.one_hot(idx, k * s_max, dtype=r_cands.dtype)
    r_new = jnp.matmul(
        onehot, r_cands.reshape(k * s_max, t * 2),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, t, 2)
    return CTCPrefixState(
        r=r_new,
        s=psi_sel,
        last=token.astype(jnp.int32),
        out_len=state.out_len + 1,
    )
