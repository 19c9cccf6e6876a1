"""Joint CTC/attention beam search, natively batched, as one lax.while_loop.

Re-architecture of the reference BatchBeamSearch
(/root/reference/src/nets/batch_beam_search.py:26, beam_search.py:30): the
reference keeps Python lists of Hypothesis objects and does host-side list
surgery every token (:250-285). Here the whole search lives on device:

  - the batch of utterances is a real leading axis inside the loop (NOT an
    outer vmap: a vmapped while_loop lane-masks every carry with `select`,
    which rewrites the multi-hundred-MB KV caches each step — measured 4x
    slower). Finished utterances keep computing into their caches; only the
    small recording state (best hyp, scores) is masked.
  - beam slots are fixed arrays (yseq buffer, scores, alive mask);
  - the attention decoder is scored incrementally through per-layer KV caches
    (models/decoder.py) instead of prefix recomputation;
  - CTC prefix scores use the closed-form parallel recursion
    (decode/ctc_prefix.py), vmapped over the batch;
  - eos'd hypotheses are retired by masking, with the running best and the
    per-step ended statistics needed for the reference's end_detect
    (e2e_asr_common.py:18) tracked in fixed arrays;
  - the final forced-eos step (beam_search.py:436-441) is folded in.

Scoring weights replicate get_beam_search_decoder
(avhubert_avsr_model.py:12-36): decoder (1-ctc_weight), CTC ctc_weight,
pre-beam on decoder scores with ratio 1.5, length bonus 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.decode import ctc_prefix
from avsr_tpu.ops.pallas.beam_update import beam_update
from avsr_tpu.ops.pallas.row_gather import row_gather
from avsr_tpu.ops.pallas.topk import topk_lastdim

NEG = -1.0e30
D_END = -10.0  # log(1 * exp(-10)), e2e_asr_common.py:18
M_END = 3


class BeamState(NamedTuple):
    i: jax.Array  # scalar step
    yseq: jax.Array  # (B, K, L) token buffer, sos at [..., 0]
    score: jax.Array  # (B, K)
    alive: jax.Array  # (B, K) bool
    dec_cache: object  # DecoderCache pytree over B*K rows
    ctc: ctc_prefix.CTCPrefixState  # leaves with leading (B,)
    ended_best: jax.Array  # (B, L) best ended score per step
    ended_cnt: jax.Array  # (B, L) ended count per step
    best_score: jax.Array  # (B,)
    best_yseq: jax.Array  # (B, L)
    best_len: jax.Array  # (B,)
    stop: jax.Array  # (B,) bool
    # lazy-reorder ancestry (kv_len, B, K): anc[s, b, k] = stored lane whose
    # cache row at position s belongs to hypothesis (b, k)'s prefix.
    # (1, 1, 1) dummy when cfg.lazy_reorder is off.
    anc: jax.Array


@dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 3
    ctc_weight: float = 0.1
    pre_beam_ratio: float = 1.5
    sos: int = 5048
    eos: int = 5048
    blank: int = 0
    vocab: int = 5049
    # length bonus per emitted token (reference scorers/length_bonus.py:35
    # weighted by `penalty` in get_beam_search_decoder; 0 in all shipped configs)
    penalty: float = 0.0
    # share cross-attention K/V across beam lanes: the source K/V depend only
    # on the encoder memory, identical for the K lanes of one utterance, so
    # storing them un-repeated at (B, S, H, Dh) cuts their per-step reads by
    # the beam width. Requires decoder_init(memory, maxlen, beam) and a
    # decoder whose cross-attention folds the beam dim into the query's
    # (mathematically identity: cross-attn has no structure over queries).
    shared_src_kv: bool = False
    # lazy beam reorder: never physically reshuffle the self-KV caches after
    # top-k. Instead keep per-position ancestry indices and resolve them at
    # attention time (models/decoder.py attend_kv_lazy). Removes the
    # per-layer full-cache gather per step and lets XLA update the KV row
    # in place. Requires a decoder_step accepting a lane_bias argument.
    lazy_reorder: bool = False
    # cap on the self-attention KV buffer (tokens). The decode loop's cost is
    # dominated by moving the (L, B*K, maxlen, 2, H, Dh) cache (per-layer
    # unstack/restack + beam-reorder gather), all linear in maxlen. Real
    # hypotheses stay far below the frame count (~2-4 tokens/sec of speech vs
    # 25 frames/sec), so capping the buffer cuts that traffic without changing
    # any reachable output. None = frame-count-sized buffer, byte-for-byte the
    # reference semantics (batch_beam_search.py runs at most xlen steps).
    max_decode_tokens: Optional[int] = None
    # run the whole post-scoring bookkeeping step (flat top-k, successor
    # gathers, retirement, best tracking, end detection) as ONE Pallas
    # program (ops/pallas/beam_update.py) instead of ~100 launch-bound XLA
    # ops. Bit-identical selection semantics. Default OFF: measured on v5e
    # at B=32 the kernel itself runs ~77 us/step but forces ~40 us/step
    # relayout copies on each side of the pallas_call boundary and breaks
    # XLA fusions around it — device beam loop 839 ms vs 692 ms per
    # 375-step batch WITH vs WITHOUT (533 vs 458 audio-s/s device-side).
    fused_bookkeeping: bool = False

    @property
    def pre_beam_size(self) -> int:
        return int(self.pre_beam_ratio * self.beam_size)


# exact top-k by k rounds of (max, argmax, mask) — the all-XLA reference
# semantics that topk_lastdim's kernel replicates (ties toward the lower
# index, matching lax.top_k / torch.topk); kept importable for parity tests
from avsr_tpu.ops.pallas.topk import _xla_topk as _exact_topk  # noqa: E402


def beam_search_batched(
    cfg: BeamSearchConfig,
    decoder_step: Callable,  # (y (N,), pos, cache, mem_mask) -> (logp (N,V), cache)
    decoder_init: Callable,  # (memory (N,S,D), maxlen) -> cache
    feats: jax.Array,  # (B, S, D) encoder outputs (padded)
    ctc_log_probs: jax.Array,  # (B, S, V) CTC log-softmax (padded)
    xlens: jax.Array,  # (B,) true frame counts
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode a batch. Returns (yseqs (B, L), lengths (B,), scores (B,)).

    yseq[:, 0] == sos; yseq[b, 1:length[b]] are tokens incl. the final eos.
    """
    b, s_max, v = ctc_log_probs.shape
    k = cfg.beam_size
    n = b * k
    buf_len = s_max + 2
    w_ctc = cfg.ctc_weight
    w_dec = 1.0 - w_ctc
    use_ctc = w_ctc > 0

    kv_len = min(buf_len, cfg.max_decode_tokens) if cfg.max_decode_tokens else buf_len
    # round the KV buffer up to a multiple of 64: the fused decode-attention
    # kernel streams the cache in large aligned chunks (>=2 chunks of >=96
    # rows measured fastest; 3+ small chunks are pathological through
    # Mosaic's dynamic chunk loop), and rows past the logical length are
    # masked by the ancestry bias / never validated, so oversizing is free
    kv_len = -(-kv_len // 64) * 64
    if cfg.shared_src_kv:
        # per-utterance memory; the decoder folds beam lanes into the
        # cross-attention query axis
        mem_mask = (jnp.arange(s_max)[None, :] < xlens[:, None])[:, None, :]
        dec_cache = decoder_init(feats, kv_len, k)
    else:
        memory = jnp.repeat(feats, k, axis=0)  # (B*K, S, D)
        mem_mask = jnp.arange(s_max)[None, :] < jnp.repeat(xlens, k)[:, None]
        mem_mask = mem_mask[:, None, :]  # (B*K, 1, S)
        dec_cache = decoder_init(memory, kv_len)

    # pad the CTC time axis to a lane multiple, THEN apply reference padding:
    # the extra frames become ordinary padded frames (blank 0 / LOG_ZERO),
    # which every downstream mask already treats as beyond-xlen. The rounded
    # length keeps the transposed row-gather table's rows lane-aligned.
    t_pad = -(-s_max // 128) * 128
    if t_pad != s_max:
        ctc_log_probs = jnp.pad(ctc_log_probs, ((0, 0), (0, t_pad - s_max), (0, 0)))
    log_probs = jax.vmap(ctc_prefix.pad_log_probs, in_axes=(0, 0, None))(
        ctc_log_probs, xlens, cfg.blank
    )
    # loop-invariant CTC scoring inputs, hoisted out of the decode loop:
    # the transposed table feeds the per-step candidate row-gather (12 row
    # DMAs/utterance instead of re-reading the full (T, V) tensor), and the
    # blank cumsum never changes across steps.
    logp_rows = jnp.swapaxes(log_probs, 1, 2).reshape(b * v, t_pad)  # (B*V, Tp)
    cum_b_all = jnp.cumsum(log_probs[:, :, cfg.blank], axis=1)  # (B, Tp)

    init = BeamState(
        i=jnp.asarray(0, jnp.int32),
        yseq=jnp.full((b, k, buf_len), cfg.eos, jnp.int32).at[..., 0].set(cfg.sos),
        score=jnp.full((b, k), NEG, jnp.float32).at[:, 0].set(0.0),
        alive=jnp.zeros((b, k), bool).at[:, 0].set(True),
        dec_cache=dec_cache,
        ctc=jax.vmap(ctc_prefix.init_state, in_axes=(0, None, None))(
            log_probs, k, cfg.sos
        ),
        ended_best=jnp.full((b, buf_len), NEG, jnp.float32),
        ended_cnt=jnp.zeros((b, buf_len), jnp.int32),
        best_score=jnp.full((b,), NEG, jnp.float32),
        best_yseq=jnp.full((b, buf_len), cfg.eos, jnp.int32),
        best_len=jnp.zeros((b,), jnp.int32),
        stop=jnp.zeros((b,), bool),
        anc=(
            jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (kv_len, b, k))
            if cfg.lazy_reorder
            else jnp.zeros((1, 1, 1), jnp.int32)
        ),
    )

    def cond(st: BeamState):
        lane_done = jnp.logical_or(st.stop, st.i >= xlens)
        return jnp.logical_not(lane_done.all())

    def body(st: BeamState) -> BeamState:
        i = st.i
        # lanes still decoding this step (reference loop bound: i < xlen)
        lane_active = jnp.logical_and(~st.stop, i < xlens)  # (B,)

        # 1. attention-decoder scores for all B*K slots
        if cfg.lazy_reorder:
            # this step's row (position i) is written by each lane itself
            ident = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32), (1, b, k)
            )
            anc = jax.lax.dynamic_update_slice_in_dim(st.anc, ident, i, axis=0)
            # 0 on (s <= i) & (stored lane == ancestor lane), NEG elsewhere;
            # shared by all decoder layers this step
            s_valid = jnp.arange(anc.shape[0]) <= i
            onehot = anc[..., None] == jnp.arange(k)  # (S, B, K, J)
            lane_bias = jnp.where(
                s_valid[:, None, None, None] & onehot, 0.0, NEG
            )
            lane_bias = jnp.transpose(lane_bias, (1, 2, 3, 0))  # (B, K, J, S)
            dec_logp, cache = decoder_step(
                st.yseq[..., i].reshape(n), i, st.dec_cache, mem_mask, lane_bias
            )
        else:
            anc = st.anc
            dec_logp, cache = decoder_step(
                st.yseq[..., i].reshape(n), i, st.dec_cache, mem_mask
            )
        dec_logp = dec_logp.reshape(b, k, v)

        # 2. pre-beam pruning on decoder scores, then CTC prefix scoring.
        # Selection happens entirely in candidate space: only pre-beam tokens
        # (+ eos, which CTC always scores) can win — everything else carries a
        # w_ctc * LOG_ZERO penalty in the reference (batch_beam_search.py:236).
        n_cand = cfg.pre_beam_size + 1  # + explicit eos slot
        # exact top-S' by iterated argmax: S' passes of (max, mask) over the
        # vocab. Both lax.top_k and approx_max_k(recall_target=1.0) lower to
        # a full (B,K,V) sort on TPU (~10x the cost for S' ~ 4); like sort,
        # argmax breaks ties toward the lower index, so selection matches the
        # reference torch.topk ordering.
        # one Pallas program for all S' rounds: the XLA iterated-argmax costs
        # ~10 ops/step, each a full HBM round-trip of the ~1 MB logits buffer
        dec_top, part_ids = topk_lastdim(dec_logp, cfg.pre_beam_size)  # (B,K,S')
        if use_ctc:
            # candidate columns via DMA row-gather from the hoisted
            # transposed table (see ops/pallas/row_gather)
            flat_rows = (
                part_ids + jnp.arange(b, dtype=jnp.int32)[:, None, None] * v
            ).reshape(-1)
            xs_rows = row_gather(logp_rows, flat_rows)  # (B*K*S', Tp)
            n_pre = cfg.pre_beam_size
            # T-major (Tp, B, K, S'): every downstream tensor in the batched
            # scorer is then 2D (Tp, B*K*S') — full-lane tiles instead of
            # the vmapped form's (K, S') minor dims (12/1024 occupancy)
            xs = jnp.transpose(
                xs_rows.reshape(b, k, n_pre, t_pad), (3, 0, 1, 2)
            )
            psi_cand, psi_eos, r_cands = ctc_prefix.score_candidates_cols_batched(
                xs, cum_b_all, xlens, st.ctc, part_ids, cfg.eos, cfg.blank
            )
            # blank is never selectable (psi LOG_ZERO already enforces this)

        def reorder_cache(cache, prev):
            # physical KV-cache reshuffle for the non-lazy path; finished
            # lanes overwrite garbage that is never read again
            flat_prev = (jnp.arange(b)[:, None] * k + prev).reshape(-1)
            if hasattr(cache, "self_kv"):
                # per-layer tuple of seq-major (maxlen, B*K, 2, H, Dh) buffers
                return cache._replace(
                    self_kv=tuple(a[:, flat_prev] for a in cache.self_kv)
                )
            # S2TDecoderCache keeps separate K/V
            return cache._replace(
                self_k=cache.self_k[:, flat_prev],
                self_v=cache.self_v[:, flat_prev],
            )

        if cfg.fused_bookkeeping:
            # 3-6 fused: ONE Pallas program for candidate weighting, the flat
            # top-k, successor gathers, retirement, best tracking and end
            # detection (ops/pallas/beam_update.py) — the XLA path below is
            # ~100 launch-bound scalar-shaped ops per step
            upd = beam_update(
                i, xlens, dec_top, dec_logp[..., cfg.eos],
                psi_cand if use_ctc else None,
                psi_eos if use_ctc else None,
                st.ctc.s if use_ctc else None,
                part_ids, st.score, st.alive, st.stop, st.yseq, anc,
                st.ended_best, st.ended_cnt, st.best_score, st.best_yseq,
                st.best_len,
                w_dec=w_dec, w_ctc=w_ctc, penalty=cfg.penalty, eos=cfg.eos,
                lazy=cfg.lazy_reorder, neg=NEG, d_end=D_END, m_end=M_END,
            )
            prev, slot, token = upd["prev"], upd["slot"], upd["token"]
            if not cfg.lazy_reorder:
                cache = reorder_cache(cache, prev)
            if use_ctc:
                ctc_state = jax.vmap(ctc_prefix.select_candidates)(
                    st.ctc, upd["psi_sel"], r_cands, prev, slot, token
                )
            else:
                ctc_state = st.ctc._replace(out_len=st.ctc.out_len + 1)
            return BeamState(
                i=i + 1,
                yseq=upd["yseq"],
                score=upd["score"],
                alive=upd["alive"],
                dec_cache=cache,
                ctc=ctc_state,
                ended_best=upd["ended_best"],
                ended_cnt=upd["ended_cnt"],
                best_score=upd["best_score"],
                best_yseq=upd["best_yseq"],
                best_len=upd["best_len"],
                stop=upd["stop"],
                anc=upd["anc"] if cfg.lazy_reorder else anc,
            )

        cand_tokens = jnp.concatenate(
            [part_ids, jnp.full((b, k, 1), cfg.eos, part_ids.dtype)], axis=-1
        )
        cand_dec = jnp.concatenate(
            [dec_top, dec_logp[..., cfg.eos][..., None]], axis=-1
        )
        weighted = w_dec * cand_dec  # (B, K, S'+1)
        if use_ctc:
            psi_all = jnp.concatenate([psi_cand, psi_eos[..., None]], axis=-1)
            weighted = weighted + w_ctc * (psi_all - st.ctc.s[..., None])
        # dedup: if eos appeared in part_ids, mask the explicit eos slot
        eos_dup = (part_ids == cfg.eos).any(axis=-1)  # (B, K)
        weighted = weighted.at[..., -1].set(
            jnp.where(eos_dup, NEG, weighted[..., -1])
        )
        if cfg.penalty != 0.0:
            weighted = weighted + cfg.penalty  # +1 token per extension
        weighted = weighted + st.score[..., None]
        weighted = jnp.where(st.alive[..., None], weighted, NEG)

        # 3. per-utterance flat top-k over (K, S'+1) candidates
        top_scores, top_idx = topk_lastdim(weighted.reshape(b, k * n_cand), k)
        prev = top_idx // n_cand  # (B, K)
        slot = top_idx % n_cand
        token = jnp.take_along_axis(
            cand_tokens.reshape(b, k * n_cand), top_idx, axis=1
        ).astype(jnp.int32)

        # 4. gather successor states. Caches are updated unconditionally —
        # finished lanes overwrite garbage that is never read again; only the
        # small recording state below is masked by lane_active.
        yseq = jnp.take_along_axis(st.yseq, prev[..., None], axis=1)
        yseq = yseq.at[..., i + 1].set(token)
        if cfg.lazy_reorder:
            # reorder only the tiny ancestry matrix; the KV caches stay put.
            # As a (K_new, K_old) one-hot batched matmul, NOT take_along_axis:
            # XLA lowers that gather to a ~10 ns/element scalar loop on TPU
            # (~97 us/step for this s32[S*B*K] op at B=16); the matmul picks
            # the same small-int values exactly and runs in ~2 us.
            oh_prev = (prev[:, :, None] == jnp.arange(k)).astype(jnp.float32)
            anc = (
                jnp.einsum("sbj,bkj->sbk", anc.astype(jnp.float32), oh_prev)
                .astype(jnp.int32)
            )
        else:
            cache = reorder_cache(cache, prev)
        if use_ctc:
            psi_sel = jnp.take_along_axis(
                psi_all.reshape(b, k * n_cand), top_idx, axis=1
            )
            ctc_state = jax.vmap(ctc_prefix.select_candidates)(
                st.ctc, psi_sel, r_cands, prev, slot, token
            )
        else:
            ctc_state = st.ctc._replace(out_len=st.ctc.out_len + 1)

        # 5. retire ended hypotheses (natural eos, or forced at the last step)
        forced = i >= xlens - 1  # (B,)
        is_eos = token == cfg.eos  # (B, K)
        ended = jnp.logical_and(
            jnp.logical_or(is_eos, forced[:, None]), lane_active[:, None]
        )
        # the final step appends eos to every hyp, even after a natural eos
        # (beam_search.py:436-441 / batch_beam_search.py:321-337)
        yseq = yseq.at[..., i + 2].set(
            jnp.where(forced[:, None], cfg.eos, yseq[..., i + 2])
        )
        hyp_len = jnp.where(forced, i + 3, i + 2)  # (B,) incl. sos and eos

        ended_scores = jnp.where(ended, top_scores, NEG)  # (B, K)
        step_best = ended_scores.max(axis=1)  # (B,)
        ended_best = st.ended_best.at[:, i].max(step_best)
        ended_cnt = st.ended_cnt.at[:, i].add(ended.sum(axis=1))

        best_slot = jnp.argmax(ended_scores, axis=1)  # (B,)
        better = jnp.logical_and(step_best > st.best_score, lane_active)
        best_score = jnp.where(better, step_best, st.best_score)
        picked = jnp.take_along_axis(yseq, best_slot[:, None, None], axis=1)[:, 0]
        best_yseq = jnp.where(better[:, None], picked, st.best_yseq)
        best_len = jnp.where(better, hyp_len, st.best_len)

        alive = jnp.logical_and(jnp.logical_not(ended), lane_active[:, None])
        score = jnp.where(alive, top_scores, NEG)
        # freeze small state on finished lanes
        yseq = jnp.where(lane_active[:, None, None], yseq, st.yseq)
        score = jnp.where(lane_active[:, None], score, st.score)
        alive = jnp.where(lane_active[:, None], alive, st.alive)

        # 6. end detection (e2e_asr_common.py:18): M consecutive recent
        # lengths whose best ended score trails the global best by > 10.
        def m_term(m):
            j = i - m - 2
            jc = jnp.maximum(j, 0)
            ok = jnp.logical_and(j >= 0, st.ended_cnt[:, jc] > 0)
            worse = st.ended_best[:, jc] - best_score < D_END
            return jnp.logical_and(ok, worse).astype(jnp.int32)

        count = m_term(0) + m_term(1) + m_term(2)
        newly_stopped = jnp.logical_or(count >= M_END, ~alive.any(axis=1))
        stop = jnp.logical_or(st.stop, jnp.logical_and(newly_stopped, lane_active))

        return BeamState(
            i=i + 1,
            yseq=yseq,
            score=score,
            alive=alive,
            dec_cache=cache,
            ctc=ctc_state,
            ended_best=ended_best,
            ended_cnt=ended_cnt,
            best_score=best_score,
            best_yseq=best_yseq,
            best_len=best_len,
            stop=stop,
            anc=anc,
        )

    final = jax.lax.while_loop(cond, body, init)
    return final.best_yseq, final.best_len, final.best_score


def beam_search(
    cfg: BeamSearchConfig,
    decoder_step: Callable,
    decoder_init: Callable,
    feats: jax.Array,  # (S, D)
    ctc_log_probs: jax.Array,  # (S, V)
    xlen: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-utterance wrapper over the batched search."""
    yseqs, lens, scores = beam_search_batched(
        cfg, decoder_step, decoder_init,
        feats[None], ctc_log_probs[None], jnp.asarray(xlen)[None],
    )
    return yseqs[0], lens[0], scores[0]


def greedy_ctc(log_probs: jax.Array, xlen: jax.Array, blank: int = 0):
    """Greedy CTC path: argmax, collapse repeats, drop blanks.

    Returns (tokens (T,), length) with tokens right-padded by `blank`.
    """
    t, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    valid = jnp.arange(t) < xlen
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ids[:-1]])
    keep = (ids != blank) & (ids != prev) & valid
    # stable compaction: scatter kept tokens to the front
    pos = jnp.cumsum(keep) - 1
    out = jnp.full((t,), blank, jnp.int32)
    out = out.at[jnp.where(keep, pos, t)].set(ids, mode="drop")
    return out, keep.sum()
