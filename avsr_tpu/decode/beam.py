"""Joint CTC/attention beam search as one fixed-shape lax.while_loop.

Re-architecture of the reference BatchBeamSearch
(/root/reference/src/nets/batch_beam_search.py:26, beam_search.py:30): the
reference keeps Python lists of Hypothesis objects and does host-side list
surgery every token (:250-285). Here the whole search lives on device:

  - beam slots are fixed arrays (yseq buffer, scores, alive mask);
  - the attention decoder is scored incrementally through per-layer KV caches
    (models/decoder.py) instead of prefix recomputation;
  - CTC prefix scores use the closed-form parallel recursion
    (decode/ctc_prefix.py);
  - eos'd hypotheses are retired by masking, with the running best and the
    per-step ended statistics needed for the reference's end_detect
    (e2e_asr_common.py:18) tracked in fixed arrays;
  - the final forced-eos step (beam_search.py:436-441) is folded into the
    loop.

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

NEG = -1.0e30
D_END = -10.0  # log(1 * exp(-10)), e2e_asr_common.py:18
M_END = 3


class BeamState(NamedTuple):
    i: jax.Array  # scalar step
    yseq: jax.Array  # (K, L) token buffer, sos at [.,0]
    score: jax.Array  # (K,)
    alive: jax.Array  # (K,) bool
    dec_cache: object  # DecoderCache pytree
    ctc: ctc_prefix.CTCPrefixState
    ended_best: jax.Array  # (L,) best ended score per step
    ended_cnt: jax.Array  # (L,) ended count per step
    best_score: jax.Array  # scalar: best ended score
    best_yseq: jax.Array  # (L,)
    best_len: jax.Array  # scalar
    stop: jax.Array  # scalar bool


@dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 3
    ctc_weight: float = 0.1
    pre_beam_ratio: float = 1.5
    sos: int = 5048
    eos: int = 5048
    blank: int = 0
    vocab: int = 5049

    @property
    def pre_beam_size(self) -> int:
        return int(self.pre_beam_ratio * self.beam_size)


def beam_search(
    cfg: BeamSearchConfig,
    decoder_step: Callable,  # (y (K,), pos, cache, mem_mask) -> (logp (K,V), cache)
    decoder_init: Callable,  # (memory (K,S,D), maxlen) -> cache
    feats: jax.Array,  # (S, D) encoder output (padded)
    ctc_log_probs: jax.Array,  # (S, V) CTC log-softmax (padded)
    xlen: jax.Array,  # scalar true frame count
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode one utterance. Returns (yseq (L,), length, score).

    yseq[0] == sos; yseq[1:length] are tokens including the final eos.
    """
    k = cfg.beam_size
    s_max, v = ctc_log_probs.shape
    buf_len = s_max + 2
    w_ctc = cfg.ctc_weight
    w_dec = 1.0 - w_ctc

    use_ctc = cfg.ctc_weight > 0
    memory = jnp.broadcast_to(feats[None], (k,) + feats.shape)
    mem_mask = (jnp.arange(s_max)[None, None, :] < xlen)  # (1,1,S)
    mem_mask = jnp.broadcast_to(mem_mask, (k, 1, s_max))

    log_probs = ctc_prefix.pad_log_probs(ctc_log_probs, xlen, cfg.blank)

    init = BeamState(
        i=jnp.asarray(0, jnp.int32),
        yseq=jnp.full((k, buf_len), cfg.eos, jnp.int32).at[:, 0].set(cfg.sos),
        score=jnp.full((k,), NEG, jnp.float32).at[0].set(0.0),
        alive=jnp.zeros((k,), bool).at[0].set(True),
        dec_cache=decoder_init(memory, buf_len),
        ctc=ctc_prefix.init_state(log_probs, k, cfg.sos),
        ended_best=jnp.full((buf_len,), NEG, jnp.float32),
        ended_cnt=jnp.zeros((buf_len,), jnp.int32),
        best_score=jnp.asarray(NEG, jnp.float32),
        best_yseq=jnp.full((buf_len,), cfg.eos, jnp.int32),
        best_len=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(False),
    )

    def cond(st: BeamState):
        return jnp.logical_and(st.i < xlen, jnp.logical_not(st.stop))

    def body(st: BeamState) -> BeamState:
        i = st.i
        # 1. attention-decoder scores for all beam slots
        dec_logp, cache = decoder_step(st.yseq[:, i], i, st.dec_cache, mem_mask)
        weighted = w_dec * dec_logp

        # 2. pre-beam pruning on decoder scores, then CTC prefix scoring
        # (skipped entirely when ctc_weight == 0, e.g. attention-only S2S)
        if use_ctc:
            _, part_ids = jax.lax.top_k(dec_logp, cfg.pre_beam_size)
            delta, log_psi, r_cands = ctc_prefix.score(
                log_probs, xlen, st.ctc, part_ids, cfg.eos, cfg.blank
            )
            weighted = weighted + w_ctc * delta
        weighted = weighted + st.score[:, None]
        weighted = jnp.where(st.alive[:, None], weighted, NEG)

        # 3. flat top-k over (K, V)
        top_scores, top_idx = jax.lax.top_k(weighted.reshape(-1), k)
        prev = top_idx // v
        token = (top_idx % v).astype(jnp.int32)

        # 4. gather successor states. Only the self-attention caches are
        # beam-dependent; src K/V are identical across slots (skipping their
        # gather halves the per-step HBM traffic).
        yseq = st.yseq[prev].at[:, i + 1].set(token)
        cache = cache._replace(
            self_k=cache.self_k[:, prev], self_v=cache.self_v[:, prev]
        )
        if use_ctc:
            ctc_state = ctc_prefix.select(
                st.ctc, log_psi, r_cands, part_ids, prev, token
            )
        else:
            ctc_state = st.ctc

        # 5. retire ended hypotheses (natural eos, or forced at the last step)
        forced = i >= xlen - 1
        is_eos = token == cfg.eos
        ended = jnp.logical_or(is_eos, forced)
        # the final step appends eos to every hyp, even after a natural eos
        # (beam_search.py:436-441 / batch_beam_search.py:321-337)
        yseq = yseq.at[:, i + 2].set(
            jnp.where(forced, cfg.eos, yseq[:, i + 2])
        )
        hyp_len = jnp.where(forced, i + 3, i + 2)  # scalar; incl. sos and eos

        ended_scores = jnp.where(ended, top_scores, NEG)
        step_best = jnp.max(ended_scores)
        n_ended = ended.sum()
        ended_best = st.ended_best.at[i].set(
            jnp.maximum(st.ended_best[i], step_best)
        )
        ended_cnt = st.ended_cnt.at[i].add(n_ended)

        best_slot = jnp.argmax(ended_scores)
        better = step_best > st.best_score
        best_score = jnp.where(better, step_best, st.best_score)
        best_yseq = jnp.where(better, yseq[best_slot], st.best_yseq)
        best_len = jnp.where(better, hyp_len, st.best_len)

        alive = jnp.logical_not(ended)
        score = jnp.where(alive, top_scores, NEG)

        # 6. end detection (e2e_asr_common.py:18): M consecutive recent
        # lengths whose best ended score trails the global best by > 10.
        def m_term(m):
            j = i - m - 2
            ok = jnp.logical_and(j >= 0, st.ended_cnt[jnp.maximum(j, 0)] > 0)
            worse = st.ended_best[jnp.maximum(j, 0)] - best_score < D_END
            return jnp.logical_and(ok, worse).astype(jnp.int32)

        count = m_term(0) + m_term(1) + m_term(2)
        stop = jnp.logical_or(count >= M_END, jnp.logical_not(alive.any()))

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
        )

    final = jax.lax.while_loop(cond, body, init)
    return final.best_yseq, final.best_len, final.best_score


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
