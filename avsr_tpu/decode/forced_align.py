"""CTC Viterbi forced alignment, batched as jittable lax.scan.

Re-design of the reference CTC.forced_align / forced_align_batch
(/root/reference/src/nets/backend/ctc.py:181-310): the reference runs a
Python double loop over (T, 2L+1); here the Viterbi forward is one lax.scan
over frames with vectorized state transitions, batched over utterances.
Returns the per-frame label sequence (blank-interleaved state ids mapped
back to labels).

Note: the reference DP indexes ``logdelta[t-1, s-1]`` for s=0, which numpy
wraps to the LAST state, occasionally producing non-monotonic (invalid)
alignments. This implementation masks those transitions instead; it is
verified against an exact brute-force Viterbi in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

LOG_ZERO = -1.0e11


def interpolate_blank(labels: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) blank-interleaved state labels."""
    b, l = labels.shape
    out = jnp.full((b, 2 * l + 1), blank_id, labels.dtype)
    return out.at[:, 1::2].set(labels)


def forced_align(
    log_probs: jnp.ndarray,  # (B, T, V) CTC log-softmax
    in_lens: jnp.ndarray,  # (B,) frame counts
    labels: jnp.ndarray,  # (B, L) padded with any id beyond label_lens
    label_lens: jnp.ndarray,  # (B,)
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi alignment. Returns (alignments (B, T) label ids, scores (B,)).

    Frames beyond in_lens carry blanks; states beyond 2*label_lens+1 are
    masked out of the recursion.
    """
    b, t_max, v = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    y_int = interpolate_blank(labels, blank_id)  # (B, S)
    n_states = 2 * label_lens + 1  # (B,)
    state_valid = jnp.arange(s)[None, :] < n_states[:, None]

    # emission log-probs per state per frame: (B, T, S)
    emit = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(y_int[:, None, :], (b, t_max, s)), axis=2
    )

    # allowed skip (s-2) transition: current is a label differing from the
    # label two states back
    prev2 = jnp.concatenate([jnp.full((b, 2), blank_id, y_int.dtype), y_int[:, :-2]], 1)
    can_skip = (y_int != blank_id) & (jnp.arange(s)[None, :] >= 2) & (y_int != prev2)

    init = jnp.full((b, s), LOG_ZERO)
    init = init.at[:, 0].set(emit[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(label_lens > 0, emit[:, 0, 1], LOG_ZERO))
    init = jnp.where(state_valid, init, LOG_ZERO)

    def shift1(x):
        return jnp.concatenate([jnp.full((b, 1), LOG_ZERO), x[:, :-1]], axis=1)

    def shift2(x):
        return jnp.concatenate([jnp.full((b, 2), LOG_ZERO), x[:, :-2]], axis=1)

    def step(delta, frame):
        emit_t, t = frame
        stay = delta
        diag = shift1(delta)
        skip = jnp.where(can_skip, shift2(delta), LOG_ZERO)
        cands = jnp.stack([stay, diag, skip])  # (3, B, S)
        best = jnp.max(cands, axis=0)
        choice = jnp.argmax(cands, axis=0)  # 0 stay, 1 diag, 2 skip
        new_delta = jnp.where(state_valid, best + emit_t, LOG_ZERO)
        # frames beyond the utterance keep the state (no transition)
        active = (t < in_lens)[:, None]
        new_delta = jnp.where(active, new_delta, delta)
        choice = jnp.where(active, choice, 0)
        return new_delta, choice

    frames = (jnp.moveaxis(emit, 1, 0)[1:], jnp.arange(1, t_max))
    delta, choices = jax.lax.scan(step, init, frames)  # choices: (T-1, B, S)

    # final state: argmax of last two valid states
    last = n_states - 1
    final_a = jnp.take_along_axis(delta, last[:, None], axis=1)[:, 0]
    final_b = jnp.take_along_axis(
        delta, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    score = jnp.maximum(final_a, final_b)
    end_state = jnp.where(final_a >= final_b, last, jnp.maximum(last - 1, 0))

    # backtrack (reverse scan over the choice tensor)
    def back(state, frame):
        choice_t, t = frame
        ch = jnp.take_along_axis(choice_t, state[:, None], axis=1)[:, 0]
        prev_state = state - ch
        active = (t < in_lens)
        prev_state = jnp.where(active, prev_state, state)
        return prev_state, state

    state0, states_rev = jax.lax.scan(
        back, end_state, (choices[::-1], jnp.arange(t_max - 1, 0, -1))
    )
    # reverse-scan outputs are the states at t = T-1 .. 1; the final carry is
    # the state at t = 0
    states = jnp.concatenate([state0[:, None], states_rev[::-1].T], axis=1)
    align = jnp.take_along_axis(y_int, states, axis=1)
    # pad frames beyond in_lens with blank
    frame_valid = jnp.arange(t_max)[None, :] < in_lens[:, None]
    align = jnp.where(frame_valid, align, blank_id)
    return align, score
