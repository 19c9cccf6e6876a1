"""Forced alignment parity vs the reference CTC.forced_align."""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.decode.forced_align import forced_align, interpolate_blank  # noqa: E402


def test_interpolate_blank():
    labels = jnp.asarray([[3, 4, 5]])
    out = np.asarray(interpolate_blank(labels))
    np.testing.assert_array_equal(out[0], [0, 3, 0, 4, 0, 5, 0])


def test_forced_align_simple():
    # 3-class toy: label [1, 2], probs strongly peaked
    probs = np.full((1, 6, 3), 0.05, np.float32)
    peaks = [1, 1, 0, 2, 2, 0]
    for t, c in enumerate(peaks):
        probs[0, t, c] = 0.9
    logp = jnp.log(jnp.asarray(probs))
    align, score = forced_align(
        logp, jnp.asarray([6]), jnp.asarray([[1, 2]]), jnp.asarray([2])
    )
    np.testing.assert_array_equal(np.asarray(align)[0], peaks)
    assert np.isfinite(float(score[0]))


def _brute_force_viterbi(logp, y, blank=0):
    """Exact CTC Viterbi by enumerating monotonic state paths (small cases).

    NB: the reference forced_align (ctc.py:211-216) indexes logdelta[t-1, s-1]
    at s=0, which numpy wraps to the LAST state — producing occasional
    invalid non-monotonic alignments, so it cannot serve as the oracle here.
    """
    t_max, v = logp.shape
    y_int = [blank]
    for tok in y:
        y_int += [int(tok), blank]
    s_len = len(y_int)
    NEG = -1e18
    delta = np.full((t_max, s_len), NEG)
    back = np.zeros((t_max, s_len), int)
    delta[0, 0] = logp[0, y_int[0]]
    if s_len > 1:
        delta[0, 1] = logp[0, y_int[1]]
    for t in range(1, t_max):
        for s in range(s_len):
            cands = [delta[t - 1, s]]
            prevs = [s]
            if s >= 1:
                cands.append(delta[t - 1, s - 1])
                prevs.append(s - 1)
            if s >= 2 and y_int[s] != blank and y_int[s] != y_int[s - 2]:
                cands.append(delta[t - 1, s - 2])
                prevs.append(s - 2)
            j = int(np.argmax(cands))
            delta[t, s] = cands[j] + logp[t, y_int[s]]
            back[t, s] = prevs[j]
    end = s_len - 1 if delta[-1, s_len - 1] >= delta[-1, s_len - 2] else s_len - 2
    states = [end]
    for t in range(t_max - 1, 0, -1):
        states.append(back[t, states[-1]])
    states.reverse()
    return np.array([y_int[s] for s in states]), max(
        delta[-1, s_len - 1], delta[-1, s_len - 2]
    )


def test_forced_align_matches_bruteforce():
    rng = np.random.RandomState(0)
    v = 12
    for trial in range(6):
        t = int(rng.randint(8, 16))
        l = int(rng.randint(2, 5))
        logp = np.log(
            np.random.RandomState(100 + trial).dirichlet(np.ones(v), size=t)
        ).astype(np.float32)
        y = rng.randint(1, v - 1, size=l)
        want, want_score = _brute_force_viterbi(logp, y)

        align, score = forced_align(
            jnp.asarray(logp)[None],
            jnp.asarray([t]),
            jnp.asarray(y[None].astype(np.int32)),
            jnp.asarray([l]),
        )
        np.testing.assert_array_equal(np.asarray(align)[0], want)
        np.testing.assert_allclose(float(score[0]), want_score, rtol=1e-5)


def test_forced_align_batch_padding():
    """Batched/padded alignment equals per-utterance alignment."""
    rng = np.random.RandomState(1)
    v = 10
    lens = [9, 6]
    llens = [3, 2]
    logps = [
        np.log(np.random.RandomState(10 + i).dirichlet(np.ones(v), size=t)).astype(
            np.float32
        )
        for i, t in enumerate(lens)
    ]
    labels = [rng.randint(1, v, size=n) for n in llens]

    # batched, padded
    t_max, l_max = max(lens), max(llens)
    lp = np.full((2, t_max, v), -20.0, np.float32)
    lab = np.zeros((2, l_max), np.int32)
    for i in range(2):
        lp[i, : lens[i]] = logps[i]
        lab[i, : llens[i]] = labels[i]
    align_b, _ = forced_align(
        jnp.asarray(lp), jnp.asarray(lens), jnp.asarray(lab), jnp.asarray(llens)
    )
    for i in range(2):
        align_1, _ = forced_align(
            jnp.asarray(logps[i])[None],
            jnp.asarray([lens[i]]),
            jnp.asarray(labels[i][None].astype(np.int32)),
            jnp.asarray([llens[i]]),
        )
        np.testing.assert_array_equal(
            np.asarray(align_b)[i, : lens[i]], np.asarray(align_1)[0]
        )
