"""Guards against TPU Precision.DEFAULT bf16 truncation on exactness-critical dots.

On TPU, dot_general at Precision.DEFAULT rounds fp32 operands to bfloat16
(8-bit mantissa). The CTC prefix scorer's triangular cumsum sums hundreds of
log-prob nats (multi-nat error at T=375) and its one-hot "gather" matmuls
claim bit-exactness — both must run at HIGHEST. CPU tests cannot catch this
numerically (CPU DEFAULT == HIGHEST), so assert on the lowered StableHLO.
"""

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.decode import ctc_prefix  # noqa: E402


def _dot_lines(text):
    return [l for l in text.splitlines() if "dot_general" in l]


def test_score_candidates_dots_are_highest_precision():
    t, v, k, s = 16, 20, 3, 4
    logp = ctc_prefix.pad_log_probs(
        jax.nn.log_softmax(jnp.ones((t, v))), jnp.asarray(t)
    )
    state = ctc_prefix.init_state(logp, k, v - 1)
    ids = jnp.tile(jnp.arange(s)[None], (k, 1))
    txt = (
        jax.jit(
            lambda lp, st, pid: ctc_prefix.score_candidates(
                lp, jnp.asarray(t), st, pid, v - 1
            )
        )
        .lower(logp, state, ids)
        .as_text()
    )
    dots = _dot_lines(txt)
    assert dots, "expected dot_generals in score_candidates lowering"
    for d in dots:
        assert "HIGHEST" in d, f"fp32-critical dot at DEFAULT precision: {d.strip()}"


def test_select_candidates_dot_is_highest_precision():
    k, s, t = 3, 4, 16
    state = ctc_prefix.CTCPrefixState(
        r=jnp.zeros((k, t, 2)),
        s=jnp.zeros((k,)),
        last=jnp.zeros((k,), jnp.int32),
        out_len=jnp.asarray(0, jnp.int32),
    )
    r_cands = jnp.zeros((k, s, t, 2))
    prev = jnp.zeros((k,), jnp.int32)
    slot = jnp.zeros((k,), jnp.int32)
    tok = jnp.zeros((k,), jnp.int32)
    psi = jnp.zeros((k,))
    txt = (
        jax.jit(ctc_prefix.select_candidates)
        .lower(state, psi, r_cands, prev, slot, tok)
        .as_text()
    )
    dots = _dot_lines(txt)
    assert dots, "expected a dot_general in select_candidates lowering"
    for d in dots:
        assert "HIGHEST" in d, f"fp32-critical dot at DEFAULT precision: {d.strip()}"
