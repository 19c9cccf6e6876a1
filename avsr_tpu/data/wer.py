"""Word error rate, jiwer-compatible semantics (reference script/evaluation.py:402).

``wer(reference, hypothesis)`` over lists aggregates: sum of word-level edit
distances across pairs divided by total reference word count.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np


def edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    """Levenshtein distance between token sequences (unit costs)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1, dtype=np.int32)
    cur = np.empty(m + 1, dtype=np.int32)
    for i in range(1, n + 1):
        cur[0] = i
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev, cur = cur, prev
    return int(prev[m])


def wer(
    reference: Union[str, List[str]],
    hypothesis: Union[str, List[str]],
) -> float:
    """Aggregate word error rate over one or more utterance pairs."""
    refs = [reference] if isinstance(reference, str) else list(reference)
    hyps = [hypothesis] if isinstance(hypothesis, str) else list(hypothesis)
    if len(refs) != len(hyps):
        raise ValueError(f"got {len(refs)} references but {len(hyps)} hypotheses")
    total_err = 0
    total_words = 0
    for r, h in zip(refs, hyps):
        r_words, h_words = r.split(), h.split()
        total_err += edit_distance(r_words, h_words)
        total_words += len(r_words)
    if total_words == 0:
        raise ValueError("empty reference")
    return total_err / total_words
