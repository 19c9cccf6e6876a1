"""Tests for mask/label-layout ops against reference list-based semantics."""

import numpy as np

from avsr_tpu.ops.masks import (
    add_sos_eos,
    make_non_pad_mask,
    subsequent_mask,
    target_mask,
)


def test_non_pad_mask():
    m = np.asarray(make_non_pad_mask(np.array([5, 3, 2]), 5))
    expect = np.array(
        [
            [1, 1, 1, 1, 1],
            [1, 1, 1, 0, 0],
            [1, 1, 0, 0, 0],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(m, expect)


def test_subsequent_mask():
    m = np.asarray(subsequent_mask(3))
    np.testing.assert_array_equal(
        m, np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=bool)
    )


def test_target_mask():
    ys = np.array([[5, 7, -1], [2, 3, 4]])
    m = np.asarray(target_mask(ys))
    assert m.shape == (2, 3, 3)
    # first row: length 2: position 2 masked as key everywhere
    assert not m[0, 2, 2]
    assert m[0, 1, 0] and m[0, 1, 1]
    assert not m[0, 0, 1]  # causal
    assert m[1].sum() == 6  # full causal triangle


def test_add_sos_eos_matches_reference_layout():
    # reference: ys_in = pad([sos + y], eos), ys_out = pad([y + eos], ignore)
    sos = eos = 100
    ys = np.array([[4, 5, 6], [7, -1, -1]])
    lens = np.array([3, 1])
    ys_in, ys_out = add_sos_eos(ys, lens, sos, eos)
    np.testing.assert_array_equal(
        np.asarray(ys_in), [[100, 4, 5, 6], [100, 7, 100, 100]]
    )
    np.testing.assert_array_equal(
        np.asarray(ys_out), [[4, 5, 6, 100], [7, 100, -1, -1]]
    )


def test_compute_mask_indices():
    from avsr_tpu.ops.span_mask import apply_span_mask, compute_mask_indices

    rng = np.random.RandomState(0)
    mask = compute_mask_indices((4, 100), None, 0.3, 10, rng=rng)
    assert mask.shape == (4, 100)
    # every row masks the same number of positions (batch-min trimming)
    counts = mask.sum(axis=1)
    assert (counts == counts[0]).all()
    assert 0 < counts[0] <= 60

    pad = np.zeros((4, 100), bool)
    pad[2, 60:] = True  # row 2 has only 60 valid frames
    mask = compute_mask_indices((4, 100), pad, 0.3, 10, min_masks=2, rng=rng)
    assert mask.shape == (4, 100)

    feats = rng.randn(4, 100, 8).astype(np.float32)
    out = apply_span_mask(feats, mask)
    assert (out[mask] == 0).all()
    assert np.allclose(out[~mask], feats[~mask])

    emb = rng.randn(8).astype(np.float32)
    out = apply_span_mask(feats, mask, emb)
    assert np.allclose(out[mask], emb)
