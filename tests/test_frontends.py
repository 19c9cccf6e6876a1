"""Tests for ASD segmentation and speaker clustering (reference parity)."""

import json

import numpy as np
import pytest

from avsr_tpu.frontends.cluster import (
    adjusted_rand_index,
    calculate_conversation_scores,
    cluster_speakers,
    overlap_durations,
    pairwise_f1_score,
)
from avsr_tpu.frontends.segmentation import asd_chunks, fixed_chunks, segment_by_asd
from tests.conftest import requires_reference


def make_asd(scores, base=100):
    return {str(base + i): s for i, s in enumerate(scores)}


def test_segment_basic_hysteresis():
    # 30 active frames (>1s at 25fps) surrounded by silence
    scores = [0.0] * 10 + [2.0] * 30 + [0.0] * 10
    segs = segment_by_asd(make_asd(scores))
    assert len(segs) == 1
    assert segs[0][0] == 110 and segs[0][-1] == 139


def test_segment_short_region_dropped():
    scores = [0.0] * 10 + [2.0] * 10 + [0.0] * 50  # 10 frames < 1s
    assert segment_by_asd(make_asd(scores)) == []


def test_segment_gap_fill_and_split():
    # two 1.2s regions separated by a 0.2s gap -> merged (gap < 0.5s)
    scores = [2.0] * 30 + [0.0] * 5 + [2.0] * 30
    segs = segment_by_asd(make_asd(scores, base=0))
    assert len(segs) == 1
    # a 30s region gets split into ceil-division chunks <= 10s
    long = [2.0] * 750
    segs = segment_by_asd(make_asd(long, base=0))
    assert len(segs) == 3
    assert all(len(s) <= 250 for s in segs)


@requires_reference
def test_segment_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from src.talking_detector.segmentation import segment_by_asd as ref_segment

    rng = np.random.RandomState(0)
    for trial in range(5):
        scores = list(np.round(rng.randn(400) * 1.5 + 0.5, 3))
        asd = make_asd(scores, base=37)
        for params in ({}, {"max_chunk_size": 15}, {"onset": 2.4, "offset": 1.6}):
            ours = segment_by_asd(asd, dict(params))
            theirs = ref_segment(asd, dict(params))
            assert ours == theirs, (trial, params)


def test_fixed_chunks():
    segs = fixed_chunks(32.0, 15.0)
    assert segs[0][0] == 0.0
    assert segs[-1][1] == 32.0
    assert all(e - s <= 15.0 + 1e-9 for s, e in segs)


def test_asd_chunks_normalized():
    scores = [0.0] * 10 + [2.0] * 50 + [0.0] * 10
    segs = asd_chunks(make_asd(scores, base=200), max_length=15)
    assert len(segs) == 1
    s, e = segs[0]
    assert s == pytest.approx(10 / 25)
    assert e == pytest.approx(59 / 25)


def test_overlap_and_scores():
    a = [(0.0, 10.0)]
    b = [(5.0, 15.0)]
    ov, nov = overlap_durations(a, b)
    assert ov == 5.0 and nov == 10.0
    scores = calculate_conversation_scores({"a": a, "b": b, "c": [(20.0, 30.0)]})
    assert scores[0, 1] == pytest.approx(1 - 5 / 15)
    assert scores[0, 2] == pytest.approx(1.0)  # no overlap -> same conversation


def test_cluster_speakers():
    # a&b overlap heavily (different conversations), c&d talk in turns with a
    segs = {
        "a": [(0.0, 10.0)],
        "b": [(0.0, 10.0)],  # full overlap with a -> different conversation
        "c": [(10.0, 20.0)],  # no overlap with a -> same conversation
    }
    scores = calculate_conversation_scores(segs)
    clusters = cluster_speakers(scores, list(segs))
    assert clusters["a"] != clusters["b"]
    assert clusters["a"] == clusters["c"]


def test_pairwise_f1_and_ari():
    truth = [0, 0, 1, 1]
    assert pairwise_f1_score(truth, [0, 0, 1, 1]) == 1.0
    assert pairwise_f1_score(truth, [0, 1, 0, 1]) == 0.0
    assert adjusted_rand_index(truth, [1, 1, 0, 0]) == 1.0


@requires_reference
def test_cluster_matches_reference(tmp_path):
    import sys

    sys.path.insert(0, "/root/reference")
    from src.cluster.conv_spks import (
        calculate_conversation_scores as ref_scores,
        cluster_speakers as ref_cluster,
        get_speaker_activity_segments as ref_activity,
    )

    from avsr_tpu.frontends.cluster import get_speaker_activity_segments

    rng = np.random.RandomState(1)
    segs = {}
    for spk in "abcde":
        times = sorted(rng.uniform(0, 100, 6))
        segs[spk] = [(times[i], times[i + 1]) for i in range(0, 6, 2)]
    ours = calculate_conversation_scores(segs)
    theirs = ref_scores(segs)
    np.testing.assert_allclose(ours, theirs)
    assert cluster_speakers(ours, list(segs)) == ref_cluster(theirs, list(segs))

    # activity segments from ASD JSON files
    asd = make_asd(list(rng.randn(500) * 2), base=50)
    p = tmp_path / "asd.json"
    p.write_text(json.dumps(asd))
    ours_act = get_speaker_activity_segments([str(p)], 1.0, 18.0)
    theirs_act = ref_activity([str(p)], 1.0, 18.0)
    assert ours_act == theirs_act
