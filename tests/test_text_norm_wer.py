"""Tests for text normalization and WER (parity with reference semantics)."""

import pytest

from avsr_tpu.data.norm_text import classify_word, norm_string
from avsr_tpu.data.wer import edit_distance, wer


def test_reference_case():
    # the reference's own __main__ assertion (norm_text.py:136-145)
    assert (
        norm_string("I'm Binh i'm 25 years old i'm a AI researcher. It's a good day.")
        == "I'M BINH I'M 25 YEARS OLD I'M A AI RESEARCHER IT'S A GOOD DAY"
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("hello,", "HELLO"),
        ("don't", "DON'T"),
        ("state-of-the-art", "STATE OF THE ART"),
        ("100%", "100 PERCENT"),
        ("$1,000", "1000 DOLLAR"),
        ("£5", "5 POUND"),
        ("3.14", "3 POINT 14"),
        ("u.s.a", "USA"),
        ("google.com", "GOOGLE DOT COM"),
        ("plain", "PLAIN"),
        ("MiXeD", "MIXED"),
    ],
)
def test_word_rewrites(raw, expected):
    assert norm_string(raw) == expected


def test_classify():
    assert classify_word("hello,") == "word_end_with_punct"
    assert classify_word("it's") == "word_with_contractions"
    assert classify_word("co-op") == "word_with_hyphen"
    assert classify_word("12.5%") == "number_and_percentage"
    assert classify_word("a.b.c") == "abbreviation"


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance(["a", "b", "c"], ["a", "x", "c"]) == 1


def test_wer_aggregate():
    refs = ["THE CAT SAT", "ON THE MAT"]
    hyps = ["THE CAT SAT", "ON A MAT"]
    # 1 error / 6 reference words
    assert wer(refs, hyps) == pytest.approx(1 / 6)
    assert wer("A B C D", "A B C D") == 0.0
    with pytest.raises(ValueError):
        wer([""], ["X"])
