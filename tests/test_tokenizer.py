"""Tokenizer tests: protobuf parse, Viterbi segmentation, id mapping."""

import numpy as np
import pytest

from avsr_tpu.data.tokenizer import SpmPiece, SpmUnigram, TextTransform, parse_model_proto
from tests.conftest import requires_reference


def _toy_model():
    pieces = [
        SpmPiece("<unk>", 0.0, 2),
        SpmPiece("<s>", 0.0, 3),
        SpmPiece("</s>", 0.0, 3),
        SpmPiece("▁HE", -1.0, 1),
        SpmPiece("▁HELLO", -2.0, 1),
        SpmPiece("LLO", -2.5, 1),
        SpmPiece("▁WORLD", -3.0, 1),
        SpmPiece("▁", -4.0, 1),
        SpmPiece("W", -4.5, 1),
        SpmPiece("O", -4.5, 1),
        SpmPiece("R", -4.5, 1),
        SpmPiece("L", -4.5, 1),
        SpmPiece("D", -4.5, 1),
        SpmPiece("HELLO", -1.2, 1),
    ]
    return SpmUnigram(pieces)


def test_viterbi_picks_max_score_segmentation():
    spm = _toy_model()
    # "▁HELLO": either ["▁HELLO"] (-2.0) or ["▁HE","LLO"] (-3.5) -> single piece
    assert spm.encode_pieces("HELLO") == ["▁HELLO"]
    assert spm.encode_pieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]


def test_viterbi_equals_bruteforce():
    spm = _toy_model()

    def brute(s):
        best = (-1e18, None)

        def rec(pos, acc, score):
            nonlocal best
            if pos == len(s):
                if score > best[0]:
                    best = (score, list(acc))
                return
            for end in range(pos + 1, len(s) + 1):
                piece = s[pos:end]
                if piece in spm.scores:
                    acc.append(piece)
                    rec(end, acc, score + spm.scores[piece])
                    acc.pop()
            # unknown single char
            acc.append(s[pos])
            rec(pos + 1, acc, score + spm.unk_score)
            acc.pop()

        rec(0, [], 0.0)
        return best

    for text in ["HELLO", "WORLD HE", "HELLOWORLD", "HEXLLO"]:
        s = spm.normalize(text)
        score, _ = brute(s)
        pieces = spm.encode_pieces(text)
        got_score = sum(
            spm.scores.get(p, spm.unk_score * len(p)) for p in pieces
        )
        assert got_score == pytest.approx(score)


def test_unknown_chars_fused():
    spm = _toy_model()
    pieces = spm.encode_pieces("HE##LLO")
    # '##' is two unknown chars fused into one piece
    assert "##" in pieces


def test_normalization():
    spm = _toy_model()
    assert spm.normalize("  hello   world ") == "▁hello▁world"
    assert spm.normalize("") == ""
    assert spm.encode_pieces("") == []


@requires_reference
def test_real_assets_roundtrip():
    tt = TextTransform()
    assert tt.vocab_size == 5049
    assert tt.token_list[0] == "<blank>"
    assert tt.token_list[-1] == "<eos>"
    assert tt.hashmap["<unk>"] == 1

    ids = tt.tokenize("HELLO WORLD")
    assert ids.dtype == np.int32
    assert len(ids) > 0
    assert (ids > 0).all() and (ids < 5048).all()
    assert tt.post_process(ids) == "HELLO WORLD"

    # common words should not hit <unk>
    ids2 = tt.tokenize("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG")
    assert tt.post_process(ids2) == "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    assert (ids2 != tt.unk_id).all()


@requires_reference
def test_real_model_parse():
    pieces = parse_model_proto(
        "/root/reference/src/tokenizer/spm/unigram/unigram5000.model"
    )
    assert len(pieces) == 5000
    kinds = {p.type for p in pieces}
    assert 2 in kinds  # unk present
    scored = [p for p in pieces if p.type == 1]
    assert all(p.score < 0 for p in scored[1:])


@requires_reference
def test_spm_tools():
    from avsr_tpu.data.spm_tools import build_units, encode_lines

    model = "/root/reference/src/tokenizer/spm/unigram/unigram5000.model"
    lines = ["HELLO WORLD", "GOOD DAY"]
    encoded = list(encode_lines(model, lines))
    assert len(encoded) == 2
    assert all(tok for tok in encoded[0].split())
    units = build_units(model, lines)
    assert units[0] == "<unk> 1"
    ids = [int(u.split()[-1]) for u in units[1:]]
    assert ids == sorted(ids) and ids[0] == 2
