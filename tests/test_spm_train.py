"""Unigram SPM training (train.sh equivalent) + dialog collator coverage."""

import numpy as np
import pytest

from avsr_tpu.data.spm_train import (
    save_model,
    serialize_model_proto,
    train_and_save,
    train_unigram,
)
from avsr_tpu.data.tokenizer import SpmUnigram, TextTransform, parse_model_proto

CORPUS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "THE DOG BARKS AT THE FOX",
    "A QUICK BROWN DOG RUNS OVER THE HILL",
    "SPEECH RECOGNITION OVER NOISY COCKTAIL PARTY AUDIO",
    "THE PARTY WAS OVER BEFORE THE SPEECH",
    "AUDIO VISUAL SPEECH RECOGNITION WITH LIP READING",
    "READING THE LIPS OF THE SPEAKER IN THE VIDEO",
    "THE SPEAKER IN THE NOISY VIDEO WAS QUICK",
] * 4


def test_train_unigram_learns_frequent_words():
    pieces = train_unigram(CORPUS, vocab_size=80, max_piece_len=8)
    assert len(pieces) <= 80
    # reserved layout matches sentencepiece defaults
    assert pieces[0].piece == "<unk>" and pieces[0].type == 2
    assert pieces[1].piece == "<s>" and pieces[2].piece == "</s>"
    vocab = {p.piece for p in pieces}
    for word in ("▁THE", "▁QUICK", "▁SPEECH", "▁OVER"):
        assert word in vocab, f"{word} not learned"
    # every corpus character is covered
    chars = {c for line in CORPUS for c in line.replace(" ", "")}
    assert chars <= {c for p in vocab for c in p}


def test_proto_roundtrip(tmp_path):
    pieces = train_unigram(CORPUS, vocab_size=60, max_piece_len=8)
    path = str(tmp_path / "m.model")
    save_model(pieces, path)
    back = parse_model_proto(path)
    assert [(p.piece, p.type) for p in back] == [(p.piece, p.type) for p in pieces]
    np.testing.assert_allclose(
        [p.score for p in back], [p.score for p in pieces], rtol=1e-6
    )


def test_trained_model_segments_sensibly(tmp_path):
    pieces = train_unigram(CORPUS, vocab_size=80, max_piece_len=8)
    path = str(tmp_path / "m.model")
    save_model(pieces, path)
    spm = SpmUnigram(parse_model_proto(path))
    out = spm.encode_pieces("THE QUICK BROWN FOX")
    assert out == ["▁THE", "▁QUICK", "▁BROWN", "▁FOX"]
    # unseen characters fall back to fused unknown pieces, never crash
    assert spm.encode_pieces("ZZZ 123")


def test_train_and_save_units_pipeline(tmp_path):
    corpus_path = tmp_path / "input.txt"
    corpus_path.write_text("\n".join(CORPUS))
    prefix = str(tmp_path / "unigram80")
    train_and_save(str(corpus_path), prefix, vocab_size=80, max_piece_len=8)
    # units file follows train.sh: "<unk> 1" first, corpus pieces from id 2
    lines = (tmp_path / "unigram80_units.txt").read_text().splitlines()
    assert lines[0] == "<unk> 1"
    ids = [int(l.split()[-1]) for l in lines]
    assert ids == list(range(1, len(lines) + 1))
    # the full TextTransform stack loads the trained assets
    tt = TextTransform(prefix + ".model", prefix + "_units.txt")
    ids = tt.tokenize("THE QUICK BROWN FOX")
    assert (ids > 0).all() and tt.unk_id not in ids
    assert tt.post_process(ids) == "THE QUICK BROWN FOX"


def test_empty_corpus_raises():
    with pytest.raises(ValueError):
        train_unigram([])


def test_dialog_collator_ignores_segment_times(tmp_path):
    from avsr_tpu.data import media
    from avsr_tpu.data.dialog_dataset import DialogDataCollator

    frames = np.random.randint(0, 255, (20, 96, 96), np.uint8)
    wave = np.random.randn(20 * 640).astype(np.float32) * 0.1
    vid = tmp_path / "clip.mp4"
    media.save_video(str(vid), frames, fps=25.0)
    media.save_audio(str(tmp_path / "clip.wav"), wave)

    collator = DialogDataCollator()
    batch = collator(
        [{"video": str(vid), "start_time": 0.2, "end_time": 0.4}]
    )
    # full file decoded despite segment times in the sample dict
    assert batch["video_lengths"][0] == 20
    assert batch["videos"].shape[1:] == (20, 88, 88, 1)
    assert batch["audios"].shape[1] == 20
