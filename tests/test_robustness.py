"""Inference robustness: media-decode retry + per-segment error context.

Reference behavior being matched:
  - bounded retry on corrupt media (src/avhubert_muavic/utils.py:14-30)
  - per-segment try/except with contextual message before re-raise
    (script/evaluation.py:290-294,316-320)
"""

import numpy as np
import pytest

from avsr_tpu.cli.evaluation import InferenceEngine
from avsr_tpu.data import media


def test_corrupt_video_retries_then_raises(tmp_path, capsys):
    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00\x01not-a-video\xff" * 64)
    with pytest.raises(IOError):
        media.load_video(str(bad))
    out = capsys.readouterr().out
    assert out.count("failed loading") == media.DECODE_RETRIES - 1


def test_corrupt_audio_retries_then_raises(tmp_path, capsys):
    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"garbage" * 100)
    with pytest.raises(IOError):
        media.load_audio(str(bad))
    out = capsys.readouterr().out
    assert out.count("failed loading") == media.DECODE_RETRIES - 1


def test_good_video_decodes_first_try(tmp_path, capsys):
    frames = np.random.randint(0, 255, (12, 32, 32), np.uint8)
    path = tmp_path / "ok.mp4"
    media.save_video(str(path), frames, fps=25.0)
    out = media.load_video(str(path))
    assert out.shape[0] == 12 and out.shape[-1] == 1
    assert "failed loading" not in capsys.readouterr().out


class _ExplodingCollator:
    def __call__(self, samples):
        raise RuntimeError("synthetic decode failure")


def test_segment_error_context_on_collate(tmp_path, capsys):
    engine = InferenceEngine("avsr_cocktail")
    engine.collator = _ExplodingCollator()
    sample = {"video": str(tmp_path / "x.mp4"), "start_time": 1.5, "end_time": 3.0}
    with pytest.raises(RuntimeError, match="synthetic decode failure"):
        engine._features([sample])
    out = capsys.readouterr().out
    assert "Error during inference for segment" in out
    assert "x.mp4" in out and "1.5" in out and "3.0" in out


def test_segment_context_redacts_bytes():
    ctx = InferenceEngine._segment_context(
        {"video": b"\x00" * 999, "start_time": 0.0, "end_time": 2.0}
    )
    assert "<999 bytes>" in ctx and "\x00" not in ctx


class _ExplodingRecognizer:
    audio_rate = 640

    def transcribe_batch_async(self, auds, vids, mode="beam", batch_pad=8):
        raise RuntimeError("device decode failure")


class _PassCollator:
    def __call__(self, samples):
        t = 4
        return {
            "audios": np.zeros((1, t * 4, 104), np.float32),
            "videos": np.zeros((1, t, 88, 88, 1), np.float32),
            "video_lengths": np.array([t], np.int32),
        }


def test_segment_error_context_on_decode(capsys):
    engine = InferenceEngine("avsr_cocktail")
    engine.collator = _PassCollator()
    engine.recognizer = _ExplodingRecognizer()
    sample = {"video": "vid.mp4", "start_time": 0.0, "end_time": 1.0}
    with pytest.raises(RuntimeError, match="device decode failure"):
        engine.infer_samples([sample])
    out = capsys.readouterr().out
    assert "Error during inference for segment" in out and "vid.mp4" in out


def test_every_pallas_kernel_selfchecked_or_exempt():
    """Kernel-validation discipline as mechanism, not memory (VERDICT r4 #2).

    Round 4 shipped a default-on kernel (stem_fuse) that was never compiled
    on hardware and took the driver bench to rc=1. This guard makes that
    impossible to repeat silently: every module under ops/pallas/ must either
    be referenced by selfcheck.py (which bench.py runs on the real device
    before trusting any kernel) or carry an explicit `SELFCHECK-EXEMPT:`
    marker with a justification.
    """
    import pathlib

    import avsr_tpu.ops.pallas as pk

    pk_dir = pathlib.Path(pk.__file__).parent
    selfcheck_src = (pk_dir / "selfcheck.py").read_text()
    missing = []
    for mod in sorted(pk_dir.glob("*.py")):
        name = mod.stem
        if name in ("__init__", "selfcheck"):
            continue
        referenced = (
            f"pallas.{name} import" in selfcheck_src
            or f"pallas import {name}" in selfcheck_src
            or f"from avsr_tpu.ops.pallas.{name}" in selfcheck_src
        )
        exempt = "SELFCHECK-EXEMPT:" in mod.read_text()
        if not (referenced or exempt):
            missing.append(name)
    assert not missing, (
        f"pallas kernels neither selfchecked nor exempted: {missing}. "
        "Add a check to ops/pallas/selfcheck.py at REAL serving/train block "
        "shapes, or an explicit 'SELFCHECK-EXEMPT: <reason>' marker."
    )
