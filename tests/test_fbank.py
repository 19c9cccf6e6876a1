"""Tests for the log-fbank featurizer (python_speech_features parity)."""

import numpy as np
import pytest

from avsr_tpu.ops import fbank as F


def _psf_logfbank_golden(signal):
    """Independent straight-line transcription of the python_speech_features
    logfbank default path, kept deliberately un-refactored as a golden oracle."""
    import math

    sig = np.asarray(signal, dtype=np.float64)
    sig = np.append(sig[0], sig[1:] - 0.97 * sig[:-1])
    slen = len(sig)
    frame_len, frame_step, nfft = 400, 160, 512
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padsignal = np.concatenate((sig, np.zeros(padlen - slen)))
    indices = (
        np.tile(np.arange(0, frame_len), (numframes, 1))
        + np.tile(np.arange(0, numframes * frame_step, frame_step), (frame_len, 1)).T
    )
    frames = padsignal[indices.astype(np.int32)]
    pspec = 1.0 / nfft * np.square(np.abs(np.fft.rfft(frames, nfft)))

    # filterbank
    nfilt, samplerate = 26, 16000
    highfreq = samplerate / 2
    hz2mel = lambda hz: 2595 * np.log10(1 + hz / 700.0)
    mel2hz = lambda mel: 700 * (10 ** (mel / 2595.0) - 1)
    lowmel, highmel = hz2mel(0), hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bin = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)
    fb = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(0, nfilt):
        for i in range(int(bin[j]), int(bin[j + 1])):
            fb[j, i] = (i - bin[j]) / (bin[j + 1] - bin[j])
        for i in range(int(bin[j + 1]), int(bin[j + 2])):
            fb[j, i] = (bin[j + 2] - i) / (bin[j + 2] - bin[j + 1])
    feat = np.dot(pspec, fb.T)
    feat = np.where(feat == 0, np.finfo(float).eps, feat)
    return np.log(feat)


@pytest.mark.parametrize("nsamples", [400, 640, 6400, 16000, 16123])
def test_logfbank_np_matches_psf_formulas(nsamples):
    rng = np.random.RandomState(0)
    sig = rng.randn(nsamples).astype(np.float32)
    got = F.logfbank_np(sig)
    want = _psf_logfbank_golden(sig)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_frame_count_alignment_with_video():
    # T video frames * 640 samples -> 4T-1 fbank frames -> T stacked rows.
    for t in [1, 7, 25, 375]:
        n = F.num_frames(t * F.RATE_RATIO)
        assert n == max(1, 4 * t - 1)
        sig = np.zeros(t * F.RATE_RATIO, dtype=np.float32)
        feats = F.fbank_stack_np(sig)
        assert feats.shape == (t, 104)


def test_jax_matches_numpy():
    rng = np.random.RandomState(1)
    sig = rng.randn(25 * F.RATE_RATIO).astype(np.float32)
    got = np.asarray(F.fbank_stack(sig))
    want = F.fbank_stack_np(sig)
    assert got.shape == want.shape
    # fp32 FFT on device vs fp64 host: ~1e-3 absolute is expected and far
    # below what the layer-normed features care about.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_layer_norm_semantics():
    rng = np.random.RandomState(2)
    sig = rng.randn(10 * F.RATE_RATIO).astype(np.float32)
    feats = F.fbank_stack_np(sig)
    # per-frame normalization: zero mean, ~unit std along feature dim
    np.testing.assert_allclose(feats.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(feats.std(-1), 1.0, atol=1e-3)


def test_cut_or_pad():
    a = np.arange(10, dtype=np.float32)[:, None]
    assert F.cut_or_pad_np(a, 6).shape == (6, 1)
    padded = F.cut_or_pad_np(a, 15)
    assert padded.shape == (15, 1)
    assert padded[10:].sum() == 0


def test_native_matches_numpy():
    from avsr_tpu.ops import fbank as F

    if F._NATIVE is None:
        pytest.skip("native library not built")
    rng = np.random.RandomState(5)
    for n in (640, 6400, 16123, 25 * 640):
        sig = rng.randn(n).astype(np.float32)
        native = F.fbank_stack_native(sig)
        feats = F.stack_frames_np(F.logfbank_np(sig))
        mean = feats.mean(axis=-1, keepdims=True)
        var = feats.var(axis=-1, keepdims=True)
        pure = ((feats - mean) / np.sqrt(var + 1e-5)).astype(np.float32)
        assert native.shape == pure.shape
        np.testing.assert_allclose(native, pure, rtol=1e-4, atol=1e-4)


def test_native_speed():
    from avsr_tpu.ops import fbank as F

    if F._NATIVE is None:
        pytest.skip("native library not built")
    import time

    sig = np.random.RandomState(0).randn(15 * 16000).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(20):
        F.fbank_stack_native(sig)
    native_t = time.perf_counter() - t0
    # 20 x 15s utterances; keep a sane absolute budget for the host data plane
    assert native_t < 2.0, f"native featurizer too slow: {native_t:.2f}s/20 utts"
