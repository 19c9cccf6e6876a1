"""Tests for ShuffleNetV2 frontend, media writers, spm encode utility."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.conftest import requires_reference


def test_shufflenet_shapes():
    from avsr_tpu.models.shufflenetv2 import ShuffleNetV2, channel_shuffle

    net = ShuffleNetV2(width_mult=0.5)
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 1024)

    # channel shuffle semantics vs the reference layout
    v = jnp.arange(2 * 1 * 1 * 8).reshape(2, 1, 1, 8)
    got = np.asarray(channel_shuffle(v, 2))[0, 0, 0]
    np.testing.assert_array_equal(got, [0, 4, 1, 5, 2, 6, 3, 7])


@requires_reference
def test_channel_shuffle_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.nets.backend.backbones.modules.shufflenetv2 import channel_shuffle as ref

    from avsr_tpu.models.shufflenetv2 import channel_shuffle

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 3, 5).astype(np.float32)  # torch NCHW
    want = ref(torch.from_numpy(x), 2).numpy()
    got = np.asarray(channel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want)


def test_media_writers_roundtrip(tmp_path):
    from avsr_tpu.data import media

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(20, 64, 64), dtype=np.uint8)
    wave = (rng.randn(20 * 640) * 0.1).astype(np.float32)
    vid = str(tmp_path / "x" / "clip.mp4")
    aud = str(tmp_path / "x" / "clip.wav")
    txt = str(tmp_path / "x" / "clip.txt")
    media.save_vid_aud_txt(vid, aud, txt, frames, wave, "HELLO WORLD")

    back_v = media.load_video(vid)
    assert back_v.shape[0] == 20
    back_a = media.load_audio(vid)  # wav sidecar fallback
    assert abs(len(back_a) - len(wave)) < 10
    np.testing.assert_allclose(back_a[:100], wave[:100], atol=2e-4)
    assert open(txt).read() == "HELLO WORLD"
