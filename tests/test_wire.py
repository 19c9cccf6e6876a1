"""Video wire codec: host delta encode -> device decode is bit-exact."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from avsr_tpu.data.wire import delta_decode_video, delta_encode_video  # noqa: E402


def test_roundtrip_random():
    rng = np.random.RandomState(0)
    vid = rng.randint(0, 256, size=(3, 17, 8, 8, 1), dtype=np.uint8)
    enc = delta_encode_video(vid)
    dec = np.asarray(delta_decode_video(enc))
    np.testing.assert_array_equal(dec, vid)


def test_roundtrip_wraparound_and_cuts():
    # hard black->white cuts exercise the mod-256 wrap in both directions
    vid = np.zeros((1, 6, 4, 4, 1), np.uint8)
    vid[0, 1::2] = 255
    vid[0, 3] = 1
    enc = delta_encode_video(vid)
    dec = np.asarray(delta_decode_video(enc))
    np.testing.assert_array_equal(dec, vid)


def test_smooth_video_delta_is_small():
    # the point of the codec: smooth motion -> near-zero deltas
    t = np.linspace(0, 2 * np.pi, 40)
    vid = (127 + 40 * np.sin(t)[:, None, None, None]
           * np.ones((1, 8, 8, 1))).astype(np.uint8)[None]
    enc = delta_encode_video(vid)
    body = enc[:, 1:].astype(np.int8)  # wraparound deltas as signed
    assert np.abs(body).max() <= 7


def test_recognizer_wire_equivalence():
    """delta vs raw uint8 wire produce identical transcripts."""
    from avsr_tpu.core.config import AVHubertAVSRConfig, AVHubertEncoderConfig
    from avsr_tpu.decode.recognizer import Recognizer
    from avsr_tpu.models.e2e import AVSRModel
    import jax.numpy as jnp

    cfg = AVHubertAVSRConfig(
        odim=40, adim=32, ddim=32, dheads=2, dunits=48, dlayers=2,
        encoder=AVHubertEncoderConfig(
            encoder_embed_dim=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        ),
    )
    model = AVSRModel(cfg)
    rng = np.random.RandomState(3)
    videos = jnp.asarray(rng.randn(1, 4, 88, 88, 1).astype(np.float32))
    audios = jnp.asarray(rng.randn(1, 4, 104).astype(np.float32))
    labels = jnp.asarray([[3, 4]], dtype=jnp.int32)
    variables = model.init(
        {"params": rng_key()}, videos, audios, labels,
        jnp.asarray([4], jnp.int32), jnp.asarray([2], jnp.int32),
    )

    feats_a = [rng.randn(12, 104).astype(np.float32) for _ in range(2)]
    feats_v = [
        rng.randint(0, 256, size=(12, 88, 88, 1), dtype=np.uint8)
        for _ in range(2)
    ]
    outs = {}
    for wire in ("uint8", "delta"):
        rec = Recognizer(
            model=model, variables=variables, cfg=cfg, beam_size=2,
            t_buckets=(16,), video_wire=wire,
        )
        outs[wire] = rec.transcribe_batch(feats_a, feats_v, mode="beam")
    for a, b in zip(outs["uint8"], outs["delta"]):
        np.testing.assert_array_equal(a, b)


def rng_key():
    import jax

    return jax.random.PRNGKey(0)
