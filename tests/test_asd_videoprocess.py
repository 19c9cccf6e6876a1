"""ASD model parity + VideoProcess behavior tests."""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = requires_reference


def test_asd_model_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.talking_detector.Model import ASD_Model
    from src.talking_detector.loss import lossAV

    torch.manual_seed(0)
    tmodel = ASD_Model()
    tloss = lossAV()
    gen = torch.Generator().manual_seed(1)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = 0.05 * torch.randn(v.shape, generator=gen)
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
    tmodel.load_state_dict(sd)
    tmodel.eval()
    tloss.eval()

    from avsr_tpu.frontends.asd import ASDModel, asd_torch_to_flax

    state = {f"model.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    state.update({f"lossAV.{k}": v.detach().numpy() for k, v in tloss.state_dict().items()})
    state = {k: v for k, v in state.items()}
    # converter expects lossAV keys as lossAV.FC.weight
    state = {
        (k.replace("lossAV.FC.", "lossAV.") if k.startswith("lossAV.FC") else k): v
        for k, v in state.items()
    }
    variables = asd_torch_to_flax(state)
    jmodel = ASDModel()

    rng = np.random.RandomState(2)
    b, t = 2, 12
    visual = (rng.rand(b, t, 112, 112) * 255).astype(np.float32)
    audio = rng.randn(b, t * 4, 13).astype(np.float32)

    with torch.no_grad():
        a_embed = tmodel.forward_audio_frontend(torch.from_numpy(audio))
        v_embed = tmodel.forward_visual_frontend(torch.from_numpy(visual))
        outs_av = tmodel.forward_audio_visual_backend(a_embed, v_embed)
        score_t = tloss(outs_av).reshape(b, t)

    score_j = np.asarray(jmodel.apply(variables, jnp.asarray(audio), jnp.asarray(visual)))
    np.testing.assert_allclose(score_j, score_t, rtol=2e-3, atol=2e-3)


def test_video_process_matches_reference(tmp_path):
    import sys

    sys.path.insert(0, "/root/reference")

    # reference VideoProcess needs skimage only for the unused warp_img path;
    # stub it if missing
    try:
        import skimage  # noqa: F401
    except ImportError:
        import types

        sk = types.ModuleType("skimage")
        sk.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk.transform

    from src.retinaface.video_process import VideoProcess as RefVP

    from avsr_tpu.frontends.video_process import VideoProcess

    rng = np.random.RandomState(3)
    t, h, w = 14, 200, 220
    video = (rng.rand(t, h, w, 3) * 255).astype(np.uint8)

    # synthetic landmarks near the center with slight motion; a couple missing
    base = np.stack(
        [
            80 + 60 * rng.rand(68),
            70 + 80 * rng.rand(68),
        ],
        axis=1,
    ).astype(np.float32)
    landmarks = []
    for i in range(t):
        if i in (3, 7):
            landmarks.append(None)
        else:
            landmarks.append(base + i * 0.5 + rng.rand(68, 2))

    ref = RefVP(convert_gray=True)
    ours = VideoProcess(convert_gray=True)
    out_ref = ref(video.copy(), [None if l is None else l.copy() for l in landmarks])
    out_ours = ours(video.copy(), [None if l is None else l.copy() for l in landmarks])
    assert out_ours.shape == out_ref.shape == (t, 96, 96)
    # warping is identical cv2 math; allow tiny integer rounding differences
    diff = np.abs(out_ours.astype(int) - out_ref.astype(int))
    assert (diff <= 1).mean() > 0.995


def test_interpolate_and_smooth():
    from avsr_tpu.frontends.video_process import (
        interpolate_landmarks,
        smooth_landmarks,
    )

    a = np.zeros((68, 2))
    b = np.ones((68, 2)) * 4
    lms = interpolate_landmarks([None, a, None, None, None, b, None])
    assert np.allclose(lms[0], a)
    assert np.allclose(lms[2], a + (b - a) / 4)
    assert np.allclose(lms[6], b)

    seq = np.stack([np.full((68, 2), i, float) for i in range(10)])
    smoothed = smooth_landmarks(seq, window_margin=12)
    # re-centering preserves each frame's centroid
    np.testing.assert_allclose(
        smoothed.mean(axis=1), seq.mean(axis=1), atol=1e-9
    )
