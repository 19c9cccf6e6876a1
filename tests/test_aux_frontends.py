"""Parity tests for S3FD, SimpleFaceTracker, HeadPoseEstimator, ErrorCalculator."""

import sys

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = requires_reference


def test_s3fd_parity():
    sys.path.insert(0, "/root/reference")
    from tests.test_face_models_parity import _shim_torchvision

    _shim_torchvision()
    import torch
    from types import SimpleNamespace

    from src.ibug.face_detection.s3fd.s3fd_net import S3FDNet as RefNet

    cfg = SimpleNamespace(
        num_classes=2, variance=(0.1, 0.2),
        prior_min_sizes=(16, 32, 64, 128, 256, 512),
        prior_steps=(4, 8, 16, 32, 64, 128), prior_clip=False,
        top_k=750, conf_thresh=0.05, nms_thresh=0.3, nms_top_k=5000,
        use_nms_np=True,
    )
    torch.manual_seed(0)
    tnet = RefNet(cfg, device="cpu")
    tnet.eval()

    from avsr_tpu.frontends.s3fd import S3FDNet, s3fd_priors, s3fd_torch_to_flax

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = s3fd_torch_to_flax(state)
    jnet = S3FDNet()

    rng = np.random.RandomState(1)
    img = rng.randn(1, 128, 128, 3).astype(np.float32) * 30
    with torch.no_grad():
        det_t = tnet(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    loc_j, conf_j, fmaps = jnet.apply(variables, jnp.asarray(img))
    # the reference returns already-NMS'd detections; compare the decoded
    # top-scoring boxes instead of raw maps
    from avsr_tpu.frontends.retinaface import decode_boxes

    priors = s3fd_priors((128, 128), fmaps)
    boxes_j = decode_boxes(np.asarray(loc_j)[0], priors, (0.1, 0.2))
    scores_j = np.asarray(conf_j)[0, :, 1]
    # reference Detect output: (1, num_classes, top_k, 5) [score, x1,y1,x2,y2]
    ref = det_t[0, 1].numpy()
    ref = ref[ref[:, 0] > 0.05]
    if len(ref):
        best_ref = ref[0]
        i = int(np.argmax(scores_j))
        np.testing.assert_allclose(scores_j[i], best_ref[0], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(boxes_j[i], best_ref[1:], rtol=1e-3, atol=2e-3)
    else:
        assert scores_j.max() <= 0.05 + 1e-3


def test_face_tracker_parity():
    sys.path.insert(0, "/root/reference")
    from src.ibug.face_detection.utils.simple_face_tracker import (
        SimpleFaceTracker as RefTracker,
    )

    from avsr_tpu.frontends.tracker import SimpleFaceTracker

    rng = np.random.RandomState(2)
    ours, ref = SimpleFaceTracker(), RefTracker()
    boxes = np.array([[10, 10, 50, 50], [100, 100, 150, 160]], float)
    for step in range(6):
        drift = rng.randn(*boxes.shape) * 2
        frame_boxes = boxes + drift
        if step == 3:
            frame_boxes = frame_boxes[:1]  # one face disappears
        if step == 4:
            frame_boxes = np.vstack([frame_boxes, [[300, 300, 340, 350]]])
        assert ours(frame_boxes.copy()) == ref(frame_boxes.copy())
    ours.reset()
    ref.reset()
    assert ours(np.empty((0, 4))) == ref(np.empty((0, 4)))


def test_head_pose_parity():
    sys.path.insert(0, "/root/reference")
    from src.ibug.face_detection.utils.head_pose_estimator import (
        HeadPoseEstimator as RefHPE,
    )

    from avsr_tpu.frontends.headpose import HeadPoseEstimator

    ref = RefHPE()
    ours = HeadPoseEstimator()
    rng = np.random.RandomState(3)
    # plausible frontal-face landmark layout
    lm = np.zeros((68, 2))
    lm[17:] = rng.rand(51, 2) * 100 + 100
    got = ours(lm.copy(), image_width=640, image_height=480)
    want = ref(lm.copy(), image_width=640, image_height=480)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_error_calculator():
    from avsr_tpu.data.wer import ErrorCalculator

    chars = ["<blank>", "A", "B", "C", "<space>"]
    calc = ErrorCalculator(chars, "<space>", "<blank>", report_cer=True,
                           report_wer=True)
    hyp = [[1, 2, 4, 3]]  # "AB C"
    ref = [[1, 2, 4, 3]]
    cer, wer = calc(hyp, ref)
    assert cer == 0.0 and wer == 0.0
    hyp = [[1, 1, 4, 3]]  # "AA C"
    cer, wer = calc(hyp, ref)
    assert cer == pytest.approx(1 / 3)
    assert wer == pytest.approx(1 / 2)
    # CTC path: repeats collapse, blanks drop
    cer_ctc = calc([[1, 1, 0, 2]], [[1, 2]], is_ctc=True)
    assert cer_ctc == 0.0


def test_split_asd_transcript(tmp_path):
    from avsr_tpu.frontends.tracker import split_asd_transcript

    p = tmp_path / "t.txt"
    lines = ["header stuff", "WORD START END ASDSCORE"]
    t = 0.0
    for i in range(40):
        lines.append(f"w{i} {t:.2f} {t + 0.4:.2f} 1.0")
        t += 0.8
    p.write_text("\n".join(lines))
    segs = split_asd_transcript(str(p), max_frames=600)
    assert len(segs) >= 2
    assert all(seg[3] <= 600 / 25.0 + 1.0 for seg in segs)
    assert segs[0][0].startswith("w0")
