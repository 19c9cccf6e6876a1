"""RetinaFace + FAN parity vs the reference torch implementations."""

import sys
import types

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = requires_reference


def _shim_torchvision():
    """Minimal torchvision stub: the reference only uses
    models._utils.IntermediateLayerGetter (+ models.resnet50, unused for
    the mobilenet variant)."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    class IntermediateLayerGetter(tnn.ModuleDict):
        def __init__(self, model, return_layers):
            layers = {}
            remaining = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    import importlib.machinery

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    utils = types.ModuleType("torchvision.models._utils")
    utils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = utils
    models.resnet50 = None
    tv.models = models
    tv.__version__ = "0.0.0+shim"
    # importlib.util.find_spec chokes on spec-less modules (transformers
    # probes torchvision availability); give the shims real-looking specs
    for name, mod in (
        ("torchvision", tv),
        ("torchvision.models", models),
        ("torchvision.models._utils", utils),
    ):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def _randomize_bn(model, seed):
    import torch

    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = 0.05 * torch.randn(v.shape, generator=gen)
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
    model.load_state_dict(sd)


def test_retinaface_mobilenet_parity():
    sys.path.insert(0, "/root/reference")
    _shim_torchvision()
    import torch

    from src.ibug.face_detection.retina_face.config import cfg_mnet
    from src.ibug.face_detection.retina_face.retina_face import RetinaFace

    torch.manual_seed(0)
    tnet = RetinaFace(cfg=dict(cfg_mnet), phase="test")
    _randomize_bn(tnet, 1)
    tnet.eval()

    from avsr_tpu.frontends.retinaface import RetinaFaceNet, retinaface_torch_to_flax

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = retinaface_torch_to_flax(state, backbone="mobilenet0.25")
    jnet = RetinaFaceNet(backbone="mobilenet0.25", out_channel=64)

    rng = np.random.RandomState(2)
    img = rng.randn(1, 128, 160, 3).astype(np.float32) * 50
    with torch.no_grad():
        loc_t, conf_t, ldm_t = tnet(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    loc_j, conf_j, ldm_j = jnet.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(loc_j), loc_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf_j), conf_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ldm_j), ldm_t.numpy(), rtol=1e-3, atol=1e-3)


def test_priors_match_reference():
    sys.path.insert(0, "/root/reference")
    from src.ibug.face_detection.retina_face.config import cfg_re50
    from src.ibug.face_detection.retina_face.prior_box import PriorBox

    from avsr_tpu.frontends.retinaface import CFG_RE50, prior_boxes

    ref = PriorBox(dict(cfg_re50), image_size=(120, 160)).forward().numpy()
    ours = prior_boxes((120, 160), CFG_RE50)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_decode_and_nms_match_reference():
    sys.path.insert(0, "/root/reference")
    import torch

    from src.ibug.face_detection.retina_face.box_utils import decode, decode_landm
    from src.ibug.face_detection.retina_face.py_cpu_nms import py_cpu_nms

    from avsr_tpu.frontends.retinaface import decode_boxes, decode_landmarks, nms

    rng = np.random.RandomState(3)
    priors = np.abs(rng.rand(50, 4)).astype(np.float32)
    loc = rng.randn(50, 4).astype(np.float32) * 0.1
    pre = rng.randn(50, 10).astype(np.float32) * 0.1
    np.testing.assert_allclose(
        decode_boxes(loc.copy(), priors),
        decode(torch.from_numpy(loc), torch.from_numpy(priors), [0.1, 0.2]).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        decode_landmarks(pre, priors),
        decode_landm(torch.from_numpy(pre), torch.from_numpy(priors), [0.1, 0.2]).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    dets = np.hstack(
        [rng.rand(30, 2) * 50, 50 + rng.rand(30, 2) * 50, rng.rand(30, 1)]
    ).astype(np.float32)
    assert nms(dets, 0.4, top_k=5000) == py_cpu_nms(dets, 0.4, 5000)


def test_retinaface_resnet50_shapes():
    from avsr_tpu.frontends.retinaface import RetinaFaceNet

    net = RetinaFaceNet(backbone="resnet50", out_channel=256)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    loc, conf, ldm = net.apply(variables, jnp.zeros((2, 64, 64, 3)))
    # anchors: 2 per location over strides 8/16/32
    n = 2 * (8 * 8 + 4 * 4 + 2 * 2)
    assert loc.shape == (2, n, 4)
    assert conf.shape == (2, n, 2)
    assert ldm.shape == (2, n, 10)
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, rtol=1e-5)


def test_fan_parity():
    sys.path.insert(0, "/root/reference")
    import torch
    from types import SimpleNamespace

    from src.ibug.face_alignment.fan.fan import FAN as RefFAN

    cfg = SimpleNamespace(
        crop_ratio=0.55, input_size=64, num_modules=2, hg_num_features=256,
        hg_depth=4, use_avg_pool=False, use_instance_norm=False,
        stem_conv_kernel_size=7, stem_conv_stride=2, stem_pool_kernel_size=2,
        num_landmarks=68,
    )
    torch.manual_seed(4)
    tnet = RefFAN(cfg)
    _randomize_bn(tnet, 5)
    tnet.eval()

    from avsr_tpu.frontends.fan import FAN, fan_torch_to_flax

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = fan_torch_to_flax(state)
    jnet = FAN(num_modules=2)

    rng = np.random.RandomState(6)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        hm_t, _, _ = tnet(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    hm_j = jnet.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(hm_j, (0, 3, 1, 2))), hm_t.numpy(),
        rtol=2e-3, atol=2e-3,
    )


def test_fan_decode_matches_reference():
    sys.path.insert(0, "/root/reference")
    import torch

    from avsr_tpu.frontends.fan import decode_heatmaps

    # replicate the reference _decode math directly (fan_predictor.py:127)
    rng = np.random.RandomState(7)
    hm = rng.rand(2, 16, 16, 68).astype(np.float32)

    from types import SimpleNamespace

    from src.ibug.face_alignment.fan.fan_predictor import FANPredictor as RefPred

    pred = RefPred.__new__(RefPred)
    pred.config = SimpleNamespace(radius=0.1, gamma=1.0)
    lms_t, scores_t = pred._decode(torch.from_numpy(hm.transpose(0, 3, 1, 2)))

    lms_j, scores_j = decode_heatmaps(jnp.asarray(hm), radius=0.1, gamma=1.0)
    np.testing.assert_allclose(np.asarray(lms_j), lms_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores_j), scores_t, rtol=1e-5, atol=1e-5)
