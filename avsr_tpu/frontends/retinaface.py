"""RetinaFace face detector (batched, channels-last) for offline AV preprocessing.

Re-design of the reference detector stack
(/root/reference/src/ibug/face_detection/retina_face/): MobileNetV1-0.25 or
ResNet-50 backbone -> FPN -> SSH context heads -> bbox/class/10-pt-landmark
anchors (2 per location, strides 8/16/32), SSD-style decode and NMS. The
reference runs one frame at a time (retina_face_predictor.py:59); here the
network runs batched over frames on TPU and only per-frame NMS stays on host.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from itertools import product
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CFG_MNET = dict(
    name="mobilenet0.25",
    min_sizes=((16, 32), (64, 128), (256, 512)),
    steps=(8, 16, 32),
    variance=(0.1, 0.2),
    in_channel=32,
    out_channel=64,
)
CFG_RE50 = dict(
    name="resnet50",
    min_sizes=((16, 32), (64, 128), (256, 512)),
    steps=(8, 16, 32),
    variance=(0.1, 0.2),
    in_channel=256,
    out_channel=256,
)

BGR_MEAN = np.array([104.0, 117.0, 123.0], np.float32)


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)


class ConvBN(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.out, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=pad, use_bias=False, feature_group_count=self.groups, name="m0",
        )(x)
        x = _bn("m1")(x)
        if self.relu:
            x = jnp.where(x >= 0, x, self.leaky * x)
        return x


class ConvDW(nn.Module):
    """Depthwise separable block (retina_face_net.py conv_dw), leaky 0.1."""

    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, feature_group_count=c, name="m0")(x)
        x = _bn("m1")(x)
        x = jnp.where(x >= 0, x, 0.1 * x)
        x = nn.Conv(self.out, (1, 1), use_bias=False, name="m3")(x)
        x = _bn("m4")(x)
        return jnp.where(x >= 0, x, 0.1 * x)


class Seq(nn.Module):
    """Sequential container whose children are named m0, m1, ... so torch
    Sequential indices map mechanically onto the flax tree."""

    makers: Tuple  # tuple of callables name -> module

    @nn.compact
    def __call__(self, x):
        for i, make in enumerate(self.makers):
            x = make(name=f"m{i}")(x)
        return x


class MobileNetV1Quarter(nn.Module):
    """MobileNetV1 x0.25 backbone returning stage1/2/3 features."""

    @nn.compact
    def __call__(self, x):
        f1 = Seq(
            (
                partial(ConvBN, 8, 3, 2, leaky=0.1),
                partial(ConvDW, 16, 1),
                partial(ConvDW, 32, 2),
                partial(ConvDW, 32, 1),
                partial(ConvDW, 64, 2),
                partial(ConvDW, 64, 1),
            ),
            name="stage1",
        )(x)
        f2 = Seq(
            tuple([partial(ConvDW, 128, 2)] + [partial(ConvDW, 128, 1)] * 5),
            name="stage2",
        )(f1)
        f3 = Seq(
            (partial(ConvDW, 256, 2), partial(ConvDW, 256, 1)), name="stage3"
        )(f2)
        return f1, f2, f3


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = _bn("bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(h)
        h = _bn("bn2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(h)
        h = _bn("bn3")(h)
        if self.downsample:
            res = Seq(
                (
                    partial(
                        nn.Conv, self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                    ),
                    partial(
                        nn.BatchNorm, use_running_average=True, momentum=0.9,
                        epsilon=1e-5,
                    ),
                ),
                name="downsample",
            )(x)
        return jax.nn.relu(h + res)


class ResNet50Backbone(nn.Module):
    """torchvision-style ResNet-50, returning layer2/3/4 features."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = _bn("bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))
        ):
            stride = 1 if stage == 0 else 2
            makers = []
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or inplanes != planes * 4)
                makers.append(partial(Bottleneck, planes, s, ds))
                inplanes = planes * 4
            x = Seq(tuple(makers), name=f"layer{stage + 1}")(x)
            feats.append(x)
        return feats[1], feats[2], feats[3]


class SSH(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        leaky = 0.1 if self.out <= 64 else 0.0
        c3 = ConvBN(self.out // 2, 3, relu=False, name="conv3X3")(x)
        c5_1 = ConvBN(self.out // 4, 3, leaky=leaky, name="conv5X5_1")(x)
        c5 = ConvBN(self.out // 4, 3, relu=False, name="conv5X5_2")(c5_1)
        c7_2 = ConvBN(self.out // 4, 3, leaky=leaky, name="conv7X7_2")(c5_1)
        c7 = ConvBN(self.out // 4, 3, relu=False, name="conv7x7_3")(c7_2)
        return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    out: int

    @nn.compact
    def __call__(self, f1, f2, f3):
        leaky = 0.1 if self.out <= 64 else 0.0
        o1 = ConvBN(self.out, 1, leaky=leaky, name="output1")(f1)
        o2 = ConvBN(self.out, 1, leaky=leaky, name="output2")(f2)
        o3 = ConvBN(self.out, 1, leaky=leaky, name="output3")(f3)
        up3 = jax.image.resize(o3, o2.shape[:1] + o2.shape[1:3] + o3.shape[3:],
                               method="nearest")
        o2 = ConvBN(self.out, 3, leaky=leaky, name="merge2")(o2 + up3)
        up2 = jax.image.resize(o2, o1.shape[:1] + o1.shape[1:3] + o2.shape[3:],
                               method="nearest")
        o1 = ConvBN(self.out, 3, leaky=leaky, name="merge1")(o1 + up2)
        return o1, o2, o3


class RetinaFaceNet(nn.Module):
    """Full detector network: (B, H, W, 3) BGR-mean-subtracted -> anchors."""

    backbone: str = "resnet50"  # 'resnet50' | 'mobilenet0.25'
    out_channel: int = 256
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        if self.backbone == "mobilenet0.25":
            f1, f2, f3 = MobileNetV1Quarter(name="body")(x)
        else:
            f1, f2, f3 = ResNet50Backbone(name="body")(x)
        f1, f2, f3 = FPN(self.out_channel, name="fpn")(f1, f2, f3)
        feats = [
            SSH(self.out_channel, name="ssh1")(f1),
            SSH(self.out_channel, name="ssh2")(f2),
            SSH(self.out_channel, name="ssh3")(f3),
        ]
        locs, confs, ldms = [], [], []
        b = x.shape[0]
        for i, f in enumerate(feats):
            loc = nn.Conv(self.num_anchors * 4, (1, 1), name=f"BboxHead_{i}")(f)
            conf = nn.Conv(self.num_anchors * 2, (1, 1), name=f"ClassHead_{i}")(f)
            ldm = nn.Conv(self.num_anchors * 10, (1, 1), name=f"LandmarkHead_{i}")(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))
            ldms.append(ldm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        ldm = jnp.concatenate(ldms, axis=1)
        return loc, conf, ldm


# ---------------------------------------------------------------------------
# anchors / decode / NMS (host side, numpy)
# ---------------------------------------------------------------------------


def prior_boxes(image_size: Tuple[int, int], cfg=CFG_RE50) -> np.ndarray:
    """(A, 4) anchors in (cx, cy, w, h) normalized coords (prior_box.py:6)."""
    h, w = image_size
    anchors = []
    for k, step in enumerate(cfg["steps"]):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i, j in product(range(fh), range(fw)):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / w
                s_ky = min_size / h
                cx = (j + 0.5) * step / w
                cy = (i + 0.5) * step / h
                anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray, variances=(0.1, 0.2)):
    """SSD box decode (box_utils.py:210)."""
    boxes = np.concatenate(
        [
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ],
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def decode_landmarks(pre: np.ndarray, priors: np.ndarray, variances=(0.1, 0.2)):
    """Landmark decode (box_utils.py:231)."""
    out = [
        priors[:, :2] + pre[:, 2 * i : 2 * i + 2] * variances[0] * priors[:, 2:]
        for i in range(5)
    ]
    return np.concatenate(out, axis=1)


def nms(dets: np.ndarray, thresh: float, top_k: Optional[int] = None) -> List[int]:
    """Greedy IoU NMS (py_cpu_nms.py:11)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    if top_k is not None:
        order = order[:top_k]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


@dataclass
class RetinaFacePredictor:
    """Batched face detection over frames.

    Matches the reference predictor settings (retina_face_predictor.py:57):
    conf_thresh 0.02, nms_thresh 0.4, nms_top_k 5000, top_k 750, and the
    caller-side score threshold (0.8 in LandmarksDetector).
    """

    variables: dict
    backbone: str = "resnet50"
    threshold: float = 0.8
    conf_thresh: float = 0.02
    nms_thresh: float = 0.4
    nms_top_k: int = 5000
    top_k: int = 750

    def __post_init__(self):
        cfg = CFG_RE50 if self.backbone == "resnet50" else CFG_MNET
        self.cfg = cfg
        self.net = RetinaFaceNet(
            backbone=self.backbone, out_channel=cfg["out_channel"]
        )
        self._fwd = jax.jit(
            lambda variables, imgs: self.net.apply(variables, imgs)
        )
        self._priors: dict = {}

    @classmethod
    def from_torch_checkpoint(cls, path: str, backbone: str = "resnet50", **kw):
        from avsr_tpu.core.checkpoint import load_torch_state_dict

        state = load_torch_state_dict(path)
        variables = retinaface_torch_to_flax(state, backbone)
        return cls(variables=variables, backbone=backbone, **kw)

    def detect_batch(self, frames_bgr: np.ndarray) -> List[np.ndarray]:
        """(B, H, W, 3) uint8 BGR frames -> per-frame (N, 15) detections
        [x1 y1 x2 y2 score lmx1 lmy1 ... lmx5 lmy5]."""
        b, h, w, _ = frames_bgr.shape
        imgs = frames_bgr.astype(np.float32) - BGR_MEAN
        loc, conf, ldm = self._fwd(self.variables, jnp.asarray(imgs))
        loc, conf, ldm = np.asarray(loc), np.asarray(conf), np.asarray(ldm)

        if (h, w) not in self._priors:
            self._priors[(h, w)] = prior_boxes((h, w), self.cfg)
        priors = self._priors[(h, w)]
        scale = np.array([w, h, w, h], np.float32)
        scale_lm = np.tile([w, h], 5).astype(np.float32)

        out = []
        for i in range(b):
            boxes = decode_boxes(loc[i], priors, self.cfg["variance"]) * scale
            scores = conf[i, :, 1]
            lms = decode_landmarks(ldm[i], priors, self.cfg["variance"]) * scale_lm
            inds = scores > self.conf_thresh
            if not inds.any():
                out.append(np.empty((0, 15), np.float32))
                continue
            boxes, scores, lms = boxes[inds], scores[inds], lms[inds]
            dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
            keep = nms(dets, self.nms_thresh, self.nms_top_k)
            dets, lms = dets[keep][: self.top_k], lms[keep][: self.top_k]
            final = np.concatenate([dets, lms], axis=1)
            out.append(final[final[:, 4] >= self.threshold])
        return out

    def __call__(self, image: np.ndarray, rgb: bool = True) -> np.ndarray:
        """Single-frame API matching the reference predictor."""
        if rgb:
            image = image[..., ::-1]
        return self.detect_batch(image[None])[0]


def retinaface_torch_to_flax(state: dict, backbone: str = "resnet50") -> dict:
    """Convert a RetinaFace torch checkpoint to the flax variable tree."""
    params: dict = {}
    stats: dict = {}

    def insert(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for key, val in state.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked" or "fc" in parts or "avg" in parts:
            continue
        path = parts[:-1]
        # head convs: ClassHead.0.conv1x1 -> ClassHead_0
        if path[0] in ("ClassHead", "BboxHead", "LandmarkHead"):
            fp = (f"{path[0]}_{path[1]}",)
        else:
            # torch Sequential indices become m<idx> child names
            fp = tuple(f"m{s}" if s.isdigit() else s for s in path)
        arr = np.asarray(val, np.float32)
        is_bn = f"{'.'.join(path)}.running_mean" in state
        if leaf == "weight":
            if is_bn:
                insert(params, fp + ("scale",), arr)
            elif arr.ndim == 4:
                insert(params, fp + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            elif arr.ndim == 2:
                insert(params, fp + ("kernel",), np.transpose(arr))
            else:
                insert(params, fp + ("scale",), arr)
        elif leaf == "bias":
            insert(params, fp + ("bias",), arr)
        elif leaf == "running_mean":
            insert(stats, fp + ("mean",), arr)
        elif leaf == "running_var":
            insert(stats, fp + ("var",), arr)
    return {"params": params, "batch_stats": stats}
