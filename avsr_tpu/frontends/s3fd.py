"""S3FD single-shot face detector (alternate detector in the reference stack).

Re-design of /root/reference/src/ibug/face_detection/s3fd/: a VGG16 trunk
with dilated fc-conv layers, L2Norm-scaled source maps, two extra SSD stages,
and per-scale loc/conf heads with max-out background scoring on the first
scale (s3fd_net.py:28-176). The network runs batched on TPU; decode and NMS
stay on host (s3fd config: scales 4..128, min sizes 16..512, variance .1/.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avsr_tpu.frontends.retinaface import decode_boxes, nms

RGB_MEAN = np.array([123.0, 117.0, 104.0], np.float32)

PRIOR_MIN_SIZES = (16, 32, 64, 128, 256, 512)
PRIOR_STEPS = (4, 8, 16, 32, 64, 128)
VARIANCE = (0.1, 0.2)

# VGG conv channel plan up to the dilated fc layers; indices follow the torch
# ModuleList so checkpoint keys (vgg.<idx>) map directly.
_VGG_PLAN = [
    (0, 64), (2, 64), ("pool", 2), (5, 128), (7, 128), ("pool", 2),
    (10, 256), (12, 256), (14, 256), ("pool_ceil", 2),
    (17, 512), (19, 512), (21, 512), ("pool", 2),
    (24, 512), (26, 512), (28, 512), ("pool", 2),
]


class L2Norm(nn.Module):
    channels: int
    scale: float

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", lambda k, s: jnp.full(s, self.scale, jnp.float32),
            (self.channels,),
        )
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)) + 1e-10
        return (x / norm) * w


class S3FDNet(nn.Module):
    """(B, H, W, 3) mean-subtracted RGB -> (loc (B,A,4), conf (B,A,2))."""

    @nn.compact
    def __call__(self, x):
        sources = []
        idx_to_source = {14: ("L2Norm3_3", 256, 10.0), 21: ("L2Norm4_3", 512, 8.0),
                         28: ("L2Norm5_3", 512, 5.0)}
        for item, arg in _VGG_PLAN:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            if item == "pool_ceil":
                h, w = x.shape[1], x.shape[2]
                pad_h, pad_w = h % 2, w % 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2),
                                padding=((0, pad_h), (0, pad_w)))
                continue
            x = jax.nn.relu(nn.Conv(arg, (3, 3), padding=1, name=f"vgg_{item}")(x))
            if item in idx_to_source:
                name, ch, sc = idx_to_source[item]
                sources.append(L2Norm(ch, sc, name=name)(x))
        # dilated fc6/fc7 (torch ModuleList indices 31/33)
        x = jax.nn.relu(
            nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6), name="vgg_31")(x)
        )
        x = jax.nn.relu(nn.Conv(1024, (1, 1), name="vgg_33")(x))
        sources.append(x)
        # extras
        x = jax.nn.relu(nn.Conv(256, (1, 1), name="extras_0")(x))
        x = jax.nn.relu(nn.Conv(512, (3, 3), strides=(2, 2), padding=1, name="extras_1")(x))
        sources.append(x)
        x = jax.nn.relu(nn.Conv(128, (1, 1), name="extras_2")(x))
        x = jax.nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), padding=1, name="extras_3")(x))
        sources.append(x)

        b = sources[0].shape[0]
        locs, confs, fmaps = [], [], []
        for i, s in enumerate(sources):
            loc = nn.Conv(4, (3, 3), padding=1, name=f"loc_{i}")(s)
            n_conf = 4 if i == 0 else 2
            conf = nn.Conv(n_conf, (3, 3), padding=1, name=f"conf_{i}")(s)
            if i == 0:
                # max-out background label (s3fd_net.py:148-149)
                max_bg = jnp.max(conf[..., 0:3], axis=-1, keepdims=True)
                conf = jnp.concatenate([max_bg, conf[..., 3:]], axis=-1)
            fmaps.append((s.shape[1], s.shape[2]))
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        return loc, conf, tuple(fmaps)


def s3fd_priors(image_size: Tuple[int, int], feature_maps) -> np.ndarray:
    """(A, 4) anchors (s3fd/utils.py:174-205)."""
    imh, imw = image_size
    out = []
    for k, (fh, fw) in enumerate(feature_maps):
        for i, j in product(range(fh), range(fw)):
            f_kw = imw / PRIOR_STEPS[k]
            f_kh = imh / PRIOR_STEPS[k]
            out.append([
                (j + 0.5) / f_kw,
                (i + 0.5) / f_kh,
                PRIOR_MIN_SIZES[k] / imw,
                PRIOR_MIN_SIZES[k] / imh,
            ])
    return np.asarray(out, np.float32)


@dataclass
class S3FDPredictor:
    """Batched S3FD detection (threshold 0.8 default like the reference)."""

    variables: dict
    threshold: float = 0.8
    conf_thresh: float = 0.05
    nms_thresh: float = 0.3
    nms_top_k: int = 5000
    top_k: int = 750

    def __post_init__(self):
        self.net = S3FDNet()
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x))

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        from avsr_tpu.core.checkpoint import load_torch_state_dict

        return cls(variables=s3fd_torch_to_flax(load_torch_state_dict(path)), **kw)

    def detect_batch(self, frames_rgb: np.ndarray) -> List[np.ndarray]:
        b, h, w, _ = frames_rgb.shape
        imgs = frames_rgb.astype(np.float32) - RGB_MEAN
        loc, conf, fmaps = self._fwd(self.variables, jnp.asarray(imgs))
        loc, conf = np.asarray(loc), np.asarray(conf)
        priors = s3fd_priors((h, w), fmaps)
        scale = np.array([w, h, w, h], np.float32)
        out = []
        for i in range(b):
            boxes = decode_boxes(loc[i], priors, VARIANCE)
            scores = conf[i, :, 1]
            keep = scores > self.conf_thresh
            if not keep.any():
                out.append(np.empty((0, 5), np.float32))
                continue
            dets = np.hstack([boxes[keep] * scale, scores[keep, None]]).astype(
                np.float32
            )
            kept = nms(dets, self.nms_thresh, self.nms_top_k)
            dets = dets[kept][: self.top_k]
            out.append(dets[dets[:, 4] >= self.threshold])
        return out

    def __call__(self, image: np.ndarray, rgb: bool = True) -> np.ndarray:
        if not rgb:
            image = image[..., ::-1]
        return self.detect_batch(image[None])[0]


def s3fd_torch_to_flax(state: dict) -> dict:
    """Convert the reference S3FD checkpoint to flax variables."""
    params: dict = {}
    for key, val in state.items():
        arr = np.asarray(val, np.float32)
        parts = key.split(".")
        if parts[0] in ("vgg", "extras", "loc", "conf"):
            name = f"{parts[0]}_{parts[1]}"
            leaf = "kernel" if parts[2] == "weight" else "bias"
            arr = np.transpose(arr, (2, 3, 1, 0)) if leaf == "kernel" else arr
            params.setdefault(name, {})[leaf] = arr
        elif parts[0].startswith("L2Norm"):
            params.setdefault(parts[0], {})["weight"] = arr
    return {"params": params}
