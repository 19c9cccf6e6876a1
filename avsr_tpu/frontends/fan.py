"""FAN (2D stacked-hourglass) facial landmark detector, batched for TPU.

Re-design of the reference aligner
(/root/reference/src/ibug/face_alignment/fan/): stem + stacked hourglass
modules (depth 4, 256 features) -> 68 heatmaps; landmark decode via
peak-radius-masked soft-argmax (fan_predictor.py:127-164). The reference
traces per-frame with torch.jit; here all face crops in a batch run as one
jitted program and the heatmap decode is vectorized on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)


class ConvBlock(nn.Module):
    """FAN residual block: 3 BN-ReLU-Conv stages concatenated (fan.py:11)."""

    in_planes: int
    out_planes: int

    @nn.compact
    def __call__(self, x):
        half, quarter = self.out_planes // 2, self.out_planes // 4
        out1 = nn.Conv(half, (3, 3), padding=1, use_bias=False, name="conv1")(
            jax.nn.relu(_bn("bn1")(x))
        )
        out2 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False, name="conv2")(
            jax.nn.relu(_bn("bn2")(out1))
        )
        out3 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False, name="conv3")(
            jax.nn.relu(_bn("bn3")(out2))
        )
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.in_planes != self.out_planes:
            res = _bn("downsample_m0")(x)
            res = jax.nn.relu(res)
            res = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                          name="downsample_m2")(res)
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive hourglass (fan.py:56), depth levels named b1_d..b3_d."""

    depth: int = 4
    features: int = 256
    use_avg_pool: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.features

        def level(inp, d):
            up1 = ConvBlock(f, f, name=f"b1_{d}")(inp)
            if self.use_avg_pool:
                low = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            else:
                low = nn.max_pool(inp, (2, 2), strides=(2, 2))
            low = ConvBlock(f, f, name=f"b2_{d}")(low)
            if d > 1:
                low = level(low, d - 1)
            else:
                low = ConvBlock(f, f, name=f"b2_plus_{d}")(low)
            low = ConvBlock(f, f, name=f"b3_{d}")(low)
            up2 = jax.image.resize(
                low, low.shape[:1] + (low.shape[1] * 2, low.shape[2] * 2) + low.shape[3:],
                method="nearest",
            )
            return up1 + up2

        return level(x, self.depth)


class FAN(nn.Module):
    """Stacked-hourglass landmark network: (B, 256, 256, 3) in [0,1] -> heatmaps."""

    num_modules: int = 2
    depth: int = 4
    features: int = 256
    num_landmarks: int = 68
    use_avg_pool: bool = False
    stem_conv_kernel: int = 7
    stem_conv_stride: int = 2
    stem_pool_kernel: int = 2

    @nn.compact
    def __call__(self, x):
        k, s = self.stem_conv_kernel, self.stem_conv_stride
        x = nn.Conv(64, (k, k), strides=(s, s), padding=k // 2, name="conv1")(x)
        x = jax.nn.relu(_bn("bn1")(x))
        x = ConvBlock(64, 128, name="conv2")(x)
        if self.stem_pool_kernel > 1:
            p = self.stem_pool_kernel
            if self.use_avg_pool:
                x = nn.avg_pool(x, (p, p), strides=(p, p))
            else:
                x = nn.max_pool(x, (p, p), strides=(p, p))
        x = ConvBlock(128, 128, name="conv3")(x)
        x = ConvBlock(128, self.features, name="conv4")(x)

        previous = x
        out = None
        for i in range(self.num_modules):
            hg = HourGlass(self.depth, self.features, self.use_avg_pool,
                           name=f"m{i}")(previous)
            ll = ConvBlock(self.features, self.features, name=f"top_m_{i}")(hg)
            ll = nn.Conv(self.features, (1, 1), name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(_bn(f"bn_end{i}")(ll))
            out = nn.Conv(self.num_landmarks, (1, 1), name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                ll2 = nn.Conv(self.features, (1, 1), name=f"bl{i}")(ll)
                tmp = nn.Conv(self.features, (1, 1), name=f"al{i}")(out)
                previous = previous + ll2 + tmp
        return out


def decode_heatmaps(
    heatmaps: jax.Array, radius: float = 0.1, gamma: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """Peak-radius-masked soft-argmax decode (fan_predictor.py:127-164).

    heatmaps (B, H, W, L) -> landmarks (B, L, 2) in heatmap coords, scores (B, L).
    """
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2))  # (B, L, H, W)
    b, l, h, w = hm.shape
    scores = hm.max(axis=(2, 3))

    if radius**2 * h * w < h**2 + w**2:
        flat = hm.reshape(b, l, -1)
        m = jnp.argmax(flat, axis=-1)
        peak_y = (m // w).astype(jnp.float32)
        peak_x = (m % w).astype(jnp.float32)
        yy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
        dist = jnp.sqrt(
            (yy - peak_y[..., None, None]) ** 2 + (xx - peak_x[..., None, None]) ** 2
        )
        hm = hm * (dist <= radius * math_sqrt_hw(h, w)).astype(hm.dtype)

    hm = jnp.maximum(hm, 0.0)
    if gamma != 1.0:
        hm = hm**gamma
    m00 = jnp.maximum(hm.sum(axis=(2, 3)), jnp.finfo(hm.dtype).eps)
    xs = (hm.sum(axis=2) * (jnp.arange(w, dtype=jnp.float32) + 0.5)).sum(-1) / m00
    ys = (hm.sum(axis=3) * (jnp.arange(h, dtype=jnp.float32) + 0.5)).sum(-1) / m00
    return jnp.stack([xs, ys], axis=-1), scores


def math_sqrt_hw(h: int, w: int) -> float:
    return float(np.sqrt(h * w))


@dataclass
class FANPredictor:
    """Landmarks for face boxes in frames; network pass is batched.

    Matches the reference predictor (crop_ratio 0.55, input 256, radius 0.1).
    """

    variables: dict
    num_modules: int = 2
    use_avg_pool: bool = False
    crop_ratio: float = 0.55
    input_size: int = 256
    radius: float = 0.1
    gamma: float = 1.0

    def __post_init__(self):
        self.net = FAN(num_modules=self.num_modules, use_avg_pool=self.use_avg_pool)

        @jax.jit
        def fwd(variables, patches):
            hm = self.net.apply(variables, patches)
            return decode_heatmaps(hm, self.radius, self.gamma)

        self._fwd = fwd

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        from avsr_tpu.core.checkpoint import load_torch_state_dict

        state = load_torch_state_dict(path)
        return cls(variables=fan_torch_to_flax(state), **kw)

    def __call__(
        self, image: np.ndarray, face_boxes: np.ndarray, rgb: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-frame API matching the reference FANPredictor."""
        if face_boxes.size == 0:
            return (np.empty((0, 68, 2), np.float32), np.empty((0, 68), np.float32))
        if not rgb:
            image = image[..., ::-1]
        if face_boxes.ndim == 1:
            face_boxes = face_boxes[None]
        patches, boxes = self._crop_faces(image, face_boxes)
        lms, scores = self._fwd(self.variables, jnp.asarray(patches))
        lms, scores = np.asarray(lms), np.asarray(scores)
        hs = self.input_size // 4  # heatmaps are input/4
        for lm, (left, top, right, bottom) in zip(lms, boxes):
            lm[:, 0] = lm[:, 0] * (right - left) / hs + left
            lm[:, 1] = lm[:, 1] * (bottom - top) / hs + top
        return lms, scores

    def _crop_faces(self, image: np.ndarray, face_boxes: np.ndarray):
        import cv2

        centres = (face_boxes[:, [0, 1]] + face_boxes[:, [2, 3]]) / 2.0
        sizes = (face_boxes[:, [3, 2]] - face_boxes[:, [1, 0]]).mean(axis=1)
        enlarged = (sizes / self.crop_ratio)[:, None].repeat(2, axis=1)
        boxes = np.zeros_like(face_boxes[:, :4])
        boxes[:, :2] = np.round(centres - enlarged / 2.0)
        boxes[:, 2:] = np.round(boxes[:, :2] + enlarged) + 1
        boxes = boxes.astype(int)
        outer = np.hstack([boxes[:, :2].min(axis=0), boxes[:, 2:].max(axis=0)])
        pad = np.zeros((3, 2), int)
        pad[1][0] = max(0, -outer[0])
        pad[0][0] = max(0, -outer[1])
        pad[1][1] = max(0, outer[2] - image.shape[1])
        pad[0][1] = max(0, outer[3] - image.shape[0])
        if pad.any():
            image = np.pad(image, pad)
        patches = []
        for left, top, right, bottom in boxes:
            left += pad[1][0]
            top += pad[0][0]
            right += pad[1][0]
            bottom += pad[0][0]
            patches.append(
                cv2.resize(
                    image[top:bottom, left:right],
                    (self.input_size, self.input_size),
                )
            )
        return np.asarray(patches, np.float32) / 255.0, boxes


def fan_torch_to_flax(state: dict) -> dict:
    """Convert a FAN torch checkpoint (2dfan2/2dfan4) to flax variables."""
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
        if leaf == "num_batches_tracked":
            continue
        path = parts[:-1]
        segs: List[str] = []
        for i, s in enumerate(path):
            if s == "downsample":
                # downsample Sequential: BN at 0, Conv at 2 -> flat names
                idx = path[i + 1]
                segs.append(f"downsample_m{idx}")
                break
            segs.append(s)
        fp = tuple(segs)
        arr = np.asarray(val, np.float32)
        is_bn = f"{'.'.join(path)}.running_mean" in state
        if leaf == "weight":
            if is_bn:
                insert(params, fp + ("scale",), arr)
            elif arr.ndim == 4:
                insert(params, fp + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            else:
                insert(params, fp + ("kernel",), np.transpose(arr))
        elif leaf == "bias":
            insert(params, fp + ("bias",), arr)
        elif leaf == "running_mean":
            insert(stats, fp + ("mean",), arr)
        elif leaf == "running_var":
            insert(stats, fp + ("var",), arr)
    return {"params": params, "batch_stats": stats}
