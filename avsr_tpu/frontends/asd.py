"""Active-speaker detection (TalkNet-style) model for ASD-score generation.

Re-design of /root/reference/src/talking_detector/: a two-branch
(3/5-kernel) 3D-CNN visual encoder over 112x112 face crops, a matching
2D-CNN audio encoder over 13-bin MFCC-like maps, sum fusion, and a
forward+backward GRU (Model.py:7, Encoder.py:83,129, Classifier.py:6),
with BCE scoring heads (loss.py:5,29). Channels-last, jitted, batched.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# reference BN hyperparams (Encoder.py: momentum=0.01, eps=0.001; flax
# momentum is the running-stat decay = 1 - torch momentum)
def _bn_kw(train: bool) -> dict:
    return dict(use_running_average=not train, momentum=0.99, epsilon=1e-3)


BN_KW = _bn_kw(train=False)

VIDEO_MEAN = 0.4161
VIDEO_STD = 0.1688


class VisualBlock(nn.Module):
    """Two-path (3- and 5-kernel) factored spatio-temporal conv block."""

    out: int
    is_down: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, T, H, W, C)
        stride = (1, 2, 2) if self.is_down else (1, 1, 1)
        bn = _bn_kw(train)

        def branch(ks, kt, sname, tname):
            h = nn.Conv(self.out, (1, ks, ks), strides=stride,
                        padding=((0, 0), (ks // 2, ks // 2), (ks // 2, ks // 2)),
                        use_bias=False, name=sname)(x)
            h = jax.nn.relu(nn.BatchNorm(**bn, name=f"bn_{sname}")(h))
            h = nn.Conv(self.out, (kt, 1, 1),
                        padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
                        use_bias=False, name=tname)(h)
            return jax.nn.relu(nn.BatchNorm(**bn, name=f"bn_{tname}")(h))

        h = branch(3, 3, "s_3", "t_3") + branch(5, 5, "s_5", "t_5")
        h = nn.Conv(self.out, (1, 1, 1), use_bias=False, name="last")(h)
        return jax.nn.relu(nn.BatchNorm(**bn, name="bn_last")(h))


class AudioBlock(nn.Module):
    """Two-path factored freq/time conv block over (B, T, F, C) MFCC maps."""

    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = _bn_kw(train)

        def branch(k, mname, tname):
            h = nn.Conv(self.out, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                        use_bias=False, name=mname)(x)
            h = jax.nn.relu(nn.BatchNorm(**bn, name=f"bn_{mname}")(h))
            h = nn.Conv(self.out, (1, k), padding=((0, 0), (k // 2, k // 2)),
                        use_bias=False, name=tname)(h)
            return jax.nn.relu(nn.BatchNorm(**bn, name=f"bn_{tname}")(h))

        h = branch(3, "m_3", "t_3") + branch(5, "m_5", "t_5")
        h = nn.Conv(self.out, (1, 1), use_bias=False, name="last")(h)
        return jax.nn.relu(nn.BatchNorm(**bn, name="bn_last")(h))


class VisualEncoder(nn.Module):
    """(B, T, 112, 112, 1) face crops -> (B, T, 128)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VisualBlock(32, is_down=True, name="block1")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = VisualBlock(64, name="block2")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = VisualBlock(128, name="block3")(x, train)
        return jnp.max(x, axis=(2, 3))  # adaptive max pool over space


class AudioEncoder(nn.Module):
    """(B, F=13, T4, 1) MFCC map -> (B, T4/4, 128)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = AudioBlock(32, name="block1")(x, train)
        x = nn.max_pool(x, (1, 3), strides=(1, 2), padding=((0, 0), (1, 1)))
        x = AudioBlock(64, name="block2")(x, train)
        x = nn.max_pool(x, (1, 3), strides=(1, 2), padding=((0, 0), (1, 1)))
        x = AudioBlock(128, name="block3")(x, train)
        x = jnp.mean(x, axis=1)  # mean over frequency
        return x  # (B, T', 128)


class BGRU(nn.Module):
    """Forward GRU -> GELU -> backward GRU -> GELU (Classifier.py:6)."""

    channel: int = 128

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        fwd = nn.RNN(nn.GRUCell(self.channel, name="gru_forward"))
        bwd = nn.RNN(nn.GRUCell(self.channel, name="gru_backward"))
        x = jax.nn.gelu(fwd(x), approximate=False)
        x = jnp.flip(bwd(jnp.flip(x, axis=1)), axis=1)
        return jax.nn.gelu(x, approximate=False)


class ASDModel(nn.Module):
    """Full ASD network with the lossAV/lossV scoring heads.

    Submodules are declared in setup() (not @nn.compact) so both the
    inference path (__call__, lossAV scores) and the training path
    (train_logits, both heads + batch-stat updates) share one parameter
    tree; attribute names match the reference state-dict module names.
    """

    def setup(self):
        self.visualEncoder = VisualEncoder()
        self.audioEncoder = AudioEncoder()
        self.GRU = BGRU(128)
        self.lossAV_FC = nn.Dense(2)
        self.lossV_FC = nn.Dense(2)

    def _embeds(self, audio_mfcc, visual_frames, train: bool = False):
        """Shared frontends+backend: returns (av_embed, v_embed), each
        (B, T, 128) — the reference's forward_audio_visual_backend /
        forward_visual_backend outputs (Model.py:27-35)."""
        v = (visual_frames[..., None] / 255.0 - VIDEO_MEAN) / VIDEO_STD
        v_embed = self.visualEncoder(v, train)
        a = jnp.transpose(audio_mfcc, (0, 2, 1))[..., None]  # (B, 13, T4, 1)
        a_embed = self.audioEncoder(a, train)
        # align audio (100 Hz pooled 4x -> 25 Hz) with video frames
        t = v_embed.shape[1]
        a_embed = a_embed[:, :t]
        av = self.GRU(a_embed + v_embed)
        return av, v_embed

    def __call__(self, audio_mfcc, visual_frames):
        """audio_mfcc (B, T4, 13) raw MFCC frames at 100 Hz; visual_frames
        (B, T, 112, 112) uint8-scale grayscale. Returns per-frame speaking
        scores (B, T) — the lossAV predScore (loss.py:15-18)."""
        av, _ = self._embeds(audio_mfcc, visual_frames)
        return self.lossAV_FC(av)[..., 1]

    def train_logits(self, audio_mfcc, visual_frames, train: bool = True):
        """Training forward: both heads' logits — lossAV on the fused GRU
        output, lossV on the visual embedding (ASD.py:29-37, loss.py:5,29).
        Returns (logits_av, logits_v), each (B, T, 2)."""
        av, v_embed = self._embeds(audio_mfcc, visual_frames, train)
        return self.lossAV_FC(av), self.lossV_FC(v_embed)


def asd_torch_to_flax(state: dict) -> dict:
    """Convert a talking_detector torch checkpoint to flax variables.

    Accepts the ASD wrapper state dict (keys 'model.*' + 'lossAV.*')."""
    params: dict = {}
    stats: dict = {}

    def insert(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for key, val in state.items():
        arr = np.asarray(val, np.float32)
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if parts[0] in ("lossAV", "lossV"):
            head = f"{parts[0]}_FC"
            if parts[-1] == "weight":
                insert(params, (head, "kernel"), arr.T)
            else:
                insert(params, (head, "bias"), arr)
            continue
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "GRU":
            # torch GRU gates order [r, z, n]; flax GRUCell params:
            # ir/iz/in (input) and hr/hz/hn (hidden)
            gru, _ = parts[0], parts[1]
            which = parts[1]  # gru_forward / gru_backward
            c = arr.shape[-1] if arr.ndim == 1 else arr.shape[1]
            h = arr.shape[0] // 3
            r, z, n = arr[:h], arr[h : 2 * h], arr[2 * h :]
            kind = parts[2]
            if kind == "weight_ih_l0":
                for gname, g in (("ir", r), ("iz", z), ("in", n)):
                    insert(params, ("GRU", which, gname, "kernel"), g.T)
            elif kind == "weight_hh_l0":
                for gname, g in (("hr", r), ("hz", z), ("hn", n)):
                    insert(params, ("GRU", which, gname, "kernel"), g.T)
            elif kind == "bias_ih_l0":
                for gname, g in (("ir", r), ("iz", z), ("in", n)):
                    insert(params, ("GRU", which, gname, "bias"), g)
            elif kind == "bias_hh_l0":
                # flax GRUCell keeps only the hn bias on the hidden side
                insert(params, ("GRU", which, "hn", "bias"), n)
                # hr/hz hidden biases must be folded into input biases
                for gname, g in (("ir", r), ("iz", z)):
                    node = params
                    for p in ("GRU", which, gname):
                        node = node.setdefault(p, {})
                    node["bias"] = node.get("bias", 0) + g
            continue
        # conv/bn leaves; path segments map 1:1
        fp = tuple(parts[:-1])
        is_bn = f"{'.'.join(parts[:-1])}.running_mean" in state or f"model.{'.'.join(parts[:-1])}.running_mean" in state
        if leaf == "weight":
            if is_bn:
                insert(params, fp + ("scale",), arr)
            elif arr.ndim == 5:  # conv3d (O,I,kt,kh,kw)
                insert(params, fp + ("kernel",), np.transpose(arr, (2, 3, 4, 1, 0)))
            elif arr.ndim == 4:  # conv2d
                insert(params, fp + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            else:
                insert(params, fp + ("kernel",), arr.T)
        elif leaf == "bias":
            insert(params, fp + ("bias",), arr)
        elif leaf == "running_mean":
            insert(stats, fp + ("mean",), arr)
        elif leaf == "running_var":
            insert(stats, fp + ("var",), arr)
    return {"params": params, "batch_stats": stats}
