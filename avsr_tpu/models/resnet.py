"""Lip-reading video frontend: 3D conv stem + per-frame ResNet-18.

TPU-native re-design of the reference ResEncoder
(/root/reference/src/nets/backend/backbones/resnet.py:126): channels-last
NDHWC/NHWC layouts so XLA tiles convs straight onto the MXU, and the
per-frame trunk runs as one big (B*T) batch instead of a Python loop.

Structure (matching the checkpoint):
  frontend3D: Conv3D(1->64, k=(5,7,7), s=(1,2,2), p=(2,3,3), no bias)
              + BN + PReLU + MaxPool3D(k=(1,3,3), s=(1,2,2), p=(0,1,1))
  trunk: ResNet-18 (BasicBlock [2,2,2,2], PReLU) -> global avg pool -> 512
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) semantics)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (self.channels,)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def _relu_factory(relu_type: str, channels: int) -> Callable[[jax.Array], jax.Array]:
    if relu_type == "prelu":
        return PReLU(channels=channels)
    if relu_type == "relu":
        return jax.nn.relu
    if relu_type == "swish":
        return jax.nn.silu
    raise ValueError(f"unknown relu_type {relu_type!r}")


def _batch_norm(train: bool, name: str) -> nn.BatchNorm:
    # torch defaults: eps=1e-5, momentum=0.1 (flax momentum = 1 - 0.1)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class BasicBlock(nn.Module):
    """ResNet-18 basic block, stride in the first conv, 1x1-conv downsample."""

    planes: int
    stride: int = 1
    relu_type: str = "prelu"
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        out = _batch_norm(train, "bn1")(out)
        out = _relu_factory(self.relu_type, self.planes)(out) if self.relu_type != "prelu" else PReLU(self.planes, name="relu1")(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = _batch_norm(train, "bn2")(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = _batch_norm(train, "downsample_bn")(residual)
        out = out + residual
        if self.relu_type == "prelu":
            out = PReLU(self.planes, name="relu2")(out)
        else:
            out = _relu_factory(self.relu_type, self.planes)(out)
        return out


class ResNetTrunk(nn.Module):
    """ResNet-18 over (N, H, W, C) frames -> (N, 512) global-avg-pooled."""

    layers: Sequence[int] = (2, 2, 2, 2)
    relu_type: str = "prelu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inplanes = x.shape[-1]
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(
                    planes=planes,
                    stride=s,
                    relu_type=self.relu_type,
                    downsample=need_ds,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
                inplanes = planes
        return jnp.mean(x, axis=(1, 2))


class StemConv3D(nn.Module):
    """Conv3D(1->64, k=(5,7,7), s=(1,2,2), p=(2,3,3)) as a 2D conv.

    XLA lowers the direct 3D conv with C_in=1 pathologically on TPU: the
    (B,T,44,44,64) output gets a {4,0,3,2,1} layout whose (batch, channel)
    tile pads 2x, and the conv itself runs at ~1% MXU utilization (88 ms at
    B=8, and OOM at B=32 from an 11 GB padded temp). Folding the 5 temporal
    taps into input channels is exact (temporal stride is 1) and turns the
    stem into a 2D conv with C_in=5 over (B*T) frames: 5x faster, standard
    NHWC layout, no padding blowup. The parameter keeps the torch-layout
    (kt, kh, kw, 1, C_out) shape so checkpoint import/export is unchanged.
    """

    features: int = 64
    kt: int = 5  # temporal taps (pad kt//2 each side)
    kh: int = 7
    kw: int = 7

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:  # (B, T, H, W, 1)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kt, self.kh, self.kw, 1, self.features),
        )
        b, t, h, w, _ = video.shape
        x = video[..., 0]
        xt = jnp.pad(x, ((0, 0), (self.kt // 2, self.kt // 2), (0, 0), (0, 0)))
        taps = [
            jax.lax.dynamic_slice_in_dim(xt, dt, t, axis=1)
            for dt in range(self.kt)
        ]
        xt = jnp.stack(taps, axis=-1).reshape(b * t, h, w, self.kt)
        k2 = jnp.transpose(kernel[:, :, :, 0, :], (1, 2, 0, 3))  # (kh,kw,kt,CO)
        out = jax.lax.conv_general_dilated(
            xt, k2.astype(xt.dtype), window_strides=(2, 2),
            padding=((self.kh // 2, self.kh // 2), (self.kw // 2, self.kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(b, t, h // 2, w // 2, self.features)


class _PReLUAlpha(nn.Module):
    """Declares the PReLU weight without applying it (fused-stem path).

    Same variable (alpha) under the same module name as PReLU, so the
    checkpoint tree is identical whichever path builds the model.
    """

    channels: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
            (self.channels,),
        )


class _FusedStemTail(nn.Module):
    """BN + PReLU + 3x3/s2 max pool via one fused op (ops/pallas/stem_fuse).

    Declares exactly the variables flax BatchNorm would under this module
    name (params scale/bias, batch_stats mean/var with the same momentum
    update), so checkpoints are interchangeable with the unfused path.
    """

    features: int
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, alpha: jax.Array, train: bool):
        from avsr_tpu.ops.pallas import stem_fuse

        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        # Round-5 device measurements (BASELINE.md "fused stem tail"): the
        # kernel LOSES on both paths at flagship shapes, so it is opt-in.
        # - serving: ~105 ms/batch slower than XLA's fused scale-shift+
        #   PReLU+pool at B=32*T=377 (encoder 309 vs 205 ms/batch);
        # - train: HBM OOM at B=24*T=384 — Mosaic forces row-major layouts
        #   on the kernel's operands, and bf16[*,22,22,64] in {3,2,1,0}
        #   pads the 64-lane minor dim to 128 (2.2x per buffer), which
        #   propagates into the trunk's layer1 activations.
        # The default path is lean_reference (f32 stats, activation-dtype
        # compute) — the f32 `reference` twin OOMs at train shapes too.
        on_env = "AVSR_FUSED_STEM" if train else "AVSR_FUSED_STEM_EVAL"
        use_kernel = (
            jax.default_backend() != "cpu"
            and os.environ.get(on_env, "0") == "1"
        )
        fn = stem_fuse.bn_prelu_pool if use_kernel else stem_fuse.lean_reference
        if train:
            out, bm, bv = fn(x, scale, bias, alpha, eps=self.eps, train=True)
            if not self.is_initializing():
                bm = jax.lax.stop_gradient(bm)
                bv = jax.lax.stop_gradient(bv)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * bm
                ra_var.value = m * ra_var.value + (1.0 - m) * bv
            return out
        return fn(
            x, scale, bias, alpha, eps=self.eps, train=False,
            running_mean=ra_mean.value, running_var=ra_var.value,
        )


class ResEncoder(nn.Module):
    """Video frontend: (B, T, H, W, 1) uint/float frames -> (B, T, 512)."""

    relu_type: str = "prelu"

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        b, t = video.shape[:2]
        x = StemConv3D(name="frontend_conv")(video)
        if self.relu_type == "prelu":
            # fold time into batch first (pure reshape; pooling never mixes
            # time) so BN + PReLU + pool run as ONE fused op over frames
            # instead of four HBM passes + a select-and-scatter backward —
            # the profiled stem tail cost ~56 ms/step of an ~21 ms floor at
            # B=24/T=384 (see ops/pallas/stem_fuse.py)
            h, w, c = x.shape[2:]
            alpha = _PReLUAlpha(64, name="frontend_prelu")()
            x = _FusedStemTail(64, name="frontend_bn")(
                x.reshape(b * t, h, w, c), alpha, train
            )
        else:
            x = _batch_norm(train, "frontend_bn")(x)
            x = _relu_factory(self.relu_type, 64)(x)
            # MaxPool3D k=(1,3,3) s=(1,2,2) p=(0,1,1): time dim untouched.
            x = nn.max_pool(
                x,
                window_shape=(1, 3, 3),
                strides=(1, 2, 2),
                padding=((0, 0), (1, 1), (1, 1)),
            )
            h, w, c = x.shape[2:]
            x = x.reshape(b * t, h, w, c)
        feats = ResNetTrunk(relu_type=self.relu_type, name="trunk")(x, train=train)
        return feats.reshape(b, t, -1)
