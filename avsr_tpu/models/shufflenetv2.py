"""ShuffleNetV2 (alternate lightweight lip-frontend trunk).

Re-design of /root/reference/src/nets/backend/backbones/modules/shufflenetv2.py:
stem conv + inverted-residual stages with channel split/shuffle, channels-last.
The reference keeps it as an unused alternative to the ResNet-18 trunk; it is
provided for the same role here (drop-in trunk producing pooled features).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsr_tpu.ops.grouped_conv import GroupedConv

STAGE_REPEATS = (4, 8, 4)
STAGE_CHANNELS = {
    0.5: (24, 48, 96, 192, 1024),
    1.0: (24, 116, 232, 464, 1024),
    1.5: (24, 176, 352, 704, 1024),
    2.0: (24, 244, 488, 976, 2048),
}


def _bn(name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    benchmodel: int  # 1 = split/identity branch, 2 = downsampling two-branch

    @nn.compact
    def __call__(self, x):
        half = self.oup // 2

        def branch2(inp, name):
            h = nn.Conv(half, (1, 1), use_bias=False, name=f"{name}_pw1")(inp)
            h = jax.nn.relu(_bn(f"{name}_bn1")(h))
            # TP-safe grads (GSPMD grouped-conv bug, ops/grouped_conv.py)
            h = GroupedConv(half, (3, 3), strides=(self.stride, self.stride),
                            padding=1, feature_group_count=half,
                            use_bias=False, name=f"{name}_dw")(h)
            h = _bn(f"{name}_bn2")(h)
            h = nn.Conv(half, (1, 1), use_bias=False, name=f"{name}_pw2")(h)
            return jax.nn.relu(_bn(f"{name}_bn3")(h))

        if self.benchmodel == 1:
            c = x.shape[-1]
            x1, x2 = x[..., : c // 2], x[..., c // 2:]
            out = jnp.concatenate([x1, branch2(x2, "b2")], axis=-1)
        else:
            inp_c = x.shape[-1]
            h1 = GroupedConv(inp_c, (3, 3), strides=(self.stride, self.stride),
                             padding=1, feature_group_count=inp_c,
                             use_bias=False, name="b1_dw")(x)
            h1 = _bn("b1_bn1")(h1)
            h1 = nn.Conv(half, (1, 1), use_bias=False, name="b1_pw")(h1)
            h1 = jax.nn.relu(_bn("b1_bn2")(h1))
            out = jnp.concatenate([h1, branch2(x, "b2")], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    """(B, H, W, 3) -> pooled (B, C_last) features (classifier head omitted:
    the frontend role only consumes the pooled trunk output)."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x):
        chans = STAGE_CHANNELS[self.width_mult]
        h = nn.Conv(chans[0], (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_bn("conv1_bn")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, repeats in enumerate(STAGE_REPEATS):
            oup = chans[stage + 1]
            for i in range(repeats):
                h = InvertedResidual(
                    oup, 2 if i == 0 else 1, 2 if i == 0 else 1,
                    name=f"stage{stage + 2}_{i}",
                )(h)
        h = nn.Conv(chans[-1], (1, 1), use_bias=False, name="conv_last")(h)
        h = jax.nn.relu(_bn("conv_last_bn")(h))
        return jnp.mean(h, axis=(1, 2))
