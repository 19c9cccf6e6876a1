"""Grouped 1D/2D convolutions with XLA-SPMD-safe kernel gradients.

jax 0.9.0 / XLA GSPMD bug (regression-tested in tests/test_grouped_conv.py):
the KERNEL gradient of a conv with ``feature_group_count >= 2``, traced under
a jit whose mesh carries a second ("model") axis — even with the conv weights
fully replicated and the batch sharded only over "data" — comes back
multiplied by the size of that model axis. Forward values and the data
(input) gradient are unaffected; ``feature_group_count == 1`` convs and
pure data-parallel meshes are unaffected. First observed as a 2x
``pos_conv`` gradient in the cross-host DPxTP train-step test
(tests/distributed_worker.py), reproduced minimally with a bare
``lax.conv_general_dilated``.

Workaround: wrap the conv in ``jax.shard_map`` (batch sharded on the data
axis, weights replicated) so each device runs the plain grouped conv on its
batch shard and the partitioner never touches the grouped-conv gradient
rules. shard_map's replication-checked transpose inserts the psum over the
data axis only, which is the correct kernel-gradient reduction. (A
``batch_group_count`` reformulation was tried first: correct at toy shapes
but CHECK-crashes ``spmd convolution_handler.cc`` at model shapes.)

Scoping: the workaround needs the mesh and must apply ONLY to traces that
run under a TP mesh — a later serving/decode jit over a different mesh must
not capture a shard_map over the training mesh. ``tp_safe_mesh`` is
therefore a context manager that the jitted train-step BODY enters, so it is
active exactly while that step is being traced (flax modules execute at
trace time) and inactive for every other trace, including retraces of other
functions between train steps.

Affected call sites routed through here: AVHubert's conv positional
embedding (models/avhubert.py, torch weight-norm layout, reference
src/nets/backend/backbones/avhubert.py pos_conv), the Conformer depthwise
conv module (models/conformer.py, reference convolution.py:164), and
ShuffleNetV2's depthwise 3x3s (models/shufflenetv2.py). The retinaface
frontend's grouped convs are inference-only and keep plain flax ``nn.Conv``.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
from jax.sharding import PartitionSpec as P

_TP_MESH = None


@contextmanager
def tp_safe_mesh(mesh):
    """Route grouped convs through shard_map over `mesh` while active.

    Entered by the jitted train-step body (trainer.make_parallel_train_step)
    when the mesh has a model axis, so the workaround binds to exactly the
    traces the GSPMD bug can poison.
    """
    global _TP_MESH
    prev = _TP_MESH
    _TP_MESH = mesh
    try:
        yield
    finally:
        _TP_MESH = prev


def _active_mesh():
    from avsr_tpu.core.mesh import MODEL_AXIS

    m = _TP_MESH
    if m is not None and m.shape.get(MODEL_AXIS, 1) > 1:
        return m
    return None


def _norm_padding(padding, nspatial: int):
    if isinstance(padding, int):
        return [(padding, padding)] * nspatial
    return list(padding)


def grouped_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    groups: int,
    strides: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[Tuple[int, int]]] = 0,
    precision=None,
) -> jax.Array:
    """Grouped conv over NWC (1D) or NHWC (2D) ``x``; kernel (K..., Cg, O).

    Kernel layout is the flax/lax grouped layout: spatial dims, then
    in-channels-per-group Cg = C // groups, then ALL output features O in
    group-major order (output block g consumes input block g).
    """
    nspatial = x.ndim - 2
    dn = ("NWC", "WIO", "NWC") if nspatial == 1 else ("NHWC", "HWIO", "NHWC")
    if isinstance(strides, int):
        strides = (strides,) * nspatial
    padding = _norm_padding(padding, nspatial)

    def conv(x, kernel):
        return jax.lax.conv_general_dilated(
            x, kernel, strides, padding,
            dimension_numbers=dn, feature_group_count=groups,
            precision=precision,
        )

    mesh = _active_mesh()
    if groups == 1 or mesh is None:
        return conv(x, kernel)
    from avsr_tpu.core.mesh import DATA_AXIS

    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.shard_map(
        conv, mesh=mesh, in_specs=(spec, P()), out_specs=spec
    )(x, kernel)


class GroupedConv(nn.Module):
    """Drop-in for ``nn.Conv(..., feature_group_count=g)`` at the trained
    grouped-conv sites: identical param names ("kernel"/"bias"), shapes,
    and initializers, so checkpoint import and the tensor-parallel
    partition rules (core/mesh.param_partition_spec) are unchanged — only
    the conv primitive is routed through :func:`grouped_conv`.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[Tuple[int, int]]] = 0
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cg = x.shape[-1] // self.feature_group_count
        kshape = tuple(self.kernel_size) + (cg, self.features)
        # params live in f32 like nn.Conv's param_dtype default; compute
        # follows the activation dtype
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        y = grouped_conv(
            x, kernel.astype(x.dtype),
            groups=self.feature_group_count,
            strides=self.strides,
            padding=self.padding,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y
