"""Device mesh and sharding utilities.

The reference scales with torchrun DDP over NCCL (script/train.py:23,
README "Multi-GPU Distributed Training") — data parallelism only. The
TPU-native equivalent: a `jax.sharding.Mesh` with named axes and
`NamedSharding` annotations; XLA inserts the gradient all-reduce over
ICI/DCN. Axes are named ('data', 'model') from day one so tensor-parallel
shardings can be added without re-plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding.

    Single-process: a plain device_put scatter. Multi-process (--multihost):
    each host holds only its shard of the global batch (shard_for_host gives
    each host distinct samples), so the global array is assembled from
    process-local data — the JAX equivalent of DDP's per-rank batches
    (reference dispatch_batches=False, script/train.py:294-296).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def param_partition_spec(path, leaf) -> P:
    """Tensor-parallel PartitionSpec for one parameter.

    Megatron-style sharding over the 'model' axis: attention q/k/v and the
    FFN up-projection shard their OUTPUT dim (head/hidden split); attention
    out-proj and the FFN down-projection shard their INPUT dim, so each pair
    needs a single all-reduce that XLA inserts automatically. Everything else
    (norms, biases, embeddings, convs) is replicated. Scanned layer stacks
    carry a leading layer axis (never sharded).
    """
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    leafname = names[-1]
    if leafname != "kernel" or leaf.ndim < 2:
        return P()
    col_split = {"q_proj", "k_proj", "v_proj", "intermediate_dense",
                 "linear_q", "linear_k", "linear_v", "w_1", "fc1"}
    row_split = {"out_proj", "output_dense", "linear_out", "w_2", "fc2"}
    owner = names[-2] if len(names) >= 2 else ""
    prefix = (None,) * (leaf.ndim - 2)
    if owner in col_split:
        return P(*prefix, None, MODEL_AXIS)
    if owner in row_split:
        return P(*prefix, MODEL_AXIS, None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree implementing DP + Megatron-style TP."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_partition_spec(path, leaf)),
        params,
    )


def shard_accum_batch(batch, mesh: Mesh):
    """Device-put microbatched arrays (accum, B, ...): shard dim 1 on data."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f"global batch {global_batch} not divisible by {n_data}")
    return global_batch // n_data
