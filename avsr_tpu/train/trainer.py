"""Training: optimizer, train/eval steps, data-parallel sharding, checkpoints.

Optimization recipe mirrors the reference run configuration
(/root/reference/script/train.py:181-182,272-285 via HF Trainer defaults):
AdamW lr 1e-4, linear warmup 4000 steps then linear decay to max_steps,
weight decay 0.005 (excluding biases/LayerNorm), grad-norm clip 1.0,
gradient accumulation, loss = 0.1*ctc + 0.9*label-smoothed CE.

TPU-native execution: one jitted train step over a `Mesh(('data','model'))`
with batch sharded on 'data' and parameters replicated; XLA emits the
gradient all-reduce over ICI (SURVEY §2.6/§5.8). Gradient accumulation runs
as a lax.scan over micro-batches inside the same XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from avsr_tpu.core.config import AVHubertAVSRConfig
from avsr_tpu.core.mesh import DATA_AXIS, make_mesh
from avsr_tpu.models.e2e import AVSRModel


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 4000
    max_steps: int = 400_000
    weight_decay: float = 0.005
    max_grad_norm: float = 1.0
    grad_accum: int = 1
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # mixed precision: forward/backward in this dtype with fp32 master
    # weights and fp32 optimizer state (the reference trains fp16 AMP;
    # bfloat16 is the TPU equivalent and needs no loss scaling)
    compute_dtype: str = "float32"
    # PRNG impl for the in-step dropout/modality keys: 'rbg' lowers mask
    # generation to the hardware RngBitGenerator (threefry is VPU-bound on
    # TPU — measured ~40x slower per mask); 'threefry' keeps the JAX
    # default for bit-level reproducibility across backends
    rng_impl: str = "rbg"


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """HF Trainer 'linear' schedule: warmup then linear decay to 0."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
            optax.linear_schedule(
                cfg.learning_rate, 0.0, cfg.max_steps - cfg.warmup_steps
            ),
        ],
        [cfg.warmup_steps],
    )


def _decay_mask(params) -> Any:
    """HF Trainer excludes biases and LayerNorm weights from weight decay."""

    def keep(path, leaf) -> bool:
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        if "bias" in names or "alpha" in names:
            return False
        # LayerNorm/BatchNorm scales are 1-D 'scale' leaves
        last = getattr(path[-1], "key", "")
        if last == "scale":
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask,
        ),
    )


def init_state(
    model_cfg: AVHubertAVSRConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    example_batch: Dict[str, jax.Array],
    variables: Optional[Dict[str, Any]] = None,
    model: Any = None,
) -> Tuple[AVSRModel, TrainState]:
    """Initialize (or adopt pretrained) variables and optimizer state.

    `model` overrides the default AVSRModel — the pretraining path passes an
    AVHubertPretrainModel, recognized by its 'targets' batch field."""
    model = model if model is not None else AVSRModel(model_cfg)
    if variables is None:
        # jit the whole init: one XLA program instead of per-param kernels
        # (essential over the high-latency TPU tunnel)
        if "targets" in example_batch:
            t = example_batch["videos"].shape[1]
            valid = (
                jnp.arange(t)[None, :]
                < example_batch["video_lengths"][:, None]
            )
            variables = jax.jit(
                lambda k: model.init(
                    {"params": k},
                    example_batch["audios"],
                    example_batch["videos"],
                    example_batch["audio_mask"],
                    example_batch["video_src_index"],
                    example_batch["targets"],
                    valid,
                    train=False,
                )
            )(rng)
        else:
            variables = jax.jit(
                lambda k: model.init(
                    {"params": k},
                    example_batch["videos"],
                    example_batch["audios"],
                    example_batch["labels"],
                    example_batch["video_lengths"],
                    example_batch["label_lengths"],
                )
            )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(params)
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def loss_fn(model, params, batch_stats, batch, rngs, train: bool = True,
            compute_dtype: str = "float32"):
    batch = dict(batch)
    if batch["videos"].dtype == jnp.uint8:
        # crops travel host->device as uint8 (VideoTransform(device_norm=True)):
        # 4x less transfer and no host-side float normalize on the data plane;
        # apply /255 + normalize here (same constants as the eval engine)
        from avsr_tpu.data.transforms import VIDEO_MEAN, VIDEO_STD

        v = batch["videos"].astype(jnp.float32) / 255.0
        batch["videos"] = (v - VIDEO_MEAN) / VIDEO_STD
    if compute_dtype != "float32":
        dt = jnp.dtype(compute_dtype)
        params = _cast_floats(params, dt)
        batch_stats = _cast_floats(batch_stats, dt)
        for key in ("videos", "audios"):
            batch[key] = batch[key].astype(dt)
    variables = {"params": params, "batch_stats": batch_stats}
    if "targets" in batch:
        # masked-prediction pretraining (train/pretrain.AVHubertPretrainModel)
        t = batch["videos"].shape[1]
        valid = jnp.arange(t)[None, :] < batch["video_lengths"][:, None]
        (loss, metrics), mutated = model.apply(
            variables,
            batch["audios"],
            batch["videos"],
            batch["audio_mask"],
            batch["video_src_index"],
            batch["targets"],
            valid,
            train=train,
            rngs=rngs,
            mutable=["batch_stats"] if train else [],
        )
        metrics = {k: v.astype(jnp.float32) for k, v in metrics.items()}
        new_stats = (
            mutated.get("batch_stats", batch_stats) if train else batch_stats
        )
        if train and compute_dtype != "float32":
            new_stats = _cast_floats(new_stats, jnp.float32)
        return loss, (metrics, new_stats)
    out, mutated = model.apply(
        variables,
        batch["videos"],
        batch["audios"],
        batch["labels"],
        batch["video_lengths"],
        batch["label_lengths"],
        train=train,
        rngs=rngs,
        mutable=["batch_stats"] if train else [],
    )
    metrics = {
        "loss": out.loss,
        "loss_ctc": out.loss_ctc,
        "loss_att": out.loss_att,
        "acc": out.acc,
    }
    new_stats = mutated.get("batch_stats", batch_stats) if train else batch_stats
    if train and compute_dtype != "float32":
        # keep running statistics in fp32 across steps
        new_stats = _cast_floats(new_stats, jnp.float32)
    return out.loss, (metrics, new_stats)


def _as_impl_key(key, impl: str):
    """Re-derive `key` under a PRNG impl (deterministic in the input key)."""
    kd = key
    if jax.dtypes.issubdtype(kd.dtype, jax.dtypes.prng_key):
        if jax.random.key_impl(kd) == jax.random.key_impl(
            jax.random.key(0, impl=impl)
        ):
            return kd
        kd = jax.random.key_data(kd)
    kd = kd.reshape(-1).astype(jnp.uint32)
    words = jnp.concatenate([kd, kd + jnp.uint32(0x9E3779B9)])
    n = jax.random.key_data(jax.random.key(0, impl=impl)).shape[-1]
    return jax.random.wrap_key_data(words[:n], impl=impl)


def train_step(model, tx, state: TrainState, batch, rng,
               compute_dtype: str = "float32", rng_impl: str = "rbg"):
    """One optimizer update; batch leading dim may include accum microbatches.

    batch tensors: (accum, B, ...) when grad_accum > 1 else (B, ...).
    """
    accum = batch["videos"].ndim > 5  # (A, B, T, H, W, C)

    def grads_of(p, stats, mb, key):
        key = _as_impl_key(key, rng_impl)
        rngs = {"dropout": key, "modality": jax.random.fold_in(key, 1)}
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            lambda pp: loss_fn(model, pp, stats, mb, rngs,
                               compute_dtype=compute_dtype)
        , has_aux=True)(p)
        return grads, metrics, new_stats

    if not accum:
        grads, metrics, new_stats = grads_of(
            state.params, state.batch_stats, batch, rng
        )
    else:
        n = batch["videos"].shape[0]

        def body(carry, inp):
            g_acc, stats = carry
            mb, key = inp
            g, m, stats = grads_of(state.params, stats, mb, key)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, stats), m

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        keys = jax.random.split(rng, n)
        (gsum, new_stats), ms = jax.lax.scan(
            body, (zeros, state.batch_stats), (batch, keys)
        )
        grads = jax.tree.map(lambda g: g / n, gsum)
        metrics = jax.tree.map(jnp.mean, ms)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return (
        TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        ),
        metrics,
    )


def eval_step(model, state: TrainState, batch, compute_dtype: str = "float32"):
    _, (metrics, _) = loss_fn(
        model, state.params, state.batch_stats, batch, rngs={}, train=False,
        compute_dtype=compute_dtype,
    )
    return metrics


def make_parallel_eval_step(model, mesh, compute_dtype: str = "float32",
                            state_shardings=None):
    """Jit the eval step with the same mesh shardings as the train step.

    The reference evaluates through the same compiled path as training (HF
    Trainer evaluation_loop); an unjitted ``model.apply`` on TPU dispatches
    the 325M-param forward op-by-op and dominates every eval cadence.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    st_sh = state_shardings if state_shardings is not None else repl

    @partial(jax.jit, in_shardings=(st_sh, data), out_shardings=repl)
    def step(state, batch):
        return eval_step(model, state, batch, compute_dtype)

    return step


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place the state with the exact sharding the jitted step declares.

    Avoids a second compilation on step 2 (the donated outputs otherwise come
    back with layouts that differ from the initial host arrays'). Under
    multi-process execution the mesh spans non-addressable devices, so the
    global arrays are assembled from (identical) process-local data instead
    of device_put.
    """
    import numpy as np

    shardings = train_state_shardings(state, mesh)
    if jax.process_count() > 1:
        # make_array_from_callback slices the full host copy per shard, which
        # is correct for replicated AND tensor-sharded leaves alike (every
        # process computed the identical full array from the same seed).
        def place(x, s):
            h = np.asarray(x)
            return jax.make_array_from_callback(h.shape, s, lambda idx: h[idx])

        return jax.tree.map(place, state, shardings)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)


def train_state_shardings(state: TrainState, mesh) -> TrainState:
    """Sharding pytree for the whole TrainState: data-parallel replication
    plus Megatron-style tensor parallelism over the 'model' axis when the
    mesh has one. Optimizer moments mirror the parameter tree, so the same
    path-suffix rule (core/mesh.param_partition_spec) applies everywhere.
    """
    from avsr_tpu.core.mesh import MODEL_AXIS, param_partition_spec

    if mesh.shape.get(MODEL_AXIS, 1) == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_partition_spec(path, leaf)),
        state,
    )


def make_parallel_train_step(model, tx, mesh, compute_dtype: str = "float32",
                             state_shardings=None, rng_impl: str = "rbg"):
    """Jit the train step sharded over `mesh` (DP batch axis; TP parameter
    axis when state_shardings carry 'model'-sharded kernels)."""
    from avsr_tpu.ops.grouped_conv import tp_safe_mesh

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    st_sh = state_shardings if state_shardings is not None else repl

    @partial(
        jax.jit,
        in_shardings=(st_sh, data, repl),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
    def step(state, batch, rng):
        # GSPMD over-reduces grouped-conv kernel grads on meshes with a
        # model axis (even for replicated weights). The context manager is
        # active exactly while THIS step traces (the body runs at trace
        # time), so grouped convs inside take the shard_map path on TP
        # meshes and no other trace is affected — see ops/grouped_conv.py.
        with tp_safe_mesh(mesh):
            return train_step(model, tx, state, batch, rng, compute_dtype,
                              rng_impl=rng_impl)

    return step


def make_parallel_accum_train_step(model, tx, mesh, compute_dtype: str = "float32",
                                   state_shardings=None, rng_impl: str = "rbg"):
    """Same, but batches carry a leading micro-batch (accum) dimension."""
    from avsr_tpu.ops.grouped_conv import tp_safe_mesh

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    st_sh = state_shardings if state_shardings is not None else repl

    @partial(
        jax.jit,
        in_shardings=(st_sh, data, repl),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
    def step(state, batch, rng):
        with tp_safe_mesh(mesh):  # see make_parallel_train_step
            return train_step(model, tx, state, batch, rng, compute_dtype,
                              rng_impl=rng_impl)

    return step


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState) -> None:
    """Blocking single-checkpoint save (tools/tests; the training loop uses
    CheckpointManager below for async saves + retention)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, template)


class CheckpointManager:
    """Async step-tagged checkpoints with retention and best-model tracking.

    TPU-native counterpart of the reference HF Trainer checkpoint policy
    (/root/reference/script/train.py:273,280,286): ``save_total_limit``
    (keep-last-N), ``metric_for_best_model='loss'`` (best eval loss recorded
    in ``best.json``), and non-blocking saves — at 325M params x fp32 master
    + Adam moments a synchronous save stalls training for seconds; orbax's
    async checkpointer snapshots device arrays and writes in background
    threads while the step loop keeps dispatching.
    """

    def __init__(self, root: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._root = root
        self._mgr = ocp.CheckpointManager(
            root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
                # step dirs are bare ints ("2000"), matching the previous
                # StandardCheckpointer layout so old runs remain resumable
                step_format_fixed_length=None,
            ),
        )
        self._ocp = ocp
        self._best: Optional[float] = None

    def save(self, step: int, state: TrainState) -> None:
        """Queue an async save; returns as soon as device arrays are copied."""
        self._mgr.save(step, args=self._ocp.args.StandardSave(state))

    def note_eval(self, step: int, metrics: Dict[str, float],
                  metric: str = "loss") -> bool:
        """Track best eval metric (lower is better); returns True if improved."""
        import json
        import os

        value = float(metrics.get(metric, float("nan")))
        if value != value:  # NaN
            return False
        if self._best is None or value < self._best:
            self._best = value
            with open(os.path.join(self._root, "best.json"), "w") as f:
                json.dump({"step": step, metric: value}, f)
            return True
        return False

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, template: TrainState) -> TrainState:
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
