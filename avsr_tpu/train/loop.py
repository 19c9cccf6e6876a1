"""Training loop orchestration: batching, logging, checkpoints, eval, resume.

The TPU-native counterpart of the reference's HF Trainer usage
(script/train.py:259-314, custom_trainer.py:4): steps-based eval/save
cadence, loss logging every log_interval, orbax checkpoints with optimizer
state, resume-from-checkpoint (like the reference with ignore_data_skip=True,
the data stream restarts on resume).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import jax
import numpy as np

from avsr_tpu.core.mesh import make_mesh, shard_accum_batch, shard_batch
from avsr_tpu.train import trainer as T

# static shape buckets: video frames and label lengths
T_BUCKETS = (64, 128, 192, 256, 384, 512, 640)
L_BUCKETS = (16, 32, 48, 64, 96, 128)


@dataclasses.dataclass
class LoopConfig:
    output_dir: str = "model-bin/avsr_tpu"
    max_steps: int = 400_000
    batch_size: int = 6  # per-device micro batch (reference per_device_train_batch_size)
    grad_accum: int = 2
    save_steps: int = 2000
    # keep-last-N retention (reference save_total_limit, script/train.py:280)
    save_total_limit: int = 500
    eval_steps: int = 2000
    eval_batches: int = 50
    log_interval: int = 25
    seed: int = 0
    # collator worker-pool size (reference dataloader_num_workers=10,
    # script/train.py:278); 0 = collate inline on the feeding thread
    num_workers: int = 0
    # True = spawn process pool (GIL-free; for multi-chip hosts), False = threads
    use_process_workers: bool = False
    report_to: str = "none"  # 'none' | 'wandb' | 'tensorboard'
    run_name: str = "avsr_tpu"
    # write a TensorBoard-viewable jax profiler trace of steps 10-12
    profile_dir: str = ""


_WORKER_COLLATOR = None


def _init_collate_worker(collator) -> None:
    global _WORKER_COLLATOR
    _WORKER_COLLATOR = collator


def _collate_in_worker(group, group_index):
    return _WORKER_COLLATOR(group, group_index=group_index)


def batches_from_samples(
    samples: Iterable[Dict],
    collator,
    batch_size: int,
    grad_accum: int = 1,
    drop_last: bool = True,
    num_workers: int = 0,
    use_processes: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Group samples into (accum, B, ...) collated batches with bucketing.

    num_workers > 0 runs the collator (media decode + augment + fbank) in a
    worker pool with up to 2*num_workers groups in flight, the counterpart
    of the reference's dataloader_num_workers=10 (script/train.py:278).
    Threads (default) overlap collation with the device step and suit
    single-chip hosts; use_processes=True sidesteps the GIL for multi-chip
    hosts where one Python process cannot decode fast enough (measured:
    threads plateau ~25 samples/s; the spawn pool scales with cores).
    Results are yielded in order either way.
    """
    collator.t_buckets = T_BUCKETS
    collator.l_buckets = L_BUCKETS
    want = batch_size * grad_accum

    def groups() -> Iterator[List[Dict]]:
        group: List[Dict] = []
        for sample in samples:
            group.append(sample)
            if len(group) == want:
                yield group
                group = []
        if group and not drop_last:
            yield group

    def shape(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if grad_accum > 1:
            batch = {
                k: v.reshape((grad_accum, batch_size) + v.shape[1:])
                for k, v in batch.items()
            }
        return batch

    if num_workers <= 0:
        for idx, group in enumerate(groups()):
            yield shape(collator(group, group_index=idx))
        return

    import collections
    import concurrent.futures as cf

    if use_processes:
        # spawn (not fork): the parent holds live TPU-runtime threads
        import multiprocessing as mp

        pool = cf.ProcessPoolExecutor(
            max_workers=num_workers, mp_context=mp.get_context("spawn"),
            initializer=_init_collate_worker, initargs=(collator,),
        )
        submit = lambda g, i: pool.submit(_collate_in_worker, g, i)  # noqa: E731
    else:
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)
        submit = lambda g, i: pool.submit(collator, g, group_index=i)  # noqa: E731

    try:
        pending: collections.deque = collections.deque()
        for idx, group in enumerate(groups()):
            pending.append(submit(group, idx))
            if len(pending) >= 2 * num_workers:
                yield shape(pending.popleft().result())
        while pending:
            yield shape(pending.popleft().result())
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def device_prefetch(batches: Iterator[Dict[str, np.ndarray]], put, mesh, depth: int = 2):
    """Overlap host collation/transfer with device compute.

    Keeps `depth` batches in flight on device (double buffering by default):
    while the TPU runs step N, batch N+1 is already being collated and
    transferred (SURVEY §7: input-pipeline overlap).
    """
    import collections

    queue = collections.deque()
    for batch in batches:
        queue.append(put(batch, mesh))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def param_summary(params) -> str:
    """Parameter counts per top-level module + total (the reference prints a
    torchsummary of the model at startup, script/train.py:256)."""
    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        top = getattr(path[0], "key", str(path[0]))
        counts[top] = counts.get(top, 0) + int(np.prod(leaf.shape))
    lines = [f"  {k:<32s} {v:>14,d}" for k, v in sorted(counts.items())]
    lines.append(f"  {'total':<32s} {sum(counts.values()):>14,d}")
    return "\n".join(lines)


class MetricsLogger:
    """stdout + optional wandb/tensorboard metric sink (reference report_to,
    script/train.py:291)."""

    def __init__(self, cfg: LoopConfig):
        self.cfg = cfg
        self.backend = None
        self.tb = None
        if cfg.report_to == "wandb":
            try:
                import wandb

                wandb.init(project=os.environ.get("WANDB_PROJECT", "avsr_tpu"),
                           name=cfg.run_name)
                self.backend = wandb
            except ImportError:
                print("wandb not available; logging to stdout")
        elif cfg.report_to == "tensorboard":
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(
                    os.path.join(cfg.output_dir, "runs", cfg.run_name)
                )
            except ImportError:
                print("tensorboardX not available; logging to stdout")
        self._last = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        now = time.time()
        dt = now - self._last
        self._last = now
        line = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
        print(f"[{prefix} step {step}] {line} ({dt:.1f}s)")
        if self.backend is not None:
            self.backend.log(
                {f"{prefix}/{k}": float(v) for k, v in metrics.items()}, step=step
            )
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        if self.tb is not None:
            self.tb.close()


def run_training(
    model_cfg,
    loop_cfg: LoopConfig,
    train_samples: Iterable[Dict],
    collator,
    valid_samples: Optional[Callable[[], Iterable[Dict]]] = None,
    valid_collator=None,
    pretrained_variables: Optional[dict] = None,
    train_cfg: Optional[T.TrainConfig] = None,
    mesh=None,
    resume_from_checkpoint: bool = False,
    pretrain_cfg=None,
) -> T.TrainState:
    """Run the training loop; returns the final state.

    pretrain_cfg (a train.pretrain.PretrainConfig) switches the objective to
    AV-HuBERT masked prediction: the model becomes AVHubertPretrainModel
    (whose 'hubert' params subtree is layout-compatible with AVSRModel's
    'encoder') and the collator must emit pretraining batches
    (train.pretrain.PretrainCollator). Everything else — mesh sharding,
    grad accumulation, checkpoints, eval cadence, logging — is shared."""
    mesh = mesh or make_mesh()
    tcfg = train_cfg or T.TrainConfig(
        max_steps=loop_cfg.max_steps, grad_accum=loop_cfg.grad_accum
    )
    os.makedirs(loop_cfg.output_dir, exist_ok=True)

    # batch_size is per data-parallel device (reference per_device_train_batch_size);
    # each host collates only its share of the global batch (shard_for_host
    # feeds it distinct samples) — shard_batch assembles the global array
    global_batch = loop_cfg.batch_size * mesh.shape["data"]
    host_batch = global_batch // jax.process_count()
    batches = batches_from_samples(
        train_samples, collator, host_batch, loop_cfg.grad_accum,
        num_workers=loop_cfg.num_workers,
        use_processes=loop_cfg.use_process_workers,
    )
    first = next(batches)
    example = (
        {k: v[0] for k, v in first.items()} if loop_cfg.grad_accum > 1 else first
    )
    override = None
    if pretrain_cfg is not None:
        from avsr_tpu.train.pretrain import AVHubertPretrainModel

        override = AVHubertPretrainModel(model_cfg.encoder, pretrain_cfg)
    model, state = T.init_state(
        model_cfg, tcfg, jax.random.PRNGKey(loop_cfg.seed), example,
        variables=pretrained_variables, model=override,
    )
    print("Model parameters:\n" + param_summary(state.params))
    tx = T.make_optimizer(tcfg)
    state_sh = T.train_state_shardings(state, mesh)
    if loop_cfg.grad_accum > 1:
        step_fn = T.make_parallel_accum_train_step(
            model, tx, mesh, tcfg.compute_dtype, state_sh,
            rng_impl=tcfg.rng_impl,
        )
        put = shard_accum_batch
    else:
        step_fn = T.make_parallel_train_step(
            model, tx, mesh, tcfg.compute_dtype, state_sh,
            rng_impl=tcfg.rng_impl,
        )
        put = shard_batch
    eval_fn = T.make_parallel_eval_step(model, mesh, tcfg.compute_dtype, state_sh)

    ckpt_root = os.path.abspath(os.path.join(loop_cfg.output_dir, "checkpoints"))
    manager = T.CheckpointManager(ckpt_root, max_to_keep=loop_cfg.save_total_limit)
    if resume_from_checkpoint:
        latest = manager.latest_step()
        if latest is not None:
            print(f"Resuming from {ckpt_root}/{latest}")
            state = manager.restore(latest, state)
        elif os.path.isdir(ckpt_root):
            # pre-CheckpointManager layout (bare StandardCheckpointer dirs)
            steps = sorted(int(d) for d in os.listdir(ckpt_root) if d.isdigit())
            if steps:
                path = os.path.join(ckpt_root, str(steps[-1]))
                print(f"Resuming from {path}")
                state = T.restore_checkpoint(path, state)

    state = T.replicate_state(state, mesh)
    logger = MetricsLogger(loop_cfg)
    rng = jax.random.PRNGKey(loop_cfg.seed + 1)

    # Host-side step counter: fetching int(state.step) (or any metric) every
    # iteration forces a device sync before the next dispatch — measured at
    # ~28% of wall time (BASELINE train-step profile). The device metrics are
    # buffered as jax.Arrays and fetched in ONE explicit device_get per
    # log_interval; nothing on the step path does an implicit D2H transfer
    # (tests run this loop under jax.transfer_guard_device_to_host).
    step_no = int(jax.device_get(state.step))
    window: list = []

    import itertools

    prefetched = device_prefetch(itertools.chain([first], batches), put, mesh)
    for device_batch in prefetched:
        if step_no >= loop_cfg.max_steps:
            break
        if loop_cfg.profile_dir and step_no == 10:
            jax.profiler.start_trace(loop_cfg.profile_dir)
        state, metrics = step_fn(
            state, device_batch, jax.random.fold_in(rng, step_no)
        )
        if loop_cfg.profile_dir and step_no == 12:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
        window.append(metrics)
        step_no += 1

        if step_no % loop_cfg.log_interval == 0:
            fetched = jax.device_get(window)
            logger.log(
                step_no,
                {k: np.mean([m[k] for m in fetched]) for k in fetched[0]},
            )
            window = []

        if valid_samples is not None and step_no % loop_cfg.eval_steps == 0:
            ev: list = []
            vbatches = batches_from_samples(
                valid_samples(), valid_collator or collator, host_batch, 1
            )
            for i, vb in enumerate(vbatches):
                if i >= loop_cfg.eval_batches:
                    break
                ev.append(eval_fn(state, shard_batch(vb, mesh)))
            if ev:
                ev = jax.device_get(ev)
                eval_metrics = {k: float(np.mean([m[k] for m in ev])) for k in ev[0]}
                logger.log(step_no, eval_metrics, "eval")
                if manager.note_eval(step_no, eval_metrics):
                    print(f"New best eval loss at step {step_no}")

        if step_no % loop_cfg.save_steps == 0:
            manager.save(step_no, state)  # async; does not block the loop
            print(f"Queued checkpoint {ckpt_root}/{step_no}")

    manager.close()
    logger.close()
    return state
