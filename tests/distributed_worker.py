"""Worker for the 2-process jax.distributed test (run via test_multiprocess).

Each process owns 2 virtual CPU devices (4 global). Exercises the actual
--multihost code paths (cli/train.py --multihost, data.dataset.shard_for_host,
core.mesh.shard_batch, train.trainer.replicate_state / CheckpointManager):

1. distributed init + process/device counts
2. per-host dataset sharding is disjoint and complete
3. a data-parallel gradient all-reduce over the 2-host mesh matches the
   single-host full-batch computation (numpy reference)
4. orbax checkpoint save/restore participates from both processes
5. one REAL AVSRModel train step (tiny config) over the 2-process mesh;
   loss/grad-norm written to metrics_<proc>.json for the harness to compare
   against the single-process 4-device run (what torchrun DDP demonstrates,
   /root/reference/script/train.py:23)

Run with nproc=1 for the single-process reference mode: skips
jax.distributed and runs the same real-model step on 4 local devices.

Exit code 0 = all assertions passed in this process.
"""

import os
import sys


def _deterministic_tiny_cfg():
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    # zero every stochastic knob: PRNG bit layouts are not guaranteed
    # identical across different device meshes, and this test asserts exact
    # cross-layout equality of the deterministic math
    cfg.encoder.modality_dropout = 0.0
    cfg.encoder.audio_dropout = 0.0
    cfg.encoder.hidden_dropout = 0.0
    cfg.encoder.attention_dropout = 0.0
    cfg.encoder.dropout_input = 0.0
    cfg.dropout_rate = 0.0
    cfg.transformer_attn_dropout_rate = 0.0
    return cfg


def _global_batch():
    """The (deterministic) GLOBAL batch — identical on every process."""
    import numpy as np

    rng = np.random.RandomState(0)
    b, t, l = 8, 6, 3
    return {
        "videos": rng.randn(b, t, 88, 88, 1).astype(np.float32),
        "audios": rng.randn(b, t, 104).astype(np.float32),
        "labels": rng.randint(1, 30, size=(b, l)).astype(np.int32),
        "video_lengths": np.full((b,), t, np.int32),
        "label_lengths": np.full((b,), l, np.int32),
    }


def real_model_step(mesh, proc_id: int, nproc: int, out_dir: str,
                    tag: str = "") -> None:
    """One AVSRModel train step, global batch 8 sharded over `mesh`.

    With a 'model' axis >1 this is the DPxTP step: Megatron-sharded kernels
    (core/mesh.param_partition_spec), batch on the data axis. The batch is
    assembled with make_array_from_callback from the full deterministic
    global copy, which is correct for ANY mesh layout — including the
    cross-host TP layout where one process's devices sit in different data
    rows (there 'this host's share' is not a contiguous slice).
    """
    import json

    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsr_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
    from avsr_tpu.train import trainer as T

    cfg = _deterministic_tiny_cfg()
    batch_global = _global_batch()
    example = {k: v[:1] for k, v in batch_global.items()}
    tcfg = T.TrainConfig(warmup_steps=1, max_steps=4, grad_accum=1)
    model, state = T.init_state(cfg, tcfg, jax.random.PRNGKey(0), example)
    tx = T.make_optimizer(tcfg)
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    state_sh = T.train_state_shardings(state, mesh) if tp else None
    state = T.replicate_state(state, mesh)
    step_fn = T.make_parallel_train_step(model, tx, mesh,
                                         state_shardings=state_sh)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    batch = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            x.shape, data_sh, lambda idx, x=x: x[idx]),
        batch_global,
    )
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(5))
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(list(metrics.values())).all(), metrics
    with open(os.path.join(out_dir, f"metrics_{tag}{proc_id}.json"), "w") as f:
        json.dump(metrics, f)


def main() -> None:
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    devs = 2 if nproc > 1 else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc == 1:
        # single-process reference mode: same real-model step, 4 local devices
        from avsr_tpu.core.mesh import make_mesh

        os.makedirs(ckpt_dir, exist_ok=True)
        real_model_step(make_mesh(), 0, 1, ckpt_dir)
        print("worker 0: OK", flush=True)
        return
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    import numpy as np
    import jax.numpy as jnp

    # ---- per-host dataset sharding (shard_for_host) ----
    import datasets as hfds

    from avsr_tpu.data.dataset import shard_for_host

    ds = hfds.Dataset.from_dict({"id": list(range(16))})
    mine = set(shard_for_host(ds)["id"])
    other = set(
        shard_for_host(ds, process_index=1 - proc_id, process_count=nproc)["id"]
    )
    assert mine.isdisjoint(other), (mine, other)
    assert mine | other == set(range(16)), (mine, other)

    # ---- gradient all-reduce equivalence ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsr_tpu.core.mesh import DATA_AXIS, make_mesh, shard_batch

    mesh = make_mesh()  # (4, 1) over the global devices
    rng = np.random.RandomState(0)
    w_host = rng.randn(8, 4).astype(np.float32)
    x_global = rng.randn(8, 8).astype(np.float32)  # global batch 8
    y_global = rng.randn(8, 4).astype(np.float32)
    # each host feeds only its half, like shard_for_host-backed loaders
    lo, hi = proc_id * 4, proc_id * 4 + 4
    batch = shard_batch({"x": x_global[lo:hi], "y": y_global[lo:hi]}, mesh)

    repl = NamedSharding(mesh, P())
    w = jax.make_array_from_callback(w_host.shape, repl, lambda idx: w_host[idx])

    def loss_fn(w, b):
        pred = b["x"] @ w
        return jnp.mean(jnp.sum((pred - b["y"]) ** 2, axis=-1))

    step = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(repl, NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=repl,
    )
    grad = jax.device_get(step(w, batch))
    # numpy single-host reference over the full batch
    pred = x_global @ w_host
    grad_ref = x_global.T @ (2.0 * (pred - y_global)) / 8.0
    np.testing.assert_allclose(grad, grad_ref, rtol=1e-5, atol=1e-5)

    # ---- orbax save/restore across processes ----
    from avsr_tpu.train import trainer as T

    state = T.TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": w},
        batch_stats={},
        opt_state={"m": w},
    )
    state = T.replicate_state(state, mesh)
    mgr = T.CheckpointManager(ckpt_dir, max_to_keep=2)
    mgr.save(7, state)
    mgr.wait()
    assert mgr.latest_step() == 7
    restored = mgr.restore(7, state)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored.params["w"])), w_host
    )
    assert int(jax.device_get(restored.step)) == 7
    mgr.close()

    # ---- one real AVSRModel train step over the 2-process mesh ----
    real_model_step(mesh, proc_id, nproc, ckpt_dir)

    # ---- DPxTP step with the TP axis CROSSING the process boundary ----
    # mesh (data=2, model=2) arranged so each model group pairs one device
    # from EACH process: the Megatron all-reduces of the TP sharding must
    # ride the cross-host transport, not stay process-local. (The dryrun
    # multichip artifact proves DPxTP single-process; this closes the
    # cross-host half of the matrix.)
    from jax.sharding import Mesh

    from avsr_tpu.core.mesh import MODEL_AXIS

    devs = np.asarray(jax.devices()).reshape(nproc, -1).T  # (local, nproc)
    tp_mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
    real_model_step(tp_mesh, proc_id, nproc, ckpt_dir, tag="tp_")

    jax.distributed.shutdown()
    print(f"worker {proc_id}: OK", flush=True)


if __name__ == "__main__":
    main()
