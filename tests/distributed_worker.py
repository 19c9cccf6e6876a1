"""Worker for the 2-process jax.distributed test (run via test_multiprocess).

Each process owns 2 virtual CPU devices (4 global). Exercises the actual
--multihost code paths (cli/train.py --multihost, data.dataset.shard_for_host,
core.mesh.shard_batch, train.trainer.replicate_state / CheckpointManager):

1. distributed init + process/device counts
2. per-host dataset sharding is disjoint and complete
3. a data-parallel gradient all-reduce over the 2-host mesh matches the
   single-host full-batch computation (numpy reference)
4. orbax checkpoint save/restore participates from both processes

Exit code 0 = all assertions passed in this process.
"""

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
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

    jax.distributed.shutdown()
    print(f"worker {proc_id}: OK", flush=True)


if __name__ == "__main__":
    main()
