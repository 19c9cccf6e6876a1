"""Device-trace profile of the training step on the real TPU.

Runs N profiled steps of the flagship train step (same workload as
bench_train.py), then parses the trace and reports per-step DEVICE time by
op, using only TensorCore-lane events (host/python lanes excluded — summing
every lane wildly overcounts; see BASELINE.md timing-method notes).

Usage: python tools/profile_train.py [--batch 6] [--remat none] [--steps 4]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str, steps: int):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # map pid -> process name; keep TensorCore op lanes only
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pnames.items()
        if "TPU" in name and "XLA Op" not in name or "TensorCore" in name
    }
    # thread names distinguish op lanes from step lanes
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
    per_op = collections.Counter()
    n_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tnames.get((e["pid"], e.get("tid")), "")
        if "Step" in lane or "step" in lane:
            continue  # step-marker lane duplicates op time
        if "XLA Modules" in lane:
            continue  # whole-module envelope duplicates op time
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[e["name"]] += dur
        n_op[e["name"]] += 1
        total += dur
    return per_op, n_op, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--labels", type=int, default=48)
    ap.add_argument("--remat", default="none", choices=["none", "dots", "full", "ffn"])
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import numpy as np

    import jax

    from avsr_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.core.mesh import make_mesh, shard_batch
    from avsr_tpu.train import trainer as T

    cfg = AVHubertAVSRConfig()
    cfg.encoder.use_flash_attention = True
    cfg.encoder.scan_unroll = args.unroll
    cfg.encoder.scan_remat = args.remat
    tcfg = T.TrainConfig(compute_dtype="bfloat16")

    b, t, l = args.batch, args.frames, args.labels
    rng = np.random.RandomState(0)
    batch = {
        "videos": rng.randn(b, t, 88, 88, 1).astype(np.float32),
        "audios": rng.randn(b, t, 104).astype(np.float32),
        "labels": np.tile(rng.randint(1, 5000, (1, l)), (b, 1)).astype(np.int32),
        "video_lengths": np.full((b,), t, np.int32),
        "label_lengths": np.full((b,), l, np.int32),
    }
    mesh = make_mesh()
    model, state = T.init_state(cfg, tcfg, jax.random.PRNGKey(0), batch)
    tx = T.make_optimizer(tcfg)
    st_sh = T.train_state_shardings(state, mesh)
    step_fn = T.make_parallel_train_step(model, tx, mesh, tcfg.compute_dtype, st_sh)
    state = T.replicate_state(state, mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    # warmup/compile
    state, metrics = step_fn(state, device_batch, key)
    float(metrics["loss"])

    trace_dir = tempfile.mkdtemp(prefix="train_trace_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = step_fn(state, device_batch, jax.random.fold_in(key, i))
        float(metrics["loss"])  # D2H sync inside the trace window

    per_op, n_op, total = parse_trace(trace_dir, args.steps)
    print(f"device total: {total / args.steps:.1f} ms/step over {args.steps} steps")
    for name, dur in per_op.most_common(args.top):
        print(f"  {dur / args.steps:9.3f} ms/step  x{n_op[name] // args.steps:<4d} {name}")


if __name__ == "__main__":
    main()
