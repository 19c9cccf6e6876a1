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
    # collect op events per lane, then charge each event its SELF time only:
    # a `while` (lax.scan) envelope event contains its body ops on the same
    # lane, so naive duration sums double-count scan bodies (measured: 724
    # ms/step "device total" vs 617 ms wall at B=24)
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tnames.get((e["pid"], e.get("tid")), "")
        if "Step" in lane or "step" in lane:
            continue  # step-marker lane duplicates op time
        if "XLA Modules" in lane:
            continue  # whole-module envelope duplicates op time
        lanes[(e["pid"], e.get("tid"))].append(e)
    per_op = collections.Counter()
    n_op = collections.Counter()
    op_args = {}
    total = 0.0
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, child_time_accum index into charges)
        charges = []  # mutable [child_time] cells, parallel to stack depth
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1] - 1e-9:
                stack.pop()
                charges.pop()
            self_dur = dur
            if stack:
                charges[-1][0] += dur  # this event is a child of stack top
            stack.append(ts + dur)
            cell = [0.0]
            charges.append(cell)
            # defer the charge until we know the children total — use a
            # closure-free trick: record and fix up after the sweep
            e["_cell"] = cell
        for e in evs:
            dur = e.get("dur", 0)
            self_ms = (dur - e.pop("_cell")[0]) / 1e3
            if self_ms < 0:
                self_ms = 0.0
            per_op[e["name"]] += self_ms
            n_op[e["name"]] += 1
            total += self_ms
            if e["name"] not in op_args and e.get("args"):
                op_args[e["name"]] = e["args"]
    return per_op, n_op, total, op_args


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--labels", type=int, default=48)
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "full", "ffn", "ffn2", "qkv_ffn"])
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--frontend-remat", action="store_true")
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
    cfg.encoder.frontend_remat = args.frontend_remat
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
    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = step_fn(state, device_batch, jax.random.fold_in(key, i))
        float(metrics["loss"])  # D2H sync inside the trace window
    wall_ms = (time.perf_counter() - t0) / args.steps * 1e3

    per_op, n_op, total, op_args = parse_trace(trace_dir, args.steps)
    print(
        f"device total: {total / args.steps:.1f} ms/step over {args.steps} steps"
        f" (wall {wall_ms:.1f} ms/step -> {wall_ms - total / args.steps:.1f} ms"
        f" dispatch/idle gap)"
    )
    # group: ops executing >= L/2 times per step are encoder-scan body ops
    L = cfg.encoder.num_hidden_layers
    scan_ms = sum(d for nm, d in per_op.items() if n_op[nm] >= args.steps * L // 2)
    print(
        f"  scan-body (x>={L // 2}/step): {scan_ms / args.steps:.1f} ms/step | "
        f"single-shot: {(total - scan_ms) / args.steps:.1f} ms/step"
    )
    # per-source aggregation: where does device time come from?
    by_src = collections.Counter()
    for name, dur in per_op.items():
        a = op_args.get(name, {})
        src = a.get("source_info") or a.get("source") or "?"
        by_src[src] += dur
    print("by source:")
    for src, dur in by_src.most_common(25):
        print(f"  {dur / args.steps:9.3f} ms/step  {src}")
    for name, dur in per_op.most_common(args.top):
        a = op_args.get(name, {})
        src = a.get("source_info") or a.get("source") or ""
        label = a.get("long_name") or a.get("tf_op") or ""
        extra = f"  [{label[:90]}]" if label else ""
        if src:
            extra += f" @{src}"
        print(
            f"  {dur / args.steps:9.3f} ms/step  x{n_op[name] // args.steps:<4d}"
            f" {name}{extra}"
        )


if __name__ == "__main__":
    main()
