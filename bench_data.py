"""Data-plane soak benchmark: can the host feed the TPU train step?

The reference dedicates 10 dataloader worker processes to media decode +
augmentation + fbank (script/train.py:278). This benchmark proves the
TPU-native input pipeline sustains the device demand with the same workload
shape: it synthesizes a pool of real mp4/wav clips, streams them through the
full train collator (pyav/cv2 decode, SNR mixing + time-mask augmentation,
C++ log-fbank featurizer), and runs the actual jitted train step against the
stream.

Three phases:
  A. device demand  — one pre-collated batch fed repeatedly: samples/s the
     TPU consumes with zero host cost.
  B. host supply    — collation-only throughput at several worker counts,
     with the native featurizer on and off.
  C. end-to-end soak — N steps (default 300) of the real loop (streaming
     collator -> device prefetch -> train step).

Usage: python bench_data.py [--steps 300] [--batch 6] [--clips 48]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

WORDS = (
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG WHILE WE BENCHMARK "
    "SUSTAINED AUDIO VISUAL STREAMING ON TENSOR PROCESSING UNITS"
).split()


def build_fixture_pool(root: str, n_clips: int, seed: int = 0):
    """Synthesize mp4 (25 fps, 96x96 gray) + 16 kHz wav sidecars, 3-10 s."""
    from avsr_tpu.data import media

    rng = np.random.RandomState(seed)
    samples = []
    for i in range(n_clips):
        frames = int(rng.randint(75, 250))  # 3-10 s at 25 fps
        vid = rng.randint(0, 256, size=(frames, 96, 96)).astype(np.uint8)
        wave = (rng.randn(frames * 640) * 0.1).astype(np.float32)
        path = os.path.join(root, f"clip_{i:03d}.mp4")
        media.save_video(path, vid, fps=25.0)
        media.save_audio(os.path.splitext(path)[0] + ".wav", wave)
        n_words = int(rng.randint(4, 14))
        label = " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(n_words))
        samples.append({"video": path, "label": label})
    return samples


def sample_stream(samples, seed: int = 1):
    rng = np.random.RandomState(seed)
    while True:
        for idx in rng.permutation(len(samples)):
            yield dict(samples[int(idx)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--grad_accum", type=int, default=2)
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--workers", type=int, default=10)
    ap.add_argument("--host_batches", type=int, default=30,
                    help="batches per host-supply measurement point")
    args = ap.parse_args()

    import jax

    from avsr_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.core.mesh import make_mesh, shard_accum_batch
    from avsr_tpu.data.collate import DataCollator
    from avsr_tpu.data.tokenizer import TextTransform
    from avsr_tpu.data.transforms import AudioTransform, VideoTransform
    from avsr_tpu.ops import fbank as F
    from avsr_tpu.train import trainer as T
    from avsr_tpu.train.loop import batches_from_samples

    tmp = tempfile.mkdtemp(prefix="avsr_soak_")
    print(f"fixture pool: {args.clips} clips under {tmp}")
    samples = build_fixture_pool(tmp, args.clips)

    # Real interferer path (cli/train.py `interferer`): SNR mixing draws 0-2
    # interferer utterances per training sample. Production uses a rotating
    # pool of pre-decoded waveforms refreshed by a background thread
    # (data/dataset.py InterfererPool) — this soak exercises the same pool:
    # draws off the critical path, ffmpeg decodes competing for host CPU in
    # the background exactly as in training.
    from avsr_tpu.data import media
    from avsr_tpu.data.dataset import InterfererPool

    interferer = InterfererPool(
        samples, size=min(256, len(samples)),
        decode_fn=lambda s: media.load_audio(s["video"]),
    )

    def make_collator():
        return DataCollator(
            text_transform=TextTransform(),
            video_transform=VideoTransform("train", device_norm=True),
            audio_transform=AudioTransform(
                "train", sample_interferer=interferer
            ),
        )

    micro, accum = args.batch, args.grad_accum
    per_step = micro * accum

    # ---- phase B: host supply (no device) --------------------------------
    host_rows = []
    native_states = [True, False] if F._NATIVE is not None else [False]
    points = [(n, w, False) for n in native_states for w in (0, 4, args.workers)]
    points += [(native_states[0], w, True) for w in (4, args.workers)]
    for native, workers, procs in points:
        F.USE_NATIVE = native
        batches = batches_from_samples(
            sample_stream(samples), make_collator(), micro, accum,
            num_workers=workers, use_processes=procs,
        )
        next(batches)  # warm caches / worker pool
        t0 = time.perf_counter()
        for _ in range(args.host_batches):
            next(batches)
        dt = time.perf_counter() - t0
        batches.close()
        rate = args.host_batches * per_step / dt
        host_rows.append(
            {"native_fbank": native, "workers": workers,
             "processes": procs, "samples_per_s": round(rate, 1)}
        )
        print(f"host supply: native_fbank={native} workers={workers} "
              f"processes={procs}: {rate:.1f} samples/s", flush=True)
    F.USE_NATIVE = True

    # ---- phase A: device demand ------------------------------------------
    cfg = AVHubertAVSRConfig()
    cfg.encoder.use_flash_attention = True
    tcfg = T.TrainConfig(compute_dtype="bfloat16", grad_accum=accum)
    mesh = make_mesh()

    batches = batches_from_samples(
        sample_stream(samples), make_collator(), micro, accum,
        num_workers=args.workers,
    )
    first = next(batches)
    example = {k: v[0] for k, v in first.items()} if accum > 1 else first
    model, state = T.init_state(cfg, tcfg, jax.random.PRNGKey(0), example)
    tx = T.make_optimizer(tcfg)
    st_sh = T.train_state_shardings(state, mesh)
    step_fn = T.make_parallel_accum_train_step(
        model, tx, mesh, tcfg.compute_dtype, st_sh
    )
    state = T.replicate_state(state, mesh)
    key = jax.random.PRNGKey(1)

    dev_batch = shard_accum_batch(first, mesh)
    state, metrics = step_fn(state, dev_batch, key)
    float(metrics["loss"])  # D2H fetch = true sync through the tunnel
    n_dev = 20
    t0 = time.perf_counter()
    for i in range(n_dev):
        state, metrics = step_fn(state, dev_batch, jax.random.fold_in(key, i))
    float(metrics["loss"])
    dev_dt = (time.perf_counter() - t0) / n_dev
    dev_rate = per_step / dev_dt
    print(f"device demand: {dev_dt:.3f} s/step = {dev_rate:.1f} samples/s "
          f"(batch {micro} x accum {accum})")

    # ---- phase C: end-to-end soak ----------------------------------------
    # prewarm every (T, L) bucket combination the clip pool can produce so
    # the soak measures throughput, not first-encounter XLA compiles (a real
    # 400k-step run amortizes these; a 300-step soak does not). The disk
    # compilation cache makes this a no-op on repeat runs.
    from avsr_tpu.train.loop import L_BUCKETS, T_BUCKETS

    t_lo = min(b for b in T_BUCKETS if b >= 75)
    t_buckets = [b for b in T_BUCKETS if t_lo <= b <= 256]
    l_buckets = [b for b in L_BUCKETS if b <= 32]
    print(f"prewarming {len(t_buckets) * len(l_buckets)} bucket shapes...",
          flush=True)
    t0 = time.perf_counter()
    for tb in t_buckets:
        for lb in l_buckets:
            dummy = {
                "videos": np.zeros((accum, micro, tb, 88, 88, 1), np.uint8),
                "audios": np.zeros((accum, micro, tb, 104), np.float32),
                "video_lengths": np.full((accum, micro), tb, np.int32),
                "labels": np.full((accum, micro, lb), 3, np.int32),
                "label_lengths": np.full((accum, micro), min(4, lb), np.int32),
            }
            state, metrics = step_fn(
                state, shard_accum_batch(dummy, mesh), key
            )
    float(metrics["loss"])
    print(f"prewarm done ({time.perf_counter() - t0:.1f}s)", flush=True)

    n_total = args.steps
    t0 = time.perf_counter()
    times = []
    for i in range(n_total):
        batch = next(batches)
        state, metrics = step_fn(state, shard_accum_batch(batch, mesh),
                                 jax.random.fold_in(key, 1000 + i))
        if (i + 1) % 25 == 0:
            float(metrics["loss"])  # periodic sync so queue depth stays sane
            times.append(time.perf_counter())
            print(f"  soak step {i + 1}/{n_total} "
                  f"({times[-1] - t0:.1f}s elapsed)", flush=True)
    float(metrics["loss"])
    # steady state: last half of the run
    half = len(times) // 2
    steady_dt = (times[-1] - times[half - 1]) / ((len(times) - half) * 25)
    steady_rate = per_step / steady_dt
    print(f"end-to-end soak: {steady_rate:.1f} samples/s steady "
          f"({steady_dt:.3f} s/step, {n_total} steps total)")

    print(json.dumps({
        "metric": "data_plane_soak",
        "device_demand_samples_per_s": round(dev_rate, 1),
        "end_to_end_samples_per_s": round(steady_rate, 1),
        "feed_efficiency": round(steady_rate / dev_rate, 3),
        "host_supply": host_rows,
        "steps": n_total,
        "workers": args.workers,
    }))


if __name__ == "__main__":
    main()
