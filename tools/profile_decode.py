"""Device-trace profile of the batched beam-decode path on the real TPU.

Same workload as bench.py (flagship encoder + joint CTC/attention beam
search, 15 s segments); prints per-op device time for one traced batch,
device-lane events only. In-loop ops appear x375 (one per decode step).

Usage: python tools/profile_decode.py [--batch 16] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_train import parse_trace  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=375)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--encode_dtype", default="bfloat16")
    ap.add_argument("--fused_bookkeeping", type=int, default=1)
    args = ap.parse_args()

    import numpy as np

    import jax

    from avsr_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.decode.recognizer import Recognizer
    from avsr_tpu.models.e2e import AVSRModel
    from bench import smooth_crops

    cfg = AVHubertAVSRConfig(
        decoder_cache_dtype="bfloat16", decoder_param_dtype="bfloat16"
    )
    cfg.encoder.use_flash_attention = True
    cfg.decode_fused_attention = True
    model = AVSRModel(cfg)
    rng = np.random.RandomState(0)
    b, t = args.batch, args.frames
    videos = jnp.asarray(rng.randn(1, 4, 88, 88, 1).astype(np.float32))
    audios = jnp.asarray(rng.randn(1, 4, 104).astype(np.float32))
    labels = jnp.asarray([[3, 4]], dtype=jnp.int32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, videos, audios, labels,
            jnp.asarray([4], jnp.int32), jnp.asarray([2], jnp.int32),
        )
    )(jax.random.PRNGKey(0))
    rec = Recognizer(
        model=model, variables=variables, cfg=cfg, t_buckets=(t + 2,),
        max_decode_tokens=192,
        encode_dtype=args.encode_dtype,
        fused_bookkeeping=bool(args.fused_bookkeeping),
    )
    feats_a = [rng.randn(t, 104).astype(np.float32) for _ in range(b)]
    feats_v = [smooth_crops(rng, t) for _ in range(b)]

    rec.transcribe_batch(feats_a, feats_v, mode="beam")  # warmup/compile

    trace_dir = tempfile.mkdtemp(prefix="decode_trace_")
    with jax.profiler.trace(trace_dir):
        rec.transcribe_batch(feats_a, feats_v, mode="beam")

    per_op, n_op, total, op_args = parse_trace(trace_dir, 1)
    audio_s = b * t / 25.0
    # `total` double-counts: a while.N envelope event covers its body ops,
    # which also appear individually (xTRIP_COUNT). Top-level time = x1/x2
    # events (outside any loop) + the while envelopes themselves.
    whiles = {n: d for n, d in per_op.items() if n.startswith("while")}
    top_level = sum(
        d for n, d in per_op.items()
        if n_op[n] <= 2 and not n.startswith("while")
    ) + sum(whiles.values())
    print(f"device top-level: {top_level:.1f} ms/batch ({audio_s:.0f} audio-s"
          f" => {audio_s / top_level * 1e3:.0f} audio-s/s device-side)")
    for n, d in sorted(whiles.items(), key=lambda kv: -kv[1]):
        print(f"  loop {n}: {d:.1f} ms")
    print(f"(raw event sum incl. loop bodies: {total:.1f} ms)")
    for name, dur in per_op.most_common(args.top):
        a = op_args.get(name) or {}
        src = a.get("source_info") or ""
        long = (a.get("long_name") or "")[:110]
        print(f"  {dur:9.3f} ms  x{n_op[name]:<5d} {name}  {src} {long}")


if __name__ == "__main__":
    main()
