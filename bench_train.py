"""Training-step benchmark at realistic shapes on the flagship model (real TPU).

Workload matches the reference run configuration (script/train.py:175-177):
AV-HuBERT-large joint CTC/attention fine-tuning, per-device batch 6, clips up
to 15 s (375 video frames, padded to the 384 bucket), bf16 compute with fp32
master weights, AdamW + clip. The reference trains this at ~4.7 samples/s per
Titan RTX (56 h/epoch over 1.9M samples on 2 GPUs, README).

Reports samples/s/chip and an MFU estimate from XLA's own cost analysis
(compiled-step FLOPs / wall time / chip peak).

Usage: python bench_train.py [--frames 384] [--batch 6] [--no-flash] [--fp32]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # TPU v5e (v5 lite) chip peak, bf16 FLOP/s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--labels", type=int, default=48)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "full", "ffn", "ffn2", "qkv_ffn"])
    ap.add_argument("--frontend-remat", action="store_true")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--pretrain", action="store_true",
                    help="AV-HuBERT masked-prediction objective at the same "
                         "shapes (mask gather + cosine-logit head instead of "
                         "the CTC/CE decoder)")
    args = ap.parse_args()

    import jax

    from avsr_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.core.mesh import make_mesh, shard_batch
    from avsr_tpu.train import trainer as T

    cfg = AVHubertAVSRConfig()
    cfg.encoder.use_flash_attention = not args.no_flash
    cfg.encoder.scan_unroll = args.unroll
    cfg.encoder.scan_remat = args.remat
    cfg.encoder.frontend_remat = args.frontend_remat
    tcfg = T.TrainConfig(
        compute_dtype="float32" if args.fp32 else "bfloat16", grad_accum=args.accum
    )

    b, t, l = args.batch, args.frames, args.labels
    rng = np.random.RandomState(0)
    if args.pretrain:
        from avsr_tpu.train.pretrain import (
            AVHubertPretrainModel, PretrainConfig, sample_pretrain_masks,
        )

        pcfg = PretrainConfig()
        am, _vm, vsrc = sample_pretrain_masks(pcfg, b, t, rng=rng)
        batch = {
            "videos": rng.randn(b, t, 88, 88, 1).astype(np.float32),
            "audios": rng.randn(b, t, 104).astype(np.float32),
            "audio_mask": am,
            "video_src_index": vsrc,
            "targets": rng.randint(
                0, pcfg.num_classes, (b, t)
            ).astype(np.int32),
            "video_lengths": np.full((b,), t, np.int32),
        }
    else:
        batch = {
            "videos": rng.randn(b, t, 88, 88, 1).astype(np.float32),
            "audios": rng.randn(b, t, 104).astype(np.float32),
            "labels": np.tile(rng.randint(1, 5000, (1, l)), (b, 1)).astype(np.int32),
            "video_lengths": np.full((b,), t, np.int32),
            "label_lengths": np.full((b,), l, np.int32),
        }
    if args.accum > 1:
        batch = {k: np.stack([v] * args.accum) for k, v in batch.items()}

    mesh = make_mesh()
    example = {k: v[0] for k, v in batch.items()} if args.accum > 1 else batch
    pre_model = None
    if args.pretrain:
        pre_model = AVHubertPretrainModel(cfg.encoder, pcfg)
    model, state = T.init_state(cfg, tcfg, jax.random.PRNGKey(0), example,
                                model=pre_model)
    tx = T.make_optimizer(tcfg)
    st_sh = T.train_state_shardings(state, mesh)
    if args.accum > 1:
        from avsr_tpu.core.mesh import shard_accum_batch
        step_fn = T.make_parallel_accum_train_step(
            model, tx, mesh, tcfg.compute_dtype, st_sh, rng_impl=tcfg.rng_impl)
        device_batch = shard_accum_batch(batch, mesh)
        state = T.replicate_state(state, mesh)
    else:
        step_fn = T.make_parallel_train_step(model, tx, mesh, tcfg.compute_dtype, st_sh,
                                             rng_impl=tcfg.rng_impl)
        state = T.replicate_state(state, mesh)
        device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    # compile + collect XLA's FLOP estimate for the whole fused step.
    # XLA cost analysis counts a lax.scan body ONCE regardless of trip count
    # (measured: 4.27T at unroll=1 vs 8.38T fully unrolled for the same
    # step), so add the remaining (L/unroll - 1) executions of the scanned
    # encoder layer analytically: per-layer fwd MACs = B*T*12*D^2 (QKVO +
    # 8D^2 FFN) + 2*B*T^2*D (scores + AV), x2 FLOPs/MAC, x3 for fwd+bwd.
    lowered = step_fn.lower(state, device_batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    L = cfg.encoder.num_hidden_layers
    u = min(max(args.unroll, 1), L)  # layers inside the counted scan body
    if flops and u < L:
        d = cfg.encoder.encoder_embed_dim
        tokens = b * args.accum * t
        # fwd FLOPs of one encoder layer: QKVO+FFN matmuls (12*D^2 MACs per
        # token) + attention scores/AV (2*T*D MACs per token), 2 FLOPs/MAC
        layer_fwd = tokens * (24.0 * d * d + 4.0 * t * d)
        # MODEL FLOPs (PaLM MFU convention): fwd + 2x bwd, NOT counting the
        # remat re-forward — recompute is implementation overhead and must
        # not inflate MFU
        flops += (L - u) * layer_fwd * 3.0

    state, metrics = step_fn(state, device_batch, key)
    float(metrics["loss"])  # D2H fetch: a true sync barrier (through the
    # axon tunnel block_until_ready can return before execution finishes)

    start = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, device_batch, jax.random.fold_in(key, i))
    float(metrics["loss"])
    elapsed = (time.perf_counter() - start) / args.steps

    n_chips = jax.device_count()
    samples_per_s = b * args.accum / elapsed
    mfu = flops / elapsed / (V5E_PEAK_BF16 * n_chips) if flops else -1.0
    print(
        json.dumps(
            {
                "metric": "pretrain_step" if args.pretrain else "train_step",
                "sec_per_step": round(elapsed, 4),
                "samples_per_sec_per_chip": round(samples_per_s / n_chips, 2),
                "batch": b,
                "frames": t,
                "compute_dtype": tcfg.compute_dtype,
                "flash_attention": cfg.encoder.use_flash_attention,
                "step_tflops": round(flops / 1e12, 2),
                "xla_counted_tflops": round(
                    (float(cost.get("flops", 0.0)) if cost else 0.0) / 1e12, 2
                ),
                "mfu_vs_v5e_peak": round(mfu, 4),
                "loss": round(float(metrics["loss"]), 3),
                "grad_norm": round(float(metrics["grad_norm"]), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
