"""Training CLI, flag-compatible with the reference script/train.py:171-188.

Runs the joint CTC/attention fine-tuning data-parallel over the TPU mesh.
Adds --synthetic_dataset for offline end-to-end runs without network/media
backends, and --data_parallel/--model_parallel mesh controls.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native AVSR training")
    p.add_argument("--streaming_dataset", action="store_true", default=False)
    p.add_argument("--include_mcorec", action="store_true", default=False)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--max_steps", type=int, default=400000)
    p.add_argument("--gradient_accumulation_steps", type=int, default=2)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--save_total_limit", type=int, default=500,
                   help="keep at most N checkpoints (reference "
                        "save_total_limit, script/train.py:280)")
    p.add_argument("--eval_steps", type=int, default=2000)
    p.add_argument("--log_interval", type=int, default=25)
    p.add_argument("--dataloader_num_workers", type=int, default=10)
    p.add_argument("--dataloader_use_processes", action="store_true", default=False,
                   help="spawn process pool for collation (GIL-free; multi-chip hosts)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=4000)
    p.add_argument("--resume_from_checkpoint", action="store_true", default=False)
    p.add_argument("--checkpoint_name", type=str, default="avsr_avhubert_ctcattn")
    p.add_argument("--model_name_or_path", type=str, default="./model-bin/avsr_cocktail")
    p.add_argument("--report_to", type=str, default="none")
    p.add_argument("--output_dir", type=str, default="./model-bin")
    # TPU-specific additions
    p.add_argument("--synthetic_dataset", action="store_true", default=False,
                   help="train on deterministic synthetic AV data (no network)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="forward/backward dtype (fp32 master weights); the "
                        "reference trains fp16 AMP — bfloat16 is the TPU "
                        "equivalent")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="data-mesh size (default: all devices)")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--multihost", action="store_true", default=False,
                   help="call jax.distributed.initialize() for multi-host "
                        "training (each host reads its own data shards)")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="encoder layer-stack unroll factor (24 = fully "
                        "unrolled; ~12%% faster steps, slower first compile)")
    p.add_argument("--scan_remat", type=str, default="none",
                   choices=["none", "dots", "full", "ffn", "ffn2", "qkv_ffn"],
                   help="encoder-layer rematerialization in backward: trade "
                        "recompute for HBM so larger per-chip batches fit")
    p.add_argument("--frontend_remat", action="store_true", default=False,
                   help="rematerialize the video ResNet frontend in backward "
                        "(its per-frame conv saves dominate HBM past B~32)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax profiler trace of steps 10-12 here")
    p.add_argument("--pretrain", action="store_true", default=False,
                   help="AV-HuBERT masked-prediction pretraining instead of "
                        "CTC/attention fine-tuning: span masks + same_seq "
                        "video corruption + cluster-target cross-entropy "
                        "(train/pretrain.py). The run's 'hubert' params "
                        "subtree loads into AVSRModel fine-tuning.")
    p.add_argument("--use_flash_attention", type=str, default="auto",
                   choices=["auto", "true", "false"],
                   help="Pallas flash attention in the encoder (fwd+bwd, "
                        "attention-prob dropout included). 'auto' = on when "
                        "running on TPU")
    return p


def main():
    args = build_parser().parse_args()

    from avsr_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from avsr_tpu.core.config import AVHubertAVSRConfig
    from avsr_tpu.core.mesh import make_mesh
    from avsr_tpu.data.collate import DataCollator
    from avsr_tpu.data.tokenizer import TextTransform
    from avsr_tpu.data.transforms import AudioTransform, VideoTransform
    from avsr_tpu.train.loop import LoopConfig, run_training
    from avsr_tpu.train.trainer import TrainConfig

    output_dir = os.path.join(args.output_dir, args.checkpoint_name)
    os.makedirs(output_dir, exist_ok=True)

    text_transform = TextTransform()

    pretrained = None
    model_cfg = AVHubertAVSRConfig(odim=text_transform.vocab_size)
    if args.model_name_or_path and os.path.exists(args.model_name_or_path):
        from avsr_tpu.core.checkpoint import load_pretrained

        print(f"Loading pretrained model from {args.model_name_or_path}")
        model_cfg, pretrained = load_pretrained(args.model_name_or_path)
    else:
        print("Training from scratch (random init)")

    if args.use_flash_attention == "auto":
        import jax

        model_cfg.encoder.use_flash_attention = jax.default_backend() == "tpu"
    else:
        model_cfg.encoder.use_flash_attention = args.use_flash_attention == "true"
    if model_cfg.encoder.use_flash_attention:
        print("Flash attention: on")
    model_cfg.encoder.scan_unroll = args.scan_unroll
    model_cfg.encoder.scan_remat = args.scan_remat
    model_cfg.encoder.frontend_remat = args.frontend_remat

    if args.synthetic_dataset:
        import jax

        from avsr_tpu.data.dataset import synthetic_samples

        n = (
            args.batch_size
            * jax.device_count()
            * args.gradient_accumulation_steps
            * (args.max_steps + 1)
        )
        train_samples = synthetic_samples(n, seed=0)
        valid_fn = lambda: synthetic_samples(  # noqa: E731
            args.batch_size * 4, seed=1
        )
        interferer = None
    else:
        from avsr_tpu.data.dataset import load_avsr_mixture, shard_for_host

        train_ds, valid_ds, interferer_ds = load_avsr_mixture(
            include_mcorec=args.include_mcorec, streaming=args.streaming_dataset
        )
        train_samples = shard_for_host(train_ds)
        valid_fn = lambda: valid_ds  # noqa: E731

        from avsr_tpu.data.dataset import InterfererPool

        # draws come from a rotating pool of pre-decoded waveforms (a
        # background thread keeps swapping in freshly decoded utterances);
        # the critical path never runs an ffmpeg decode. 256 entries of a
        # few seconds of fp32 16 kHz audio is ~100 MB of host RAM.
        interferer = InterfererPool(interferer_ds, size=256)

    collator = DataCollator(
        text_transform=text_transform,
        # uint8 crops end-to-end: 4x less host->device transfer, normalize
        # fused into the jitted step (loss_fn)
        video_transform=VideoTransform("train", device_norm=True),
        audio_transform=AudioTransform("train", sample_interferer=interferer),
        seed=11,
    )
    valid_collator = DataCollator(
        text_transform=text_transform,
        video_transform=VideoTransform("test", device_norm=True),
        audio_transform=AudioTransform("test"),
    )

    pretrain_cfg = None
    if args.pretrain:
        from avsr_tpu.train.pretrain import PretrainCollator, PretrainConfig

        pretrain_cfg = PretrainConfig()
        collator = PretrainCollator(collator, pretrain_cfg, seed=11)
        valid_collator = PretrainCollator(valid_collator, pretrain_cfg)

    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    print(f"Mesh: {dict(mesh.shape)}")

    loop_cfg = LoopConfig(
        output_dir=output_dir,
        max_steps=args.max_steps,
        batch_size=args.batch_size,
        grad_accum=args.gradient_accumulation_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        eval_steps=args.eval_steps,
        log_interval=args.log_interval,
        num_workers=args.dataloader_num_workers,
        use_process_workers=args.dataloader_use_processes,
        report_to=args.report_to,
        run_name=args.checkpoint_name,
        profile_dir=args.profile_dir,
    )
    train_cfg = TrainConfig(
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        max_steps=args.max_steps,
        grad_accum=args.gradient_accumulation_steps,
        compute_dtype=args.compute_dtype,
    )
    run_training(
        model_cfg,
        loop_cfg,
        train_samples,
        collator,
        valid_samples=valid_fn,
        valid_collator=valid_collator,
        pretrained_variables=pretrained,
        train_cfg=train_cfg,
        mesh=mesh,
        resume_from_checkpoint=args.resume_from_checkpoint,
        pretrain_cfg=pretrain_cfg,
    )


if __name__ == "__main__":
    main()
