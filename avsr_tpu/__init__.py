"""avsr_tpu — TPU-native audio-visual speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
AVSRCocktail reference (quanpn90/avsr): AV-HuBERT-style audio-visual
encoders, transformer decoders with joint CTC/attention decoding, conformer
ASR/VSR/AVSR families, the full audio/video data plane (log-fbank features,
mouth-ROI video transforms, augmentation), active-speaker-detection driven
chunking, speaker clustering, and data-parallel training over a
`jax.sharding.Mesh`.

Layering (bottom-up):
  core/    configs, mesh/sharding, checkpoint I/O (orbax + torch-safetensors import)
  ops/     numeric kernels: fbank, masks, CTC, attention (incl. Pallas)
  models/  flax modules: resnet lip frontend, avhubert encoder, decoder, conformer
  decode/  greedy CTC + batched joint CTC/attention beam search (lax.while_loop)
  data/    tokenizer (SPM unigram), text norm, WER, datasets, collation
  train/   train state, optimizer, loops
  frontends/ offline AV preprocessing (face det/align, ASD, clustering)
  cli/     train / evaluation entry points mirroring the reference CLI
"""

__version__ = "0.1.0"
