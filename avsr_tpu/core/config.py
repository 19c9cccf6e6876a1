"""Model configurations (dataclasses, HF-config.json-field-compatible).

Field names follow the reference's HF configs so released checkpoints'
``config.json`` files load directly:
  - AVHubertAVSRConfig: /root/reference/src/avhubert_avsr/configuration_avhubert_avsr.py:15
  - decoder/CTC dims:   /root/reference/src/nets/backend/e2e_asr_avhubert.py:24
Only fields that affect the computation graph are kept; unknown json fields
are ignored on load.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict


@dataclass
class AVHubertEncoderConfig:
    """AV-HuBERT encoder (wav2vec2-style transformer over fused AV features)."""

    encoder_embed_dim: int = 1024  # hidden size
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    audio_feat_dim: int = 104
    modality_fuse: str = "concat"  # 'concat' | 'add'
    modality: str = "av"  # 'av' | 'audio' | 'video'
    modality_dropout: float = 0.5
    audio_dropout: float = 0.5
    resnet_relu_type: str = "prelu"
    # train-time dropouts
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    layerdrop: float = 0.0
    # Pallas flash-attention for encoder self-attention (forward + custom-VJP
    # backward, so it serves both inference and training; attention-prob
    # dropout runs inside the kernel from the layer's dropout PRNG, matching
    # the reference's attention_dropout=0.1 recipe).
    use_flash_attention: bool = False
    # lax.scan unroll factor for the layer stack: 1 = pure scan (fastest
    # compile), num_hidden_layers = fully unrolled body (lets XLA schedule
    # across layers; measured faster at train time on TPU)
    scan_unroll: int = 1
    # rematerialization of the scanned encoder layer in the backward pass:
    # "none" saves every layer's intermediates (fastest per step, OOMs past
    # per-chip batch ~8 at T=384 on 16 GB HBM), "dots" saves matmul outputs
    # only (crashes the v5e TPU worker as of round 3 — libtpu fault),
    # "full" recomputes the whole layer body (max batch headroom at +1/3
    # encoder FLOPs), "ffn" is full except the post-GELU (B, T, 4096) FFN
    # activation whose erf-GELU recompute dominates full's backward fusions,
    # "ffn2" saves both FFN tensors (pre + post activation), "qkv_ffn"
    # additionally saves the q/k/v heads so the backward recomputes only
    # LayerNorms + out_proj (+ the flash kernel rerun). ffn2/qkv_ffn need
    # frontend_remat=True to fit 16 GB HBM at B>=24/T=384 — the
    # jax.checkpoint memory/FLOPs trade at decreasing recompute cost.
    scan_remat: str = "none"
    # rematerialize the video ResNet frontend in the backward pass: its
    # per-frame conv activations dominate HBM at large batch (B=48, T=384:
    # ~15 GB of (B*T, h, w, c) saves vs ~0.9 GB for the rematted
    # transformer), while its forward is a small fraction of step FLOPs.
    # Turning this on is what makes per-chip batches >32 fit 16 GB HBM.
    frontend_remat: bool = False

    @property
    def fused_dim(self) -> int:
        return (
            2 * self.encoder_embed_dim
            if self.modality_fuse == "concat"
            else self.encoder_embed_dim
        )


@dataclass
class AVHubertAVSRConfig:
    """Full E2E model: AVHubert encoder + CTC head + transformer decoder."""

    odim: int = 5049
    adim: int = 1024  # encoder output dim
    ddim: int = 1024  # decoder dim
    dheads: int = 16
    dunits: int = 3072
    dlayers: int = 6
    dropout_rate: float = 0.1
    transformer_attn_dropout_rate: float = 0.1
    lsm_weight: float = 0.1
    transformer_length_normalized_loss: bool = False
    mtlalpha: float = 0.1
    # decode-time KV cache storage dtype ('float32' | 'bfloat16')
    decoder_cache_dtype: str = "float32"
    # decode-path weight/activation dtype (bfloat16 for fast serving;
    # softmax and log-softmax stay fp32)
    decoder_param_dtype: str = "float32"
    # fused Pallas decode-step self-attention (in-place KV row writes +
    # prefix-bounded reads); requires the lazy-reorder beam search
    decode_fused_attention: bool = False
    # ONE Pallas program per decoder layer per decode step (norm+QKV+
    # self-attn+cross-attn+FFN, VMEM-resident weights); supersedes
    # decode_fused_attention and also requires the lazy-reorder beam search
    decode_fused_layer: bool = False
    encoder: AVHubertEncoderConfig = field(default_factory=AVHubertEncoderConfig)

    @property
    def sos(self) -> int:
        return self.odim - 1

    @property
    def eos(self) -> int:
        return self.odim - 1

    @property
    def blank(self) -> int:
        return 0

    @property
    def ignore_id(self) -> int:
        return -1

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "AVHubertAVSRConfig":
        """Build from a (possibly reference-format) config.json dict."""
        enc_fields = {f.name for f in dataclasses.fields(AVHubertEncoderConfig)}
        top_fields = {f.name for f in dataclasses.fields(cls)} - {"encoder"}
        enc = AVHubertEncoderConfig(
            **{k: v for k, v in d.items() if k in enc_fields}
        )
        top = {k: v for k, v in d.items() if k in top_fields}
        return cls(encoder=enc, **top)

    @classmethod
    def from_json(cls, path: str) -> "AVHubertAVSRConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        enc = d.pop("encoder")
        d.update(enc)
        return d

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)
