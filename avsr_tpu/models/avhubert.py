"""AV-HuBERT encoder: modality feature extractors + fusion + transformer.

TPU-native re-design of the reference AVHubertModel
(/root/reference/src/nets/backend/backbones/avhubert.py:200) and its
wav2vec2-style transformer encoder (:668-767):

  audio (B,T,104) -> Linear -> (B,T,D)
  video (B,T,88,88,1) -> ResEncoder -> Linear -> (B,T,D)
  [train: whole-batch modality dropout]
  concat -> LayerNorm(2D) -> Linear(2D->D) -> dropout
  -> grouped weight-norm conv positional embedding + 24 pre-LN layers
  -> final LayerNorm

Everything is channels-last, statically shaped, and padded positions are
zeroed + masked additively so the whole encoder jits as one XLA module.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from avsr_tpu.core.config import AVHubertEncoderConfig
from avsr_tpu.models.resnet import ResEncoder
from avsr_tpu.ops.grouped_conv import grouped_conv

NEG_INF = jnp.finfo(jnp.float32).min


class ConvPositionalEmbedding(nn.Module):
    """Grouped 1D conv positional embedding with weight normalization.

    Parameters are stored in the torch weight-norm layout (weight_g (1,1,K),
    weight_v (O, I/g, K), bias (O,)) so checkpoint import is a direct copy;
    the effective kernel is materialized at trace time (fused by XLA).
    """

    dim: int
    kernel_size: int
    groups: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        o, ig, k = self.dim, self.dim // self.groups, self.kernel_size
        w_v = self.param("weight_v", nn.initializers.normal(0.02), (o, ig, k))
        w_g = self.param("weight_g", nn.initializers.ones, (1, 1, k))
        bias = self.param("bias", nn.initializers.zeros, (o,))
        # weight_norm(dim=2): normalize v over (O, I/g) per kernel position.
        norm = jnp.sqrt(jnp.sum(w_v.astype(jnp.float32) ** 2, axis=(0, 1), keepdims=True))
        w = (w_g * w_v / jnp.maximum(norm, 1e-12)).astype(x.dtype)
        # (O, I/g, K) -> conv kernel (K, I/g, O) for NWC conv; routed through
        # grouped_conv for layout-independent kernel grads under TP meshes
        # (GSPMD grouped-conv grad bug — see ops/grouped_conv.py)
        kernel = jnp.transpose(w, (2, 1, 0))
        y = grouped_conv(
            x,
            kernel,
            groups=self.groups,
            strides=(1,),
            padding=[(k // 2, k // 2)],
        )
        y = y + bias.astype(x.dtype)
        if k % 2 == 0:  # SamePadLayer: drop the trailing column
            y = y[:, :-1, :]
        return jax.nn.gelu(y, approximate=False)


class EncoderSelfAttention(nn.Module):
    """Wav2vec2-style MHA (q scaled by d_k^-0.5, all projections biased)."""

    dim: int
    heads: int
    dropout: float = 0.0
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias_mask: Optional[jax.Array],
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = valid
        deterministic: bool = True,
    ) -> jax.Array:
        d_k = self.dim // self.heads
        b, t, _ = x.shape

        def proj(name):
            return nn.Dense(self.dim, name=name)(x).reshape(b, t, self.heads, d_k)

        q = proj("q_proj")
        k = proj("k_proj")
        v = proj("v_proj")
        # names for scan_remat='qkv_ffn': saving q/k/v lets the backward
        # rerun the flash kernel (needed for its VJP residuals either way)
        # without recomputing the three input projections first
        q = checkpoint_name(q, "enc_q")
        k = checkpoint_name(k, "enc_k")
        v = checkpoint_name(v, "enc_v")

        if self.use_flash:
            # Pallas kernel with a custom VJP: used for training and
            # inference. Attention-prob dropout (reference avhubert.py:747
            # layer -> HF Wav2Vec2 attention_dropout) runs inside the kernel
            # via a pre-scaled keep mask drawn from the layer's dropout PRNG,
            # so flash training matches the reference regularization recipe.
            from avsr_tpu.ops.pallas.flash_attention import mha_flash

            drop_rng = None
            rate = 0.0
            if not deterministic and self.dropout > 0.0:
                drop_rng = self.make_rng("dropout")
                rate = self.dropout
            out = mha_flash(
                q, k, v, padding_mask, scale=d_k ** -0.5,
                dropout_rate=rate, dropout_rng=drop_rng,
            )
            out = out.reshape(b, t, self.dim)
            return nn.Dense(self.dim, name="out_proj")(out)

        q = q * (d_k ** -0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if bias_mask is not None:
            scores = scores + bias_mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-LN layer (reference AVHubertEncoderLayer, avhubert.py:747-767)."""

    cfg: AVHubertEncoderConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias_mask: Optional[jax.Array],
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        h = EncoderSelfAttention(
            c.encoder_embed_dim, c.num_attention_heads, c.attention_dropout,
            use_flash=c.use_flash_attention, name="attention",
        )(h, bias_mask, padding_mask, deterministic)
        h = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(h)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(h)
        # names for scan_remat='ffn' (save_only_these_names): the exact-GELU
        # erf chain is what makes full-remat's backward FFN fusions ~4x off
        # the MXU ideal when recomputed fused into the wgrad/dgrad matmuls
        h = checkpoint_name(h, "enc_ffn_pre")
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(c.activation_dropout, deterministic=deterministic)(h)
        h = checkpoint_name(h, "enc_ffn_act")
        h = nn.Dense(c.encoder_embed_dim, name="output_dense")(h)
        h = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(h)
        return residual + h


class _ScanEncoderLayer(EncoderLayer):
    """EncoderLayer with a lax.scan-compatible (carry, None) signature."""

    @nn.compact
    def __call__(self, x, bias_mask, padding_mask=None, deterministic=True):  # type: ignore[override]
        return super().__call__(x, bias_mask, padding_mask, deterministic), None


class AVHubertTransformer(nn.Module):
    """Conv pos-emb + N pre-LN layers + trailing LayerNorm (avhubert.py:668).

    The layer stack runs as one lax.scan over stacked parameters (leading
    layer axis) — one compiled layer body instead of N unrolled copies, which
    slashes XLA compile time and executable size for the 24-layer encoder.
    """

    cfg: AVHubertEncoderConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = valid
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        bias_mask = None
        if padding_mask is not None:
            x = x * padding_mask[..., None].astype(x.dtype)
            bias_mask = jnp.where(padding_mask, 0.0, NEG_INF)[:, None, None, :]

        pos = ConvPositionalEmbedding(
            c.encoder_embed_dim,
            c.num_conv_pos_embeddings,
            c.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(x)
        x = x + pos
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        body = _ScanEncoderLayer
        remat = getattr(c, "scan_remat", "none")
        if remat != "none":
            # trade backward-pass memory for recompute so large per-chip
            # batches fit HBM: without remat the scan stacks every layer's
            # saved intermediates (24 x O(B*T*D) buffers at flagship scale)
            if remat == "full":
                policy = None
            elif remat == "ffn":
                # save only the post-dropout FFN activation ((B, T, 4096)
                # bf16 per layer): the W2 wgrad — the worst backward fusion
                # under 'full', ~4x off MXU ideal with the erf-GELU chain
                # fused in — then reads it instead of recomputing. Saving
                # the pre-activation too (for the dgrad's gelu') OOMs 16 GB
                # HBM at B=24 by ~280 MB — unless frontend_remat frees the
                # ResNet saves; see 'ffn2'. Measured same-window at B=24:
                # slightly SLOWER than 'full' (43.6 vs 45.4 samples/s) —
                # stacking 24 x 75.5 MB through the scan costs more HBM
                # traffic than the recompute it avoids; kept as an option
                # for shapes where the trade flips
                policy = jax.checkpoint_policies.save_only_these_names(
                    "enc_ffn_act"
                )
            elif remat == "ffn2":
                # both FFN tensors: W2 wgrad reads the saved activation AND
                # the dgrad's gelu' reads the saved pre-activation, so the
                # backward recompute is only LN/attention. Needs
                # frontend_remat=True to fit 16 GB HBM at B>=24/T=384.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "enc_ffn_pre", "enc_ffn_act"
                )
            elif remat == "qkv_ffn":
                # 'ffn2' plus the q/k/v projections: the backward's flash
                # rerun starts from the saved heads, so the only recomputed
                # matmul is out_proj (~8% of layer fwd MACs vs full remat's
                # 100%). ~208 MB/layer saved at B=24/T=384; needs
                # frontend_remat=True.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "enc_q", "enc_k", "enc_v", "enc_ffn_pre", "enc_ffn_act"
                )
            else:  # 'dots' (NOTE: crashes the v5e TPU worker as of round 3)
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            body = nn.remat(
                body, prevent_cse=False, policy=policy, static_argnums=(4,)
            )
        layers = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=c.num_hidden_layers,
            unroll=min(getattr(c, "scan_unroll", 1), c.num_hidden_layers),
        )(c, name="layers")
        x, _ = layers(x, bias_mask, padding_mask, deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm")(x)


class AVHubertModel(nn.Module):
    """Full AV-HuBERT encoder: (audio, video, lengths) -> (B, T, D) features.

    Inference path matches reference forward_gen(mask=False, features_only=True)
    (avhubert.py:448-524); train adds whole-batch modality dropout (:476-482).
    """

    cfg: AVHubertEncoderConfig

    @nn.compact
    def __call__(
        self,
        audio: Optional[jax.Array],  # (B, T, 104) stacked fbank or None
        video: Optional[jax.Array],  # (B, T, 88, 88, 1) or None
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = valid
        train: bool = False,
    ) -> jax.Array:
        c = self.cfg
        d = c.encoder_embed_dim
        deterministic = not train

        if audio is not None:
            feats_a = nn.Dense(d, name="audio_proj")(audio)
        if video is not None:
            res_cls = ResEncoder
            if train and getattr(c, "frontend_remat", False):
                # recompute the per-frame conv stack in the backward instead
                # of saving its (B*T, h, w, c) activations — the dominant HBM
                # cost at large batch (see AVHubertEncoderConfig.frontend_remat)
                res_cls = nn.remat(
                    ResEncoder, static_argnums=(2,), prevent_cse=False
                )
            v = res_cls(relu_type=c.resnet_relu_type, name="video_resnet")(
                video, train
            )
            feats_v = nn.Dense(d, name="video_proj")(v)

        if audio is None:
            feats_a = jnp.zeros_like(feats_v)
        if video is None:
            feats_v = jnp.zeros_like(feats_a)

        if c.modality == "audio":
            feats_v = feats_v * 0
        elif c.modality == "video":
            feats_a = feats_a * 0
        elif train and c.modality_dropout > 0:
            # Reference draws one np.random per forward call: the whole batch
            # drops a modality together. Keep those semantics with jax PRNG.
            rng = self.make_rng("modality")
            p_mod, p_aud = jax.random.uniform(rng, (2,))
            drop = p_mod < c.modality_dropout
            drop_audio = jnp.logical_and(drop, p_aud < c.audio_dropout)
            drop_video = jnp.logical_and(drop, jnp.logical_not(p_aud < c.audio_dropout))
            feats_a = jnp.where(drop_audio, 0.0, feats_a)
            feats_v = jnp.where(drop_video, 0.0, feats_v)

        if c.modality_fuse == "concat":
            feats = jnp.concatenate([feats_a, feats_v], axis=-1)
        else:
            feats = feats_a + feats_v

        feats = nn.LayerNorm(epsilon=1e-5, name="fuse_norm")(feats)
        if c.fused_dim != d:
            feats = nn.Dense(d, name="post_extract_proj")(feats)
        feats = nn.Dropout(c.dropout_input, deterministic=deterministic)(feats)

        return AVHubertTransformer(c, name="encoder")(
            feats, padding_mask, deterministic
        )
