"""AV2Text (MuAViC): AV-HuBERT encoder + Speech2Text-style seq2seq decoder.

Re-design of the reference avhubert_muavic family
(/root/reference/src/avhubert_muavic/): the encoder is structurally the same
AV-HuBERT stack as the flagship model at d=256/12-layer scale
(avhubert.py:509-655), so avsr_tpu reuses models/avhubert.AVHubertModel.
The decoder is an HF-Speech2Text-lineage pre-LN transformer
(av_transformer_decoder.py:14-94): fairseq-style sinusoidal positions with
padding offset, scaled tied embeddings, eager attention with q-scaling —
re-implemented with fixed-shape KV-cache decoding for TPU generation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsr_tpu.core.config import AVHubertEncoderConfig
from avsr_tpu.models.avhubert import AVHubertModel
from avsr_tpu.ops.masks import make_non_pad_mask

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass
class AV2TextConfig:
    vocab_size: int = 10000
    d_model: int = 256
    decoder_layers: int = 6
    decoder_ffn_dim: int = 2048
    decoder_attention_heads: int = 4
    encoder_layers: int = 12
    encoder_ffn_dim: int = 2048
    encoder_attention_heads: int = 4
    max_target_positions: int = 1024
    scale_embedding: bool = True
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    audio_feat_dim: int = 104
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16

    def encoder_config(self) -> AVHubertEncoderConfig:
        return AVHubertEncoderConfig(
            encoder_embed_dim=self.d_model,
            num_hidden_layers=self.encoder_layers,
            num_attention_heads=self.encoder_attention_heads,
            intermediate_size=self.encoder_ffn_dim,
            audio_feat_dim=self.audio_feat_dim,
            num_conv_pos_embeddings=self.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=self.num_conv_pos_embedding_groups,
        )


def s2t_sinusoidal_table(n_pos: int, dim: int, padding_idx: int) -> jnp.ndarray:
    """fairseq-style sinusoidal table: [sin | cos] halves, padding row zeroed."""
    half = dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = jnp.arange(n_pos, dtype=jnp.float32)[:, None] * freq[None, :]
    table = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2:
        table = jnp.concatenate([table, jnp.zeros((n_pos, 1))], axis=1)
    return table.at[padding_idx].set(0.0)


class S2TAttention(nn.Module):
    """HF Speech2TextAttention: q scaled by d_k^-0.5, biased projections."""

    dim: int
    heads: int
    dropout: float = 0.0

    def setup(self):
        self.q_proj = nn.Dense(self.dim)
        self.k_proj = nn.Dense(self.dim)
        self.v_proj = nn.Dense(self.dim)
        self.out_proj = nn.Dense(self.dim)
        self.attn_drop = nn.Dropout(self.dropout)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.dim // self.heads)

    def project_kv(self, kv):
        return self._split(self.k_proj(kv)), self._split(self.v_proj(kv))

    def attend(self, query, k, v, mask, deterministic: bool = True):
        b, tq, _ = query.shape
        d_k = self.dim // self.heads
        q = self._split(self.q_proj(query) * (d_k ** -0.5))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(query.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, tq, self.dim)
        return self.out_proj(out)

    def __call__(self, query, kv, mask, deterministic: bool = True):
        k, v = self.project_kv(kv)
        return self.attend(query, k, v, mask, deterministic)


class S2TDecoderLayer(nn.Module):
    """Pre-LN Speech2Text decoder layer (self-attn, cross-attn, ReLU FFN)."""

    cfg: AV2TextConfig

    def setup(self):
        c = self.cfg
        self.self_attn = S2TAttention(c.d_model, c.decoder_attention_heads, c.attention_dropout)
        self.encoder_attn = S2TAttention(c.d_model, c.decoder_attention_heads, c.attention_dropout)
        self.self_attn_layer_norm = nn.LayerNorm()
        self.encoder_attn_layer_norm = nn.LayerNorm()
        self.final_layer_norm = nn.LayerNorm()
        self.fc1 = nn.Dense(c.decoder_ffn_dim)
        self.fc2 = nn.Dense(c.d_model)
        self.drop = nn.Dropout(c.dropout)
        self.act_drop = nn.Dropout(c.activation_dropout)

    def _ffn(self, x, deterministic):
        h = jax.nn.relu(self.fc1(x))
        h = self.act_drop(h, deterministic=deterministic)
        return self.fc2(h)

    def __call__(self, x, self_mask, memory, memory_mask, deterministic=True):
        res = x
        h = self.self_attn_layer_norm(x)
        h = self.self_attn(h, h, self_mask, deterministic)
        x = res + self.drop(h, deterministic=deterministic)

        res = x
        h = self.encoder_attn_layer_norm(x)
        h = self.encoder_attn(h, memory, memory_mask, deterministic)
        x = res + self.drop(h, deterministic=deterministic)

        res = x
        h = self.final_layer_norm(x)
        x = res + self.drop(self._ffn(h, deterministic), deterministic=deterministic)
        return x

    def step(self, x_t, pos, self_k, self_v, src_k, src_v, memory_mask):
        maxlen = self_k.shape[1]
        res = x_t
        h = self.self_attn_layer_norm(x_t)
        k_t, v_t = self.self_attn.project_kv(h)
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_t, pos, axis=1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_t, pos, axis=1)
        causal = (jnp.arange(maxlen) <= pos)[None, None, :]
        causal = jnp.broadcast_to(causal, (x_t.shape[0], 1, maxlen))
        x = res + self.self_attn.attend(h, self_k, self_v, causal)

        res = x
        h = self.encoder_attn_layer_norm(x)
        x = res + self.encoder_attn.attend(h, src_k, src_v, memory_mask)

        res = x
        x = res + self._ffn(self.final_layer_norm(x), deterministic=True)
        return x, self_k, self_v


class S2TDecoderCache(NamedTuple):
    self_k: jax.Array  # (L, B, maxlen, H, Dh)
    self_v: jax.Array
    src_k: jax.Array  # (L, B, S, H, Dh)
    src_v: jax.Array


class S2TDecoder(nn.Module):
    """Speech2Text decoder with tied-embedding LM head and KV-cache steps."""

    cfg: AV2TextConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.d_model)
        self.blocks = [S2TDecoderLayer(c) for _ in range(c.decoder_layers)]
        self.layer_norm = nn.LayerNorm()
        self.drop = nn.Dropout(c.dropout)
        self.embed_scale = math.sqrt(c.d_model) if c.scale_embedding else 1.0
        # fairseq offset: first non-pad position is padding_idx + 1
        self.pos_table = s2t_sinusoidal_table(
            c.max_target_positions + c.pad_token_id + 1, c.d_model, c.pad_token_id
        )

    def _logits(self, x):
        # lm_head tied to embed_tokens (avhubert2text.py:17-18)
        return self.embed_tokens.attend(x)

    def __call__(self, ys, memory, memory_mask=None, deterministic=True):
        """Teacher-forced: ys (B, L) -> logits (B, L, V). No pad handling in
        positions (generation-style contiguous ids)."""
        b, l = ys.shape
        c = self.cfg
        pos_ids = jnp.arange(l) + c.pad_token_id + 1
        x = self.embed_tokens(ys) * self.embed_scale + self.pos_table[pos_ids][None]
        x = self.drop(x, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((l, l), bool))[None]
        causal = jnp.broadcast_to(causal, (b, l, l))
        for blk in self.blocks:
            x = blk(x, causal, memory, memory_mask, deterministic)
        x = self.layer_norm(x)
        return self._logits(x)

    def init_cache(self, memory, maxlen):
        c = self.cfg
        b = memory.shape[0]
        h, dh = c.decoder_attention_heads, c.d_model // c.decoder_attention_heads
        src_k, src_v = [], []
        for blk in self.blocks:
            k, v = blk.encoder_attn.project_kv(memory)
            src_k.append(k)
            src_v.append(v)
        zeros = jnp.zeros((c.decoder_layers, b, maxlen, h, dh), memory.dtype)
        return S2TDecoderCache(zeros, zeros, jnp.stack(src_k), jnp.stack(src_v))

    def step(self, y_t, pos, cache, memory_mask=None):
        c = self.cfg
        x = self.embed_tokens(y_t)[:, None, :] * self.embed_scale
        x = x + jax.lax.dynamic_slice_in_dim(
            self.pos_table, pos + c.pad_token_id + 1, 1, axis=0
        )[None]
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            x, k, v = blk.step(
                x, pos, cache.self_k[i], cache.self_v[i],
                cache.src_k[i], cache.src_v[i], memory_mask,
            )
            new_k.append(k)
            new_v.append(v)
        x = self.layer_norm(x[:, 0])
        logits = self._logits(x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, cache._replace(self_k=jnp.stack(new_k), self_v=jnp.stack(new_v))


class AV2TextModel(nn.Module):
    """Full MuAViC model with encode / decoder scoring / generation support."""

    cfg: AV2TextConfig

    def setup(self):
        self.encoder = AVHubertModel(self.cfg.encoder_config())
        self.decoder = S2TDecoder(self.cfg)

    def encode(self, audio, video, lengths=None, train: bool = False):
        t = (video if video is not None else audio).shape[1]
        mask = make_non_pad_mask(lengths, t) if lengths is not None else None
        return self.encoder(audio, video, mask, train=train)

    def decoder_init(self, memory, maxlen):
        return self.decoder.init_cache(memory, maxlen)

    def decoder_step(self, y_t, pos, cache, memory_mask=None):
        return self.decoder.step(y_t, pos, cache, memory_mask)

    def __call__(self, audios, videos, decoder_input_ids, lengths=None,
                 train: bool = False):
        """Teacher-forced logits (B, L, V) — the HF forward equivalent."""
        memory = self.encode(audios, videos, lengths, train)
        mem_mask = None
        if lengths is not None:
            mem_mask = make_non_pad_mask(lengths, memory.shape[1])[:, None, :]
        return self.decoder(
            decoder_input_ids, memory, mem_mask, deterministic=not train
        )
