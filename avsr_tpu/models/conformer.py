"""Conformer encoders + AV/A/V E2E models (auto_avsr / auto_asr / auto_vsr).

Re-design of the reference conformer stack:
  - encoder:        src/nets/backend/transformer/encoder.py:46
  - layer:          src/nets/backend/transformer/encoder_layer.py:18 (macaron
                    FFN x0.5, rel-pos MHA, conv module GLU/depthwise/BN/swish)
  - rel-pos attn:   src/nets/backend/transformer/attention.py (RelPosition*)
  - rel-pos embed:  src/nets/backend/transformer/embedding.py:153 (2T-1 window)
  - video frontend: backbones/conv3d_extractor.py (Conv3D + ResNet-18, swish)
  - audio frontend: backbones/conv1d_extractor.py (raw waveform ResNet1D,
                    640x downsample to 25 Hz)
  - fusion:         nets_utils.MLPHead (Linear-BN-ReLU-Linear, 8192 hidden)
  - E2E graphs:     e2e_asr_conformer_av.py:23 / e2e_asr_conformer.py:22

The transformer decoder, CTC and label-smoothing losses are shared with the
AV-HuBERT family (models/decoder.py, ops/ctc.py). All layouts channels-last.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsr_tpu.models.decoder import LN_EPS, TransformerDecoder
from avsr_tpu.models.resnet import PReLU, ResNetTrunk, StemConv3D, _batch_norm, _relu_factory
from avsr_tpu.ops.ctc import ctc_loss, label_smoothing_loss, th_accuracy
from avsr_tpu.ops.grouped_conv import GroupedConv
from avsr_tpu.ops.masks import add_sos_eos, make_non_pad_mask, target_mask

NEG_INF = jnp.finfo(jnp.float32).min


def rel_positional_encoding(t: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 2T-1, d) relative position table, positions T-1 .. -(T-1)."""
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    pe_pos = jnp.zeros((t, d_model), jnp.float32)
    pe_pos = pe_pos.at[:, 0::2].set(jnp.sin(pos * div))
    pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(pos * div))
    pe_neg = jnp.zeros((t, d_model), jnp.float32)
    pe_neg = pe_neg.at[:, 0::2].set(jnp.sin(-pos * div))
    pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-pos * div))
    pe = jnp.concatenate([jnp.flip(pe_pos, 0), pe_neg[1:]], axis=0)
    return pe[None].astype(dtype)


class RelPositionAttention(nn.Module):
    """Transformer-XL style rel-pos MHA (attention.py RelPosition..., 'latest')."""

    dim: int
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic: bool = True):
        b, t, _ = x.shape
        h, d_k = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, name="linear_q")(x).reshape(b, t, h, d_k)
        k = nn.Dense(self.dim, name="linear_k")(x).reshape(b, t, h, d_k)
        v = nn.Dense(self.dim, name="linear_v")(x).reshape(b, t, h, d_k)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, h, d_k)  # (1, 2T-1, H, Dk)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, d_k))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, d_k))

        ac = jnp.einsum("bqhd,bkhd->bhqk", q + u[None, None], k)
        bd = jnp.einsum("bqhd,bkhd->bhqk", q + w[None, None], jnp.broadcast_to(p, (b,) + p.shape[1:]))
        # rel_shift: (B,H,T,2T-1) -> (B,H,T,T), keeping positions 0..T-1
        zero = jnp.zeros(bd.shape[:3] + (1,), bd.dtype)
        padded = jnp.concatenate([zero, bd], axis=-1)  # (B,H,T,2T)
        padded = padded.reshape(b, h, 2 * t, t)
        bd = padded[:, :, 1:].reshape(b, h, t, 2 * t - 1)[..., :t]

        scores = (ac + bd) / math.sqrt(d_k)
        if mask is not None:
            m = mask[:, None, :, :]
            scores = jnp.where(m, scores, NEG_INF)
            attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out)


class ConvolutionModule(nn.Module):
    """Conformer conv module: pointwise-GLU, depthwise k=31, BN, swish
    (convolution.py:164)."""

    dim: int
    kernel: int = 31

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(2 * self.dim, (1,), name="pointwise_conv1")(x)
        h = jax.nn.glu(h, axis=-1)
        # GroupedConv: same params as nn.Conv, TP-safe kernel grads
        # (GSPMD grouped-conv grad bug — see ops/grouped_conv.py)
        h = GroupedConv(
            self.dim,
            (self.kernel,),
            padding=[(self.kernel // 2, self.kernel // 2)],
            feature_group_count=self.dim,
            name="depthwise_conv",
        )(h)
        h = _batch_norm(train, "norm")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.dim, (1,), name="pointwise_conv2")(h)


class FeedForward(nn.Module):
    dim: int
    units: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = jax.nn.relu(nn.Dense(self.units, name="w_1")(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, name="w_2")(h)


class ConformerLayer(nn.Module):
    """Macaron FFN + rel-MHA + conv module + FFN + final LN
    (encoder_layer.py:18, macaron & cnn enabled)."""

    dim: int
    heads: int
    units: int
    dropout: float
    attn_dropout: float
    cnn_kernel: int = 31
    macaron: bool = True
    use_cnn: bool = True

    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic: bool = True, train: bool = False):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.macaron:
            res = x
            h = nn.LayerNorm(epsilon=LN_EPS, name="norm_ff_macaron")(x)
            h = FeedForward(self.dim, self.units, self.dropout, name="feed_forward_macaron")(h, deterministic)
            x = res + 0.5 * drop(h)

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm_mha")(x)
        h = RelPositionAttention(self.dim, self.heads, self.attn_dropout, name="self_attn")(
            h, pos_emb, mask, deterministic
        )
        x = res + drop(h)

        if self.use_cnn:
            res = x
            h = nn.LayerNorm(epsilon=LN_EPS, name="norm_conv")(x)
            h = ConvolutionModule(self.dim, self.cnn_kernel, name="conv_module")(h, train)
            x = res + drop(h)

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm_ff")(x)
        h = FeedForward(self.dim, self.units, self.dropout, name="feed_forward")(h, deterministic)
        scale = 0.5 if self.macaron else 1.0
        x = res + scale * drop(h)

        if self.use_cnn:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm_final")(x)
        return x


class _ScanConformerLayer(ConformerLayer):
    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic=True, train=False):  # type: ignore[override]
        return super().__call__(x, pos_emb, mask, deterministic, train), None


class Conv3dResNetFrontend(nn.Module):
    """Video frontend (conv3d_extractor.py): Conv3D stem (Swish) + ResNet-18."""

    relu_type: str = "swish"

    @nn.compact
    def __call__(self, video, train: bool = False):
        b, t = video.shape[:2]
        # temporal-fold 2D formulation of the Conv3D stem (see
        # resnet.StemConv3D for why the direct 3D conv is pathological on TPU)
        x = StemConv3D(name="frontend_conv")(video)
        x = _batch_norm(train, "frontend_bn")(x)
        x = jax.nn.silu(x) if self.relu_type == "swish" else PReLU(64, name="frontend_prelu")(x)
        x = nn.max_pool(
            x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
        )
        h, w, c = x.shape[2:]
        x = x.reshape(b * t, h, w, c)
        feats = ResNetTrunk(relu_type=self.relu_type, name="trunk")(x, train=train)
        return feats.reshape(b, t, -1)


class BasicBlock1D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: jax.nn.silu(v) if self.relu_type == "swish" else jax.nn.relu(v)  # noqa: E731
        res = x
        h = nn.Conv(self.planes, (3,), strides=(self.stride,), padding=1,
                    use_bias=False, name="conv1")(x)
        h = _batch_norm(train, "bn1")(h)
        h = act(h)
        h = nn.Conv(self.planes, (3,), padding=1, use_bias=False, name="conv2")(h)
        h = _batch_norm(train, "bn2")(h)
        if self.downsample:
            res = nn.Conv(self.planes, (1,), strides=(self.stride,),
                          use_bias=False, name="downsample_conv")(x)
            res = _batch_norm(train, "downsample_bn")(res)
        return act(h + res)


class Conv1dResNetFrontend(nn.Module):
    """Audio frontend (conv1d_extractor.py): raw wave -> 512-d at 25 Hz."""

    relu_type: str = "swish"

    @nn.compact
    def __call__(self, wave, train: bool = False):
        # wave: (B, T, 1); trim to multiple of 640 (Conv1dResNet.forward)
        b, t, _ = wave.shape
        wave = wave[:, : t // 640 * 640]
        x = nn.Conv(64, (80,), strides=(4,), padding=[(38, 38)],
                    use_bias=False, name="conv1")(wave)
        x = _batch_norm(train, "bn1")(x)
        x = jax.nn.silu(x)
        inplanes = 64
        for stage, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if stage == 0 else 2
            for blk in range(2):
                s = stride if blk == 0 else 1
                need_ds = blk == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock1D(planes, s, need_ds, self.relu_type,
                                 name=f"layer{stage + 1}_{blk}")(x, train)
                inplanes = planes
        # AvgPool1d(kernel=20, stride=20)
        t_out = x.shape[1] // 20
        x = x[:, : t_out * 20].reshape(b, t_out, 20, -1).mean(axis=2)
        return x


class ConformerEncoder(nn.Module):
    """Frontend + Linear(512->adim) + rel-pos + N conformer layers + LN."""

    dim: int = 768
    heads: int = 12
    units: int = 3072
    layers: int = 12
    dropout: float = 0.1
    attn_dropout: float = 0.1
    cnn_kernel: int = 31
    input_layer: str = "conv3d"  # 'conv3d' | 'conv1d' | 'none'
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, xs, mask=None, deterministic: bool = True, train: bool = False):
        """xs: video (B,T,88,88,1) or waveform (B,T,1) or features (B,T,512).

        mask: (B, 1, T_out) attention mask (True = valid) or None.
        Returns (B, T_out, dim).
        """
        if self.input_layer == "conv3d":
            xs = Conv3dResNetFrontend(self.relu_type, name="frontend")(xs, train)
        elif self.input_layer == "conv1d":
            xs = Conv1dResNetFrontend(self.relu_type, name="frontend")(xs, train)
        x = nn.Dense(self.dim, name="embed")(xs)
        x = x * math.sqrt(self.dim)
        t = x.shape[1]
        pos_emb = rel_positional_encoding(t, self.dim, x.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        pos_emb = nn.Dropout(self.dropout, deterministic=deterministic)(pos_emb)

        layer_stack = nn.scan(
            _ScanConformerLayer,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.layers,
        )(
            self.dim, self.heads, self.units, self.dropout, self.attn_dropout,
            self.cnn_kernel, name="layers",
        )
        x, _ = layer_stack(x, pos_emb, mask, deterministic, train)
        return nn.LayerNorm(epsilon=LN_EPS, name="after_norm")(x)


class MLPHead(nn.Module):
    """AV fusion head: Linear -> BatchNorm -> ReLU -> Linear (nets_utils.py:505)."""

    hdim: int
    odim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hdim, name="fc1")(x)
        h = _batch_norm(train, "bn1")(h)
        h = jax.nn.relu(h)
        return nn.Dense(self.odim, name="fc2")(h)


class ConformerOutput(NamedTuple):
    loss: jax.Array
    loss_ctc: jax.Array
    loss_att: jax.Array
    acc: jax.Array


class ConformerConfigMixin:
    pass


class ConformerAVSR(nn.Module):
    """auto_avsr E2E: conformer video + conformer audio + MLP fusion
    (e2e_asr_conformer_av.py:23)."""

    odim: int = 5049
    adim: int = 768
    aheads: int = 12
    eunits: int = 3072
    elayers: int = 12
    ddim: int = 768
    dheads: int = 12
    dunits: int = 3072
    dlayers: int = 6
    fusion_hdim: int = 8192
    dropout: float = 0.1
    attn_dropout: float = 0.1
    cnn_kernel: int = 31
    lsm_weight: float = 0.1
    mtlalpha: float = 0.1
    # fused Pallas decode-step self-attention (lazy-reorder beam only)
    decode_fused_attention: bool = False
    decode_fused_layer: bool = False

    @property
    def sos(self):
        return self.odim - 1

    eos = sos

    @property
    def blank(self):
        return 0

    def setup(self):
        self.encoder = ConformerEncoder(
            self.adim, self.aheads, self.eunits, self.elayers,
            self.dropout, self.attn_dropout, self.cnn_kernel,
            input_layer="conv3d",
        )
        self.aux_encoder = ConformerEncoder(
            self.adim, self.aheads, self.eunits, self.elayers,
            self.dropout, self.attn_dropout, self.cnn_kernel,
            input_layer="conv1d",
        )
        self.fusion = MLPHead(self.fusion_hdim, self.adim)
        self.ctc_lo = nn.Dense(self.odim)
        self.ctc_drop = nn.Dropout(self.dropout)
        self.decoder = TransformerDecoder(
            odim=self.odim, dim=self.ddim, heads=self.dheads,
            units=self.dunits, layers=self.dlayers,
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            fused_decode_attention=self.decode_fused_attention,
            fused_decode_layer=self.decode_fused_layer,
        )

    def encode(self, audios, videos, lengths=None, train: bool = False):
        """audios raw waveform (B,T*640,1), videos (B,T,88,88,1).

        Argument order (audio, video) is uniform across model families so the
        Recognizer drives any of them.
        """
        deterministic = not train
        vmask = None
        if lengths is not None:
            vmask = make_non_pad_mask(lengths, videos.shape[1])[:, None, :]
        video_feat = self.encoder(videos, vmask, deterministic, train)
        audio_feat = self.aux_encoder(audios, vmask, deterministic, train)
        fused = self.fusion(
            jnp.concatenate([video_feat, audio_feat], axis=-1), train
        )
        return fused

    def ctc_log_probs(self, feats):
        return jax.nn.log_softmax(self.ctc_lo(feats).astype(jnp.float32), axis=-1)

    def ctc_logits(self, feats, train: bool = False):
        return self.ctc_lo(self.ctc_drop(feats, deterministic=not train))

    def decoder_init(self, memory, maxlen, beam: int = 1):
        return self.decoder.init_cache(memory, maxlen, beam)

    def decoder_step(self, y_t, pos, cache, memory_mask=None, lane_bias=None):
        return self.decoder.step(y_t, pos, cache, memory_mask, lane_bias)

    def __call__(self, videos, audios, labels, video_lengths, label_lengths,
                 train: bool = False):
        x = self.encode(audios, videos, video_lengths, train)
        logits = self.ctc_logits(x, train)
        loss_ctc = ctc_loss(logits, video_lengths, labels, label_lengths)
        ys_in, ys_out = add_sos_eos(labels, label_lengths, self.sos, self.sos)
        ys_mask = target_mask(ys_in)
        pad_mask = make_non_pad_mask(video_lengths, x.shape[1])
        pred = self.decoder(ys_in, ys_mask, x, pad_mask[:, None, :],
                            deterministic=not train)
        loss_att = label_smoothing_loss(pred, ys_out, self.lsm_weight)
        loss = self.mtlalpha * loss_ctc + (1 - self.mtlalpha) * loss_att
        return ConformerOutput(loss, loss_ctc, loss_att,
                               th_accuracy(pred, ys_out))


class ConformerASR(nn.Module):
    """auto_asr / auto_vsr single-modality E2E (e2e_asr_conformer.py:22)."""

    odim: int = 5049
    adim: int = 768
    aheads: int = 12
    eunits: int = 3072
    elayers: int = 12
    ddim: int = 768
    dheads: int = 12
    dunits: int = 3072
    dlayers: int = 6
    dropout: float = 0.1
    attn_dropout: float = 0.1
    cnn_kernel: int = 31
    lsm_weight: float = 0.1
    mtlalpha: float = 0.1
    # fused Pallas decode-step self-attention (lazy-reorder beam only)
    decode_fused_attention: bool = False
    decode_fused_layer: bool = False
    input_layer: str = "conv1d"  # 'conv1d' (ASR) | 'conv3d' (VSR)

    @property
    def sos(self):
        return self.odim - 1

    eos = sos

    def setup(self):
        self.encoder = ConformerEncoder(
            self.adim, self.aheads, self.eunits, self.elayers,
            self.dropout, self.attn_dropout, self.cnn_kernel,
            input_layer=self.input_layer,
        )
        self.ctc_lo = nn.Dense(self.odim)
        self.ctc_drop = nn.Dropout(self.dropout)
        self.decoder = TransformerDecoder(
            odim=self.odim, dim=self.ddim, heads=self.dheads,
            units=self.dunits, layers=self.dlayers,
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            fused_decode_attention=self.decode_fused_attention,
            fused_decode_layer=self.decode_fused_layer,
        )

    def encode(self, xs, lengths=None, train: bool = False):
        deterministic = not train
        mask = None
        out_len = xs.shape[1] // 640 if self.input_layer == "conv1d" else xs.shape[1]
        if lengths is not None:
            out_lens = lengths // 640 if self.input_layer == "conv1d" else lengths
            mask = make_non_pad_mask(out_lens, out_len)[:, None, :]
        return self.encoder(xs, mask, deterministic, train)

    def ctc_log_probs(self, feats):
        return jax.nn.log_softmax(self.ctc_lo(feats).astype(jnp.float32), axis=-1)

    def ctc_logits(self, feats, train: bool = False):
        return self.ctc_lo(self.ctc_drop(feats, deterministic=not train))

    def decoder_init(self, memory, maxlen, beam: int = 1):
        return self.decoder.init_cache(memory, maxlen, beam)

    def decoder_step(self, y_t, pos, cache, memory_mask=None, lane_bias=None):
        return self.decoder.step(y_t, pos, cache, memory_mask, lane_bias)

    def __call__(self, xs, labels, lengths, label_lengths, train: bool = False):
        x = self.encode(xs, lengths, train)
        out_lens = lengths // 640 if self.input_layer == "conv1d" else lengths
        logits = self.ctc_logits(x, train)
        loss_ctc = ctc_loss(logits, out_lens, labels, label_lengths)
        ys_in, ys_out = add_sos_eos(labels, label_lengths, self.sos, self.sos)
        ys_mask = target_mask(ys_in)
        pad_mask = make_non_pad_mask(out_lens, x.shape[1])
        pred = self.decoder(ys_in, ys_mask, x, pad_mask[:, None, :],
                            deterministic=not train)
        loss_att = label_smoothing_loss(pred, ys_out, self.lsm_weight)
        loss = self.mtlalpha * loss_ctc + (1 - self.mtlalpha) * loss_att
        return ConformerOutput(loss, loss_ctc, loss_att,
                               th_accuracy(pred, ys_out))
