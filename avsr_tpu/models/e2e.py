"""End-to-end AVSR model: AV-HuBERT encoder + CTC head + attention decoder.

Re-design of the reference E2E graph
(/root/reference/src/nets/backend/e2e_asr_avhubert.py:24-159) and the
AVHubertAVSR wrapper (/root/reference/src/avhubert_avsr/avhubert_avsr_model.py:45):
joint loss = mtlalpha * ctc + (1 - mtlalpha) * label-smoothed CE, with token
accuracy reporting. All paths are statically shaped and jit in one XLA module.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avsr_tpu.core.config import AVHubertAVSRConfig
from avsr_tpu.models.avhubert import AVHubertModel
from avsr_tpu.models.decoder import DecoderCache, TransformerDecoder
from avsr_tpu.ops.ctc import ctc_loss, label_smoothing_loss, th_accuracy
from avsr_tpu.ops.masks import add_sos_eos, make_non_pad_mask, target_mask


class AVSROutput(NamedTuple):
    loss: jax.Array
    loss_ctc: jax.Array
    loss_att: jax.Array
    acc: jax.Array


class AVSRModel(nn.Module):
    """AVHubertAVSR equivalent. Methods are exposed for partial application:

    - __call__(...):         training/eval losses
    - encode(...):           encoder features (for decoding)
    - ctc_log_probs(...):    CTC head log-softmax (for greedy/prefix scoring)
    - decoder_init / decoder_step: incremental attention-decoder scoring
    """

    cfg: AVHubertAVSRConfig

    def setup(self):
        c = self.cfg
        self.encoder = AVHubertModel(c.encoder)
        self.ctc_lo = nn.Dense(c.odim)
        self.ctc_dropout = nn.Dropout(c.dropout_rate)
        if c.mtlalpha < 1:
            self.decoder = TransformerDecoder(
                odim=c.odim,
                dim=c.ddim,
                heads=c.dheads,
                units=c.dunits,
                layers=c.dlayers,
                dropout=c.dropout_rate,
                attn_dropout=c.transformer_attn_dropout_rate,
                cache_dtype=getattr(c, "decoder_cache_dtype", "float32"),
                decode_param_dtype=getattr(c, "decoder_param_dtype", "float32"),
                fused_decode_attention=getattr(c, "decode_fused_attention", False),
                fused_decode_layer=getattr(c, "decode_fused_layer", False),
            )
        if c.adim != c.ddim:
            self.proj_decoder = nn.Dense(c.ddim)

    def encode(
        self,
        audio: Optional[jax.Array],
        video: Optional[jax.Array],
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        t = (video if video is not None else audio).shape[1]
        mask = make_non_pad_mask(lengths, t) if lengths is not None else None
        return self.encoder(audio, video, mask, train=train)

    def ctc_log_probs(self, feats: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(
            self.ctc_lo(feats).astype(jnp.float32), axis=-1
        )

    def ctc_logits(self, feats: jax.Array, train: bool = False) -> jax.Array:
        return self.ctc_lo(self.ctc_dropout(feats, deterministic=not train))

    def decoder_init(
        self, memory: jax.Array, maxlen: int, beam: int = 1
    ) -> DecoderCache:
        return self.decoder.init_cache(memory, maxlen, beam)

    def decoder_step(
        self,
        y_t: jax.Array,
        pos: jax.Array,
        cache: DecoderCache,
        memory_mask: Optional[jax.Array] = None,
        lane_bias: Optional[jax.Array] = None,
    ):
        return self.decoder.step(y_t, pos, cache, memory_mask, lane_bias)

    def __call__(
        self,
        videos: jax.Array,  # (B, T, 88, 88, 1)
        audios: jax.Array,  # (B, T, 104)
        labels: jax.Array,  # (B, L) padded with -1
        video_lengths: jax.Array,  # (B,)
        label_lengths: jax.Array,  # (B,)
        train: bool = False,
    ) -> AVSROutput:
        c = self.cfg
        t = videos.shape[1]
        pad_mask = make_non_pad_mask(video_lengths, t)

        x = self.encoder(audios, videos, pad_mask, train=train)

        ctc_logits = self.ctc_logits(x, train=train)
        loss_ctc = ctc_loss(
            ctc_logits, video_lengths, labels, label_lengths, blank_id=c.blank
        )

        if c.adim != c.ddim:
            x = self.proj_decoder(x)

        ys_in, ys_out = add_sos_eos(labels, label_lengths, c.sos, c.eos, c.ignore_id)
        ys_mask = target_mask(ys_in, c.ignore_id)
        pred = self.decoder(
            ys_in, ys_mask, x, pad_mask[:, None, :], deterministic=not train
        )
        loss_att = label_smoothing_loss(
            pred, ys_out, c.lsm_weight, c.ignore_id,
            c.transformer_length_normalized_loss,
        )
        loss = c.mtlalpha * loss_ctc + (1 - c.mtlalpha) * loss_att
        acc = th_accuracy(pred, ys_out, c.ignore_id)
        return AVSROutput(loss=loss, loss_ctc=loss_ctc, loss_att=loss_att, acc=acc)
