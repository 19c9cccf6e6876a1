"""AV-HuBERT masked-prediction pretraining objective (TPU-native).

The reference ships the full pretraining machinery inside AVHubertModel —
input span masking (apply_input_mask, /root/reference/src/nets/backend/
backbones/avhubert.py:299), GradMultiply on the extractor features (:173,
396-404), cosine logits against learned cluster embeddings
(compute_logits:435, logit_temp 0.1) and masked/unmasked logit splits
(forward_gen:524-543) — but its entry points only ever fine-tune. This
module provides the same capability TPU-first:

- mask SAMPLING is host-side numpy (ops/span_mask.compute_mask_indices, a
  port of the reference sampler) exactly like the other data-plane
  augmentations; the jitted step receives a static-shape (B, T) bool mask
  plus a (B, T) video source-index map implementing the reference's
  'same_seq' video corruption (masked video frames are replaced by other
  frames of the SAME sequence, avhubert.py:328-342) — a take_along_axis
  instead of host-side index surgery.
- mask APPLICATION, the encoder forward, and the HuBERT criterion
  (masked/unmasked cross-entropy + feature penalty, fairseq HubertCriterion
  semantics) run inside one jitted loss.

Defaults mirror configuration_avhubert_avsr.py:113-187 (mask_prob
audio/image 0.8/0.3, lengths 10/5, masking_type='input',
selection_type='same_seq', sim_type='cosine', logit_temp 0.1,
final_dim 256, num_classes 2004, feature_grad_mult 0.1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avsr_tpu.models.avhubert import AVHubertModel
from avsr_tpu.ops.span_mask import compute_mask_indices


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    mask_prob_audio: float = 0.8
    mask_length_audio: int = 10
    mask_prob_image: float = 0.3
    mask_length_image: int = 5
    final_dim: int = 256
    num_classes: int = 2004
    logit_temp: float = 0.1
    sim_type: str = "cosine"  # 'cosine' | 'dot'
    feature_grad_mult: float = 0.1
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    feature_pen_weight: float = 0.0


def sample_pretrain_masks(
    cfg: PretrainConfig,
    batch: int,
    frames: int,
    lengths: Optional[np.ndarray] = None,
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side draw of (audio_mask, video_mask, video_src_index).

    video_src_index is identity on unmasked frames; on masked frames it
    points at a uniformly drawn OTHER frame of the same sequence — the
    'same_seq' corruption (reference avhubert.py:328-342) as a gather map.
    """
    rng = rng or np.random.RandomState()
    pad = None
    if lengths is not None:
        pad = np.arange(frames)[None, :] >= np.asarray(lengths)[:, None]
    a_mask = compute_mask_indices(
        (batch, frames), pad, cfg.mask_prob_audio, cfg.mask_length_audio,
        min_masks=2, rng=rng,
    )
    v_mask = compute_mask_indices(
        (batch, frames), pad, cfg.mask_prob_image, cfg.mask_length_image,
        min_masks=2, rng=rng,
    )
    src = np.tile(np.arange(frames, dtype=np.int32), (batch, 1))
    for b in range(batch):
        sz = frames if lengths is None else int(lengths[b])
        idx = np.where(v_mask[b])[0]
        if len(idx) and sz > 1:
            others = rng.randint(0, sz - 1, size=len(idx))
            others += others >= idx  # never map a frame onto itself
            src[b, idx] = np.minimum(others, sz - 1)
    return a_mask, v_mask, src


@jax.custom_vjp
def grad_multiply(x, scale):
    return x


def _gm_fwd(x, scale):
    return x, scale


def _gm_bwd(scale, g):
    return g * scale, None


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


class AVHubertPretrainModel(nn.Module):
    """AVHubertModel + mask embedding + projection/cluster-embedding head.

    The wrapped encoder shares the fine-tuning parameter layout, so a
    pretrained run's `hubert` subtree drops straight into AVSRModel's
    encoder for fine-tuning.
    """

    encoder_cfg: "object"  # AVHubertEncoderConfig
    cfg: PretrainConfig

    @nn.compact
    def __call__(
        self,
        audio: jax.Array,  # (B, T, 104) stacked fbank
        video: jax.Array,  # (B, T, 88, 88, 1)
        audio_mask: jax.Array,  # (B, T) bool — True = masked
        video_src_index: jax.Array,  # (B, T) int32 same_seq gather map
        targets: jax.Array,  # (B, T) int32 cluster labels
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = valid
        train: bool = True,
    ):
        c = self.cfg
        # ---- input masking (reference masking_type='input') ----
        mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (audio.shape[-1],)
        )
        audio_m = jnp.where(
            audio_mask[..., None], mask_emb.astype(audio.dtype), audio
        )
        video_m = jnp.take_along_axis(
            video, video_src_index[:, :, None, None, None], axis=1
        )
        video_mask = video_src_index != jnp.arange(video.shape[1])[None, :]

        feats = AVHubertModel(self.encoder_cfg, name="hubert")(
            audio_m, video_m, padding_mask, train=train
        )
        if c.feature_grad_mult != 1.0:
            # GradMultiply (reference avhubert.py:173): scale the gradient
            # flowing into the (expensive) feature path without changing
            # the forward value
            feats = grad_multiply(feats, c.feature_grad_mult)

        proj = nn.Dense(c.final_dim, name="final_proj")(feats)  # (B, T, F)
        label_embs = self.param(
            "label_embs",
            nn.initializers.uniform(scale=1.0),
            (c.num_classes, c.final_dim),
        )
        if c.sim_type == "cosine":
            pn = proj / jnp.maximum(
                jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-6
            )
            en = label_embs / jnp.maximum(
                jnp.linalg.norm(label_embs, axis=-1, keepdims=True), 1e-6
            )
            logits = pn @ en.T
        else:
            logits = proj @ label_embs.T
        logits = (logits / c.logit_temp).astype(jnp.float32)  # (B, T, V)

        # ---- HuBERT criterion ----
        mask_any = jnp.logical_or(audio_mask, video_mask)
        valid = (
            padding_mask
            if padding_mask is not None
            else jnp.ones(audio.shape[:2], bool)
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        m_sel = jnp.logical_and(mask_any, valid)
        u_sel = jnp.logical_and(jnp.logical_not(mask_any), valid)
        loss_m = -jnp.sum(jnp.where(m_sel, tgt_logp, 0.0)) / jnp.maximum(
            jnp.sum(m_sel), 1
        )
        loss_u = -jnp.sum(jnp.where(u_sel, tgt_logp, 0.0)) / jnp.maximum(
            jnp.sum(u_sel), 1
        )
        feature_pen = jnp.mean(jnp.square(feats.astype(jnp.float32)))
        loss = (
            c.pred_masked_weight * loss_m
            + c.pred_nomask_weight * loss_u
            + c.feature_pen_weight * feature_pen
        )
        acc_m = jnp.sum(
            jnp.where(m_sel, (jnp.argmax(logits, -1) == targets), False)
        ) / jnp.maximum(jnp.sum(m_sel), 1)
        return loss, {
            "loss": loss,
            "loss_m": loss_m,
            "loss_u": loss_u,
            "feature_pen": feature_pen,
            "acc_m": acc_m,
        }


class PretrainCollator:
    """Pretraining batches: base AV collation + host-side mask sampling +
    frame-level cluster targets.

    Wraps the fine-tuning DataCollator (same media decode/augment/fbank
    path) and appends the pretraining-only fields the jitted loss consumes:
    audio_mask, video_src_index ('same_seq' gather map) and targets.
    Targets come from the sample's 'cluster_targets' field when the dataset
    ships k-means labels (fairseq-style AV-HuBERT pretraining); otherwise a
    deterministic proxy quantizer (fixed random projection of the frame
    features -> argmax over num_classes) synthesizes learnable targets so
    offline/synthetic pretraining runs end-to-end.
    """

    def __init__(self, base, cfg: Optional[PretrainConfig] = None,
                 seed: int = 0):
        self.base = base
        self.cfg = cfg or PretrainConfig()
        self.seed = seed
        self.t_buckets = None
        self.l_buckets = None
        self._proj: Optional[np.ndarray] = None

    def __call__(self, features, group_index=None):
        self.base.t_buckets = self.t_buckets
        self.base.l_buckets = self.l_buckets
        batch = self.base(features, group_index=group_index)
        b, t = batch["videos"].shape[:2]
        lengths = batch["video_lengths"]
        seed = self.seed
        if group_index is not None:
            seed = (seed + 77_003 * (group_index + 1)) % (2**31)
        rng = np.random.RandomState(seed)
        a_mask, v_mask, src = sample_pretrain_masks(
            self.cfg, b, t, lengths, rng
        )
        if "cluster_targets" in features[0]:
            targets = np.zeros((b, t), np.int32)
            for i, f in enumerate(features):
                ct = np.asarray(f["cluster_targets"], np.int32)[:t]
                targets[i, : len(ct)] = ct
        else:
            aud = batch["audios"]
            rate = max(1, aud.shape[1] // t)
            frame = aud[:, : t * rate].reshape(b, t, -1)
            if self._proj is None or self._proj.shape[0] != frame.shape[-1]:
                pr = np.random.RandomState(12_345)
                self._proj = pr.randn(
                    frame.shape[-1], self.cfg.num_classes
                ).astype(np.float32)
            targets = np.argmax(frame @ self._proj, axis=-1).astype(np.int32)
        out = {
            "videos": batch["videos"],
            "audios": batch["audios"],
            "video_lengths": lengths,
            "audio_mask": a_mask,
            "video_src_index": src,
            "targets": targets,
        }
        return out
