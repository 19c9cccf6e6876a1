"""CTC loss and label-smoothing loss with reference-equivalent semantics.

- CTC: torch.nn.CTCLoss(reduction='sum', zero_infinity=True) then divided by
  batch size (reference ctc.py:64-73) == mean of per-sample NLL with
  non-finite samples zeroed. Computed via optax.ctc_loss on padded batches.
- Label smoothing: KLDiv(log_softmax(x), smoothed one-hot) summed over
  non-padding positions, normalized by batch size (reference
  label_smoothing_loss.py:13-62, normalize_length=False).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ctc_loss(
    logits: jax.Array,  # (B, T, V) unnormalized
    logit_lengths: jax.Array,  # (B,)
    labels: jax.Array,  # (B, L) padded with any value outside valid region
    label_lengths: jax.Array,  # (B,)
    blank_id: int = 0,
) -> jax.Array:
    """Batch-mean CTC negative log-likelihood (zero_infinity semantics)."""
    b, t, _ = logits.shape
    l = labels.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(
        logits.dtype
    )
    label_paddings = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(
        logits.dtype
    )
    labels = jnp.where(label_paddings > 0, 0, labels)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings,
        labels,
        label_paddings,
        blank_id=blank_id,
    )
    # zero_infinity: torch returns inf for infeasible alignments
    # (T < L + #repeats) and zeroes them; optax instead saturates at its
    # log_epsilon, so detect infeasibility explicitly.
    valid = (jnp.arange(l - 1)[None, :] < (label_lengths[:, None] - 1))
    repeats = (jnp.logical_and(labels[:, 1:] == labels[:, :-1], valid)).sum(-1)
    feasible = logit_lengths >= label_lengths + repeats
    per_seq = jnp.where(jnp.isfinite(per_seq) & feasible, per_seq, 0.0)
    return per_seq.sum() / b


def label_smoothing_loss(
    logits: jax.Array,  # (B, L, V)
    targets: jax.Array,  # (B, L) with ignore_id padding
    smoothing: float = 0.1,
    ignore_id: int = -1,
    normalize_length: bool = False,
) -> jax.Array:
    """KL(smoothed one-hot || softmax(logits)), reference normalization."""
    b, l, v = logits.shape
    x = logits.reshape(-1, v).astype(jnp.float32)
    t = targets.reshape(-1)
    ignore = t == ignore_id
    t_safe = jnp.where(ignore, 0, t)

    logp = jax.nn.log_softmax(x, axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    # KLDiv(reduction='none') = p * (log p - logp); p has two distinct values.
    p_target = confidence
    p_other = low
    # sum over classes = sum_other p_other*(log p_other - logp) + p_t*(log p_t - logp_t)
    kl_other = p_other * (jnp.log(p_other) - logp)  # (N, V)
    target_logp = jnp.take_along_axis(logp, t_safe[:, None], axis=-1)[:, 0]
    kl_sum = (
        kl_other.sum(-1)
        - (p_other * (jnp.log(p_other) - target_logp))
        + p_target * (jnp.log(p_target) - target_logp)
    )
    kl_sum = jnp.where(ignore, 0.0, kl_sum)
    denom = jnp.maximum((~ignore).sum(), 1) if normalize_length else b
    return kl_sum.sum() / denom


def th_accuracy(
    logits: jax.Array,  # (B, L, V)
    targets: jax.Array,  # (B, L)
    ignore_id: int = -1,
) -> jax.Array:
    """Token accuracy over non-ignored positions (nets_utils.py:303)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != ignore_id
    correct = jnp.logical_and(pred == targets, mask).sum()
    return correct / jnp.maximum(mask.sum(), 1)
