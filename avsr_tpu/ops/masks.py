"""Mask and label-layout utilities (jit-friendly, static shapes).

TPU-native re-design of the reference helpers:
  - make_non_pad_mask / make_pad_mask  (nets_utils.py:64,183)
  - subsequent_mask / target_mask      (transformer/mask.py:20,41)
  - add_sos_eos                        (transformer/add_sos_eos.py:12)

The reference builds ragged lists per sample; here everything operates on
padded (B, L) int arrays + explicit lengths so the whole train step stays
inside one XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp

IGNORE_ID = -1


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B,) lengths -> (B, maxlen) bool, True on valid positions."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    return ~make_non_pad_mask(lengths, maxlen)


def subsequent_mask(size: int) -> jnp.ndarray:
    """(size, size) lower-triangular bool causal mask."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def target_mask(ys_in_pad: jnp.ndarray, ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Decoder self-attention mask: (B, L, L) = non-pad & causal."""
    ys_mask = ys_in_pad != ignore_id
    return ys_mask[:, None, :] & subsequent_mask(ys_in_pad.shape[-1])[None]


def add_sos_eos(
    ys_pad: jnp.ndarray,
    ys_lengths: jnp.ndarray,
    sos: int,
    eos: int,
    ignore_id: int = IGNORE_ID,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build decoder input/target layouts from padded labels.

    ys_pad: (B, L) labels padded with ignore_id; ys_lengths: (B,).
    Returns (ys_in, ys_out), each (B, L+1):
      ys_in  = [sos, y_1..y_n, eos, eos, ...]   (padded with eos)
      ys_out = [y_1..y_n, eos, ignore, ...]     (padded with ignore_id)
    matching the reference pad_list(ys_in, eos) / pad_list(ys_out, ignore_id).
    """
    b, l = ys_pad.shape
    pos = jnp.arange(l + 1)[None, :]
    valid = ys_pad != ignore_id
    ys_clean = jnp.where(valid, ys_pad, 0)

    ys_in = jnp.full((b, l + 1), eos, dtype=ys_pad.dtype)
    ys_in = ys_in.at[:, 0].set(sos)
    ys_in = ys_in.at[:, 1:].set(jnp.where(valid, ys_clean, eos))
    ys_in = ys_in.at[:, 0].set(sos)

    at_eos = pos == ys_lengths[:, None]
    ys_out = jnp.where(pos < ys_lengths[:, None],
                       jnp.pad(ys_clean, ((0, 0), (0, 1))),
                       jnp.where(at_eos, eos, ignore_id)).astype(ys_pad.dtype)
    return ys_in, ys_out
