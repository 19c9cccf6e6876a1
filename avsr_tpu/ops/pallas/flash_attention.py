"""Pallas TPU flash attention (tiled online-softmax) for encoder self-attention.

Computes softmax(q @ k^T * scale + bias) @ v without materializing the
(T, T) score matrix in HBM: the K/V sequence is streamed through VMEM in
blocks with the standard online-softmax running (max, sum, accumulator)
update. Padding enters as an additive key bias (0 valid / -inf-ish pad),
matching the encoder's masking semantics (models/avhubert.py).

Layout: q, k, v are (N=B*H, T, D) with T padded to the block size; the grid
is (N, T/block_q) and each program streams K/V blocks with a fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _flash_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  scale: float):
    # block shapes: bias (1, 1, T), q (1, block_q, D), k/v (1, T, D), o (1, block_q, D)
    t = k_ref.shape[1]
    d = q_ref.shape[2]
    block_q = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, D)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        bias = bias_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        s = s + bias[None, :]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_cur, l_cur, acc

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, t // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,  # (N, T, D)
    k: jax.Array,  # (N, T, D)
    v: jax.Array,  # (N, T, D)
    key_bias: jax.Array,  # (N, T) additive bias (0 valid, very negative pad)
    scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    n, t, d = q.shape
    if t % block_q or t % block_k:
        raise ValueError(f"sequence length {t} must be a multiple of the block size")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (n, t // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
        interpret=interpret,
    )(key_bias[:, None, :], q, k, v)


def mha_flash(
    q: jax.Array,  # (B, T, H, Dh)
    k: jax.Array,
    v: jax.Array,
    padding_mask: jax.Array | None,  # (B, T) True = valid, or None
    scale: float,
    block: int = 128,
) -> jax.Array:
    """Multi-head wrapper: (B, T, H, Dh) -> (B, T, H, Dh), T padded to block."""
    b, t, h, dh = q.shape
    pad = (-t) % block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    tp = t + pad
    if padding_mask is None:
        bias = jnp.zeros((b, tp), jnp.float32)
        if pad:
            bias = bias.at[:, t:].set(NEG_INF)
    else:
        valid = jnp.pad(padding_mask, ((0, 0), (0, pad)))
        bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)

    def to_rows(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, tp, dh)

    out = flash_attention(
        to_rows(q), to_rows(k), to_rows(v),
        jnp.repeat(bias, h, axis=0), scale=scale,
        block_q=block, block_k=block,
    )
    out = out.reshape(b, h, tp, dh).transpose(0, 2, 1, 3)
    return out[:, :t]
