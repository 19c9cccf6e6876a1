"""Cumulative logsumexp over the leading axis as ONE Pallas program.

The CTC prefix scorer needs two cumulative logsumexps over (T, K, S) arrays
per decode step. `lax.associative_scan` is numerically right (each prefix is
shifted by its own running max) but lowers to ~9 levels x ~4 small XLA ops
per call — ~36 op launches inside the beam while-loop, pure launch overhead
for 6 KB of data (~285 us/step measured). This kernel runs the same
Kogge-Stone recursion over a (T, C) block entirely in VMEM: the whole scan
is one program.

Identical numerics to the associative-scan formulation: the (running max,
shifted sum) pair monoid. (A column-global max + triangular matmul is NOT
equivalent — prefixes >87 nats below the column max underflow; the
flagship-scale T=375 token-exactness test is the regression guard.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.inf


def _kernel(x_ref, out_ref, *, t: int):
    m = x_ref[0]  # (T, C) running max
    s = jnp.ones_like(m)  # scaled count: sum of exp(x_j - m) over the prefix
    d = 1
    while d < t:
        pad_m = jnp.full((d,) + m.shape[1:], NEG_INF, m.dtype)
        pad_s = jnp.zeros((d,) + s.shape[1:], s.dtype)
        sm = jnp.concatenate([pad_m, m[: t - d]], axis=0)
        ss = jnp.concatenate([pad_s, s[: t - d]], axis=0)
        mm = jnp.maximum(m, sm)
        safe = jnp.maximum(mm, -3.0e38)  # guard -inf - -inf
        s = s * jnp.exp(m - safe) + ss * jnp.exp(sm - safe)
        m = mm
        d *= 2
    out_ref[0] = jnp.log(jnp.maximum(s, 1e-37)) + m


def cumlogsumexp(x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Inclusive cumulative logsumexp over axis 0 of a (T, ...) array.

    Trailing dims are flattened to one lane axis (padded to 128); safe under
    vmap (lifts to a batched grid in the same pallas call).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = x.shape[0]
    shape = x.shape
    c = 1
    for d in shape[1:]:
        c *= d
    xf = x.reshape(t, c).astype(jnp.float32)
    c_pad = max(128, -(-c // 128) * 128)
    if c_pad != c:
        xf = jnp.pad(xf, ((0, 0), (0, c_pad - c)), constant_values=NEG_INF)
    out = pl.pallas_call(
        lambda x_ref, out_ref: _kernel(x_ref, out_ref, t=t),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, t, c_pad), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, c_pad), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, t, c_pad), jnp.float32),
        interpret=interpret,
    )(xf[None])[0]
    return out[:, :c].reshape(shape)
