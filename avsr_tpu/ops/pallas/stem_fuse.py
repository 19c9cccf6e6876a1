"""Fused video-stem tail: BatchNorm + PReLU + 3x3/s2 MaxPool in Pallas.

The lip-reading frontend (models/resnet.py, re-design of the reference
ResEncoder /root/reference/src/nets/backend/backbones/resnet.py:126) applies
BN -> PReLU -> MaxPool3D(1,3,3)/s(1,2,2) to the stem conv output — a
(B*T, 44, 44, 64) tensor that is 2.28 GB at the flagship train shape
(B=24, T=384). Under XLA these lower to four separate HBM passes plus a
select-and-scatter backward and remat copies: ~28 ms forward + ~28 ms
backward of an ~11 ms memory-bound floor (profiled round 4,
tools/profile_train.py). This module fuses each direction into two passes:

forward   pass 1: per-channel batch sum/sumsq          (read x once)
          pass 2: normalize + PReLU + maxpool          (read x, write x/4)
backward  pass 1: recompute y, route pool grads, emit
                  dz and the three channel reductions  (read x+dy, write dz)
          pass 2: dx from dz and the global sums       (read x+dz, write dx)

Total traffic ~6.3 ms fwd + ~14.6 ms bwd at B=24 — roughly a 3x cut.

Semantics match the unfused flax composition exactly (same f32 stat math,
biased batch variance, PReLU on the normalized value, pool-gradient routed
to the first maximum in row-major window order like XLA select-and-scatter);
`reference()` is the jnp twin used on CPU and by the parity tests.

Pooling is fixed at kernel 3x3, stride 2, padding 1 (the only config the
stem uses); H and W must be even so out = in/2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -3.0e38  # -inf stand-in that survives bf16/f32 max math

try:
    from jax.experimental.pallas import tpu as _pltpu

    _BWD_PARAMS = _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    # The forward kernels need a raised scoped-vmem cap too: Mosaic's stack
    # allocator gives each pool/normalize intermediate its own slot, and at
    # the serving shape (N=12064, 44x44x64, nb=8) the _apply body measures
    # 19.01 MB against the 18.44 MB default — the exact compile failure
    # recorded in BENCH_r04.json (rc=1). 64 MB leaves headroom without
    # approaching the 128 MB physical VMEM.
    _FWD_PARAMS = _pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
except Exception:  # pragma: no cover - CPU-only environments
    _BWD_PARAMS = None
    _FWD_PARAMS = None


def _resolve_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# pooling helpers on one (H, W, C) frame value (f32), H/W even
# ---------------------------------------------------------------------------


def _pool_candidates(y):
    """The 9 window candidates in row-major scan order.

    Returns a list of (H/2, W/2, C) arrays where entry k = 3*i + j is the
    value at padded offset (row 2oh+i, col 2ow+j) — i.e. original
    (2oh+i-1, 2ow+j-1) — matching the select-and-scatter scan order XLA
    uses for max-pool gradients.

    Strided slices on >2D values fail Mosaic lowering ("Only 2D gather is
    supported"; probed on v5e), so every x[0::2] here is spelled as a
    split-reshape plus a static integer index, which lowers fine.
    """
    h, w, c = y.shape
    hh, wh = h // 2, w // 2
    yp = jnp.pad(y, ((1, 1), (1, 1), (0, 0)), constant_values=NEG)
    ypr = yp.reshape(hh + 1, 2, w + 2, c)
    rows = [ypr[:hh, 0], ypr[:hh, 1], ypr[1:, 0]]  # padded rows 2oh+{0,1,2}
    out = []
    for r in rows:
        rc = r.reshape(hh, wh + 1, 2, c)
        out.extend([rc[:, :wh, 0], rc[:, :wh, 1], rc[:, 1:, 0]])
    return out


def _pool_max_frame(y):
    """3x3/s2/p1 max pool: (H, W, C) -> (H/2, W/2, C)."""
    return functools.reduce(jnp.maximum, _pool_candidates(y))


def _pool_bwd_frame(y, dout):
    """Route dout back through the pool: (H/2,W/2,C)+(H,W,C) -> dy (H,W,C).

    Gradient goes to the FIRST maximum in row-major window order (ties),
    mirroring lax select-and-scatter / flax nn.max_pool VJP.
    """
    h, w, cch = y.shape
    cands = _pool_candidates(y)
    winmax = functools.reduce(jnp.maximum, cands)
    prev = jnp.full_like(winmax, NEG)
    grads = []  # E_k = dout where candidate k is the first max
    for ck in cands:
        hot = (ck == winmax) & (prev < winmax)
        grads.append(jnp.where(hot, dout, 0.0))
        prev = jnp.maximum(prev, ck)
    # scatter back: candidate k=(i,j) at output (oh,ow) came from padded
    # (2oh+i, 2ow+j). Build the padded (H+2, W+2, C) gradient by summing
    # per-parity planes, then crop the pad ring.
    hh, wh = h // 2, w // 2

    def place(e, a, b):  # into (hh+1, wh+1, C) zeros at offset (a, b)
        return jnp.pad(e, ((a, 1 - a), (b, 1 - b), (0, 0)))

    # padded row 2oh+i: parity p=(i&1), plane row index oh + (i>>1)
    planes = [[0.0, 0.0], [0.0, 0.0]]
    for k, e in enumerate(grads):
        i, j = divmod(k, 3)
        planes[i & 1][j & 1] = (
            planes[i & 1][j & 1] + place(e, i >> 1, j >> 1)
        )
    # interleave parity planes back to (H+2, W+2, C)
    c0 = jnp.stack([planes[0][0], planes[0][1]], axis=2)  # (hh+1, wh+1, 2, C)
    c1 = jnp.stack([planes[1][0], planes[1][1]], axis=2)
    full = jnp.stack([c0, c1], axis=1)  # (hh+1, 2, wh+1, 2, C)
    full = full.reshape(h + 2, w + 2, cch)
    return full[1 : h + 1, 1 : w + 1]


# ---------------------------------------------------------------------------
# kernels (grid over N-blocks; params packed into one (8, C) f32 operand)
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, out_ref):
    # NOTE all frame loops here are lax.fori_loop, not Python range: Mosaic
    # stack-allocates each unrolled iteration's temporaries separately, and
    # the per-frame f32 intermediates (~5-10 MB) blow the 16 MB scoped-vmem
    # limit when multiplied by the block size (measured 41.5 MB at nb=4)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    nb, h, w, c = x_ref.shape

    def body(f, carry):
        s, q = carry
        xa = x_ref[f].astype(jnp.float32).reshape(h * w, c)
        return (
            s + jnp.sum(xa, axis=0, keepdims=True),
            q + jnp.sum(xa * xa, axis=0, keepdims=True),
        )

    z = jnp.zeros((1, c), jnp.float32)
    s, q = jax.lax.fori_loop(0, nb, body, (z, z))
    out_ref[0:1] = out_ref[0:1] + s
    out_ref[1:2] = out_ref[1:2] + q


def _apply_kernel(x_ref, p_ref, o_ref):
    # p rows: 0=mean 1=rstd 2=scale 3=bias 4=alpha
    g = (p_ref[2:3] * p_ref[1:2]).reshape(1, 1, -1)
    b = (p_ref[3:4] - p_ref[0:1] * p_ref[2:3] * p_ref[1:2]).reshape(1, 1, -1)
    al = p_ref[4:5].reshape(1, 1, -1)
    nb = x_ref.shape[0]

    def body(f, _):
        z = x_ref[f].astype(jnp.float32) * g + b
        y = jnp.where(z >= 0, z, al * z)
        o_ref[f] = _pool_max_frame(y).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def _bwd1_kernel(x_ref, p_ref, g_ref, dz_ref, red_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        red_ref[...] = jnp.zeros_like(red_ref)

    nb, h, w, c = x_ref.shape
    mean = p_ref[0:1].reshape(1, 1, -1)
    rstd = p_ref[1:2].reshape(1, 1, -1)
    ga = (p_ref[2:3] * p_ref[1:2]).reshape(1, 1, -1)
    b = (p_ref[3:4] - p_ref[0:1] * p_ref[2:3] * p_ref[1:2]).reshape(1, 1, -1)
    al = p_ref[4:5].reshape(1, 1, -1)
    def body(f, carry):
        dbeta, dgamma, dalpha = carry
        xa = x_ref[f].astype(jnp.float32)
        z = xa * ga + b
        neg = z < 0
        y = jnp.where(neg, al * z, z)
        dy = _pool_bwd_frame(y, g_ref[f].astype(jnp.float32))
        dz = jnp.where(neg, al * dy, dy)
        xhat = (xa - mean) * rstd
        dz_ref[f] = dz.astype(dz_ref.dtype)
        flat = lambda v: v.reshape(h * w, c)  # noqa: E731
        return (
            dbeta + jnp.sum(flat(dz), axis=0, keepdims=True),
            dgamma + jnp.sum(flat(dz * xhat), axis=0, keepdims=True),
            dalpha
            + jnp.sum(
                flat(jnp.where(neg, dy * z, 0.0)), axis=0, keepdims=True
            ),
        )

    zz = jnp.zeros((1, c), jnp.float32)
    dbeta, dgamma, dalpha = jax.lax.fori_loop(0, nb, body, (zz, zz, zz))
    red_ref[0:1] = red_ref[0:1] + dbeta
    red_ref[1:2] = red_ref[1:2] + dgamma
    red_ref[2:3] = red_ref[2:3] + dalpha


def _bwd2_kernel(x_ref, p_ref, dz_ref, dx_ref):
    # p rows: 0=mean 1=rstd 2=scale*rstd 3=dbeta/M 4=dgamma/M
    mean = p_ref[0:1].reshape(1, 1, -1)
    rstd = p_ref[1:2].reshape(1, 1, -1)
    ga = p_ref[2:3].reshape(1, 1, -1)
    c1 = p_ref[3:4].reshape(1, 1, -1)
    c2 = p_ref[4:5].reshape(1, 1, -1)
    nb = x_ref.shape[0]

    def body(f, _):
        xa = x_ref[f].astype(jnp.float32)
        xhat = (xa - mean) * rstd
        dz = dz_ref[f].astype(jnp.float32)
        dx_ref[f] = (ga * (dz - c1 - xhat * c2)).astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _pick_nb(n: int, limit: int) -> int:
    nb = limit
    while n % nb:
        nb //= 2
    return max(nb, 1)


def _pack(*rows, c):
    p = jnp.zeros((8, c), jnp.float32)
    for i, r in enumerate(rows):
        p = p.at[i].set(r.astype(jnp.float32))
    return p


def _batch_stats(x, interpret):
    n, h, w, c = x.shape
    nb = _pick_nb(n, 8)
    sums = pl.pallas_call(
        _stats_kernel,
        compiler_params=_FWD_PARAMS,
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
    )(x)
    m = float(n * h * w)
    mean = sums[0] / m
    var = sums[1] / m - mean * mean
    return mean, var


def _apply(x, p, interpret):
    n, h, w, c = x.shape
    nb = _pick_nb(n, 8)
    return pl.pallas_call(
        _apply_kernel,
        compiler_params=_FWD_PARAMS,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (nb, h // 2, w // 2, c), lambda i: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(x, p)


def _train_fwd(x, scale, bias, alpha, eps, interpret):
    interpret = _resolve_interpret(interpret)
    c = x.shape[-1]
    mean, var = _batch_stats(x, interpret)
    rstd = jax.lax.rsqrt(var + eps)
    p = _pack(mean, rstd, scale, bias, alpha, c=c)
    out = _apply(x, p, interpret)
    # param dtypes ride in the residuals (as zero-size carriers — dtypes
    # themselves are not JAX types) so _train_bwd can return cotangents
    # matching the primal avals (the trainer casts params to bf16 before
    # apply; custom_vjp requires bwd dtypes == primal dtypes)
    dts = tuple(jnp.zeros((0,), v.dtype) for v in (scale, bias, alpha))
    return (out, mean, var), (x, p, dts)


def _train_bwd(eps, interpret, res, cts):
    interpret = _resolve_interpret(interpret)
    x, p, dts = res
    dt_scale, dt_bias, dt_alpha = (v.dtype for v in dts)
    g = cts[0]  # cotangents of (mean, var) outputs are ignored: the stats
    # feed only the running-average side channel, which callers stop-grad
    n, h, w, c = x.shape
    # nb=1 + a raised vmem cap: Mosaic's stack allocator gives every
    # pool-routing intermediate its own slot (no liveness reuse), ~30 MB
    # per frame body against a 16 MB default scoped limit
    nb = 1
    dz, red = pl.pallas_call(
        _bwd1_kernel,
        compiler_params=_BWD_PARAMS,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((nb, h // 2, w // 2, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, p, g.astype(x.dtype))
    m = float(n * h * w)
    dbeta, dgamma, dalpha = red[0], red[1], red[2]
    p2 = _pack(p[0], p[1], p[2] * p[1], dbeta / m, dgamma / m, c=c)
    nb2 = _pick_nb(n, 4)
    dx = pl.pallas_call(
        _bwd2_kernel,
        compiler_params=_BWD_PARAMS,
        grid=(n // nb2,),
        in_specs=[
            pl.BlockSpec((nb2, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((nb2, h, w, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb2, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(x, p2, dz)
    return (
        dx,
        dgamma.astype(dt_scale),
        dbeta.astype(dt_bias),
        dalpha.astype(dt_alpha),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _train_call(x, scale, bias, alpha, eps, interpret):
    (out, mean, var), _ = _train_fwd(x, scale, bias, alpha, eps, interpret)
    return out, mean, var


def _train_call_fwd(x, scale, bias, alpha, eps, interpret):
    (out, mean, var), res = _train_fwd(x, scale, bias, alpha, eps, interpret)
    return (out, mean, var), res


_train_call.defvjp(_train_call_fwd, _train_bwd)


def bn_prelu_pool(
    x,
    scale,
    bias,
    alpha,
    *,
    eps: float = 1e-5,
    train: bool,
    running_mean=None,
    running_var=None,
    interpret=None,
):
    """Fused BN + PReLU + 3x3/s2/p1 max pool over (N, H, W, C), H/W even.

    train=True: normalizes with batch statistics and returns
    (pooled, batch_mean, batch_var) — differentiable w.r.t. x, scale, bias,
    alpha (the stat outputs carry no gradient; stop-grad them before any
    running-average update, as flax BatchNorm effectively does).
    train=False: normalizes with running_mean/running_var; returns pooled
    only (not differentiable — serving path).
    """
    if train:
        return _train_call(x, scale, bias, alpha, eps, interpret)
    assert running_mean is not None and running_var is not None
    c = x.shape[-1]
    rstd = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    p = _pack(running_mean, rstd, scale, bias, alpha, c=c)
    return _apply(x, p, _resolve_interpret(interpret))


def lean_reference(
    x,
    scale,
    bias,
    alpha,
    *,
    eps: float = 1e-5,
    train: bool,
    running_mean=None,
    running_var=None,
):
    """Memory-lean jnp fallback: f32 statistics, activation-dtype compute.

    `reference` below upcasts the whole activation to f32 — fine as a parity
    oracle at test shapes, but at the flagship train shape (9216,44,44,64)
    that materializes multi-GB f32 temporaries and OOMs HBM at B=24 (round-5
    measurement; the pre-round-4 flax BatchNorm composition was bf16-native).
    This twin keeps the reductions in f32 (fused by XLA into the reduce, no
    f32 copy of x) and folds BN into one scale+shift in x.dtype — the same
    arithmetic structure flax nn.BatchNorm(dtype=bf16) used.
    """
    if train:
        xa = x.astype(jnp.float32)
        mean = jnp.mean(xa, axis=(0, 1, 2))
        var = jnp.mean(xa * xa, axis=(0, 1, 2)) - mean * mean
    else:
        mean = running_mean.astype(jnp.float32)
        var = running_var.astype(jnp.float32)
    rstd = jax.lax.rsqrt(var + eps)
    w = (rstd * scale.astype(jnp.float32)).astype(x.dtype)
    b = (bias.astype(jnp.float32) - mean * rstd * scale.astype(jnp.float32)
         ).astype(x.dtype)
    z = x * w + b
    y = jnp.where(z >= 0, z, alpha.astype(x.dtype) * z)
    pooled = jax.lax.reduce_window(
        y,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    if train:
        return pooled, mean, var
    return pooled


def reference(
    x,
    scale,
    bias,
    alpha,
    *,
    eps: float = 1e-5,
    train: bool,
    running_mean=None,
    running_var=None,
):
    """jnp twin of bn_prelu_pool (used on CPU and by the parity tests)."""
    xa = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xa, axis=(0, 1, 2))
        var = jnp.mean(xa * xa, axis=(0, 1, 2)) - mean * mean
    else:
        mean = running_mean.astype(jnp.float32)
        var = running_var.astype(jnp.float32)
    rstd = jax.lax.rsqrt(var + eps)
    z = (xa - mean) * (rstd * scale.astype(jnp.float32)) + bias.astype(
        jnp.float32
    )
    y = jnp.where(z >= 0, z, alpha.astype(jnp.float32) * z)
    pooled = jax.lax.reduce_window(
        y,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    ).astype(x.dtype)
    if train:
        return pooled, mean, var
    return pooled
