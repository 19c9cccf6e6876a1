"""Device-vs-interpret self-check for the round-3 serving kernels.

interpret=True (all CPU tests) validates semantics but not Mosaic lowering
or on-device numerics; this runs each kernel once on the current default
backend at serving-like shapes and compares against the interpret path
bit-for-bit (fp32 attention output: rounding tolerance only). Raises on
any mismatch or lowering failure — callers (bench.py, tools/kernel_smoke)
use that to fall back to the previous-generation serving config.

Cost on TPU: three small pallas compiles (~seconds each with the
persistent compilation cache).
"""

from __future__ import annotations

import functools

import numpy as np


def check_stem_fuse(train: bool) -> None:
    """Compile + numerics check of the fused stem tail at REAL block shapes.

    The round-4 bench crash (BENCH_r04.json rc=1) was a scoped-vmem OOM that
    only appears at the production block shape (nb=8, 44, 44, 64) — toy-shape
    interpret tests cannot catch it. VMEM stack allocation depends on the
    per-program block, not on N (N only sets the grid length), so a small-N
    run with the same H/W/C and the same nb reproduces the compile behavior
    of the full B=32*T=377 serving batch exactly. nb here: _pick_nb picks 8
    for any N divisible by 8, as it does at N=12064 (serving) and N=9216
    (train), so N=64 exercises the identical kernel binary.
    """
    import jax
    import jax.numpy as jnp

    from avsr_tpu.ops.pallas import stem_fuse

    on_accel = jax.default_backend() != "cpu"
    rng = np.random.RandomState(3)
    n, h, w, c = 64, 44, 44, 64  # serving/train block shape (nb=8 path)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 0.5)
    s = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    a = jnp.full((c,), 0.25, jnp.float32)

    if not train:
        # serving path: eval-mode _apply with running stats, bf16 activations
        rm = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
        rv = jnp.asarray(0.5 + np.abs(rng.randn(c)).astype(np.float32))
        xb = x.astype(jnp.bfloat16)
        got = jax.jit(
            lambda v: stem_fuse.bn_prelu_pool(
                v, s, b, a, train=False, running_mean=rm, running_var=rv,
                interpret=not on_accel,
            )
        )(xb)
        want = stem_fuse.reference(
            xb, s, b, a, train=False, running_mean=rm, running_var=rv
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        return

    # train path: fwd + all four grads at the train block shape
    wgt = jnp.asarray(rng.randn(n, h // 2, w // 2, c).astype(np.float32))

    def loss(fn, x, s, b, a):
        out, _m, _v = fn(x, s, b, a, train=True)
        return jnp.vdot(out.astype(jnp.float32), wgt)

    got = jax.jit(
        jax.value_and_grad(
            lambda *p: loss(
                functools.partial(
                    stem_fuse.bn_prelu_pool, interpret=not on_accel
                ),
                *p,
            ),
            argnums=(0, 1, 2, 3),
        )
    )(x, s, b, a)
    want = jax.jit(
        jax.value_and_grad(
            lambda *p: loss(stem_fuse.reference, *p), argnums=(0, 1, 2, 3)
        )
    )(x, s, b, a)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-3)
    for name, g_got, g_want in zip("x,scale,bias,alpha".split(","),
                                   got[1], want[1]):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=2e-2, atol=2e-3,
            err_msg=f"stem_fuse d{name}",
        )


def check_serving_kernels() -> None:
    import jax
    import jax.numpy as jnp

    on_accel = jax.default_backend() != "cpu"

    # --- fused stem tail (serving eval path; default-on in models/resnet) ---
    check_stem_fuse(train=False)

    # --- topk_lastdim ---
    from avsr_tpu.ops.pallas.topk import topk_lastdim

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 3, 5049).astype(np.float32))
    v_t, i_t = jax.jit(lambda a: topk_lastdim(a, 4, interpret=not on_accel))(x)
    v_i, i_i = topk_lastdim(np.asarray(x), 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_i))
    np.testing.assert_array_equal(np.asarray(v_t), np.asarray(v_i))
    xf = jnp.asarray(rng.randn(32, 39).astype(np.float32))
    v_t, i_t = jax.jit(lambda a: topk_lastdim(a, 3, interpret=not on_accel))(xf)
    v_i, i_i = topk_lastdim(np.asarray(xf), 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_i))

    # --- cumlogsumexp (CTC prefix scans inside the beam loop) ---
    from avsr_tpu.ops.pallas.scan_logsumexp import cumlogsumexp

    xs = jnp.asarray((rng.randn(375, 96) * 4.0).astype(np.float32))
    got_ls = jax.jit(lambda a: cumlogsumexp(a, interpret=not on_accel))(xs)
    want_ls = cumlogsumexp(np.asarray(xs), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_ls), np.asarray(want_ls), rtol=1e-5, atol=1e-5
    )

    # --- row_gather (n > _RING exercises the bounded semaphore ring) ---
    from avsr_tpu.ops.pallas.row_gather import _RING, row_gather

    src = jnp.asarray(rng.randn(4096, 384).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 4096, size=(_RING + 72,)).astype(np.int32))
    got_rows = jax.jit(lambda s, i: row_gather(s, i, interpret=not on_accel))(
        src, idx
    )
    np.testing.assert_array_equal(
        np.asarray(got_rows), np.asarray(src)[np.asarray(idx)]
    )

    # --- beam_update (lazy + ctc, serving config) ---
    from avsr_tpu.ops.pallas.beam_update import beam_update

    b, k, sp, ll, s_kv = 32, 3, 4, 377, 192
    args = dict(
        i=jnp.asarray(5, jnp.int32),
        xlens=jnp.asarray(rng.randint(4, 370, size=(b,)).astype(np.int32)),
        dec_top=jnp.asarray(
            np.sort(rng.randn(b, k, sp).astype(np.float32), axis=-1)[..., ::-1]
        ),
        dec_eos=jnp.asarray(rng.randn(b, k).astype(np.float32) - 5),
        psi_cand=jnp.asarray(rng.randn(b, k, sp).astype(np.float32)),
        psi_eos=jnp.asarray(rng.randn(b, k).astype(np.float32)),
        ctc_s=jnp.asarray(rng.randn(b, k).astype(np.float32)),
        part_ids=jnp.asarray(
            rng.randint(1, 5049, size=(b, k, sp)).astype(np.int32)
        ),
        score=jnp.asarray(rng.randn(b, k).astype(np.float32)),
        alive=jnp.asarray(rng.rand(b, k) > 0.2),
        stop=jnp.asarray(rng.rand(b) > 0.9),
        yseq=jnp.asarray(rng.randint(0, 5049, size=(b, k, ll)).astype(np.int32)),
        anc=jnp.asarray(rng.randint(0, k, size=(s_kv, b, k)).astype(np.int32)),
        ended_best=jnp.asarray(rng.randn(b, ll).astype(np.float32)),
        ended_cnt=jnp.asarray(rng.randint(0, 3, size=(b, ll)).astype(np.int32)),
        best_score=jnp.asarray(rng.randn(b).astype(np.float32)),
        best_yseq=jnp.asarray(rng.randint(0, 5049, size=(b, ll)).astype(np.int32)),
        best_len=jnp.asarray(rng.randint(0, ll, size=(b,)).astype(np.int32)),
    )
    kw = dict(w_dec=0.9, w_ctc=0.1, penalty=0.0, eos=5048, lazy=True,
              neg=-1.0e30, d_end=-10.0, m_end=3)
    got = jax.jit(lambda **a: beam_update(**a, **kw, interpret=not on_accel))(
        **args
    )
    want = beam_update(**args, **kw, interpret=True)
    for name in want:
        np.testing.assert_array_equal(
            np.asarray(got[name]), np.asarray(want[name]), err_msg=name
        )

    # --- decode_attention (serving mode: row pre-written by XLA DUS) ---
    # kv_row mode is checked only when opted in: its in-kernel row write
    # needs a size-1 DMA slice along the (8,128)-tiled S dim at a dynamic
    # position, which Mosaic rejects on v5e.
    import os

    from avsr_tpu.ops.pallas.decode_attention import decode_attention

    n, s_max, heads, dh = b * k, s_kv, 16, 64
    c = heads * dh
    pos = 37
    q = jnp.asarray(rng.randn(n, c).astype(np.float32))
    kv = jnp.asarray(rng.randn(n, s_max, 2 * c).astype(np.float32))
    new_row = jnp.asarray(rng.randn(n, 2 * c).astype(np.float32))
    anc = rng.randint(0, k, size=(s_max, b, k))
    anc[pos] = np.arange(k)[None, :]
    s_idx = np.arange(s_max)
    valid = (s_idx <= pos)[:, None, None, None] & (
        anc[..., None] == np.arange(k)
    )
    bias = jnp.asarray(
        np.where(np.transpose(valid, (1, 2, 0, 3)), 0.0, -1.0e30)
        .astype(np.float32)
    )
    # v3 resident kernel (serving default): one program per layer with the
    # in-kernel group loop AND the 8-aligned block row write-back
    resident_on = os.environ.get("AVSR_DECODE_ATTN_RESIDENT", "1") == "1"
    if resident_on:
        out_t, kv_t = jax.jit(
            lambda *a: decode_attention(
                *a, lanes=k, heads=heads, kv_row=new_row, resident=True,
                interpret=not on_accel,
            )
        )(jnp.asarray(pos), q, kv, bias)
        out_i, kv_i = decode_attention(
            jnp.asarray(pos), q, kv, bias, lanes=k, heads=heads,
            kv_row=new_row, resident=True, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(kv_t), np.asarray(kv_i))
        np.testing.assert_allclose(
            np.asarray(out_t), np.asarray(out_i), rtol=2e-2, atol=2e-2
        )

    use_kv_row = os.environ.get("AVSR_DECODE_FUSED_KV_WRITE", "0") == "1"
    if use_kv_row:
        out_t, kv_t = jax.jit(
            lambda *a: decode_attention(
                *a, lanes=k, heads=heads, kv_row=new_row,
                interpret=not on_accel,
            )
        )(jnp.asarray(pos), q, kv, bias)
        out_i, kv_i = decode_attention(
            jnp.asarray(pos), q, kv, bias, lanes=k, heads=heads,
            kv_row=new_row, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(kv_t), np.asarray(kv_i))
    else:
        kv_w = jax.lax.dynamic_update_slice(kv, new_row[:, None, :],
                                            (0, pos, 0))
        out_t = jax.jit(
            lambda *a: decode_attention(
                *a, lanes=k, heads=heads, interpret=not on_accel
            )
        )(jnp.asarray(pos), q, kv_w, bias)
        out_i = decode_attention(
            jnp.asarray(pos), q, kv_w, bias, lanes=k, heads=heads,
            interpret=True,
        )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_i), rtol=2e-2, atol=2e-2
    )


def check_train_kernels() -> None:
    """Device property checks for the flash-attention in-kernel dropout.

    The seed path (pltpu.prng_seed + prng_random_bits) has no interpret
    rule, so the check EXTRACTS the kernel's actual keep mask — with
    q = k = 0 attention is uniform (p = 1/T), so probing with V = T x
    identity blocks returns the pre-scaled mask entries directly — and
    compares forward output and all three gradients against an exact XLA
    eager reference driven by that mask. The mask is value-independent
    (seeded only by head/tile coordinates), which is itself verified via
    a linearity-in-V check. Also checks determinism and keep statistics.
    Run on a real TPU (tools/kernel_smoke, bench_train).
    """
    import jax
    import jax.numpy as jnp

    from avsr_tpu.ops.pallas.flash_attention import flash_attention

    if jax.default_backend() == "cpu":
        return  # nothing to check: CPU uses the materialized-mask path

    # --- fused stem tail (train fwd + bwd; default-on in models/resnet) ---
    check_stem_fuse(train=True)

    rng = np.random.RandomState(7)
    rate = 0.3
    seed = jnp.asarray([123, 456], jnp.int32)
    for t in (256, 640):  # resident path and streaming path
        n, d = 16, 64
        q = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.randn(n, t, d).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
        bias = jnp.zeros((n, t), jnp.float32)
        f = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, bias, scale=d ** -0.5, dropout_rate=rate,
            dropout_seed=seed, interpret=False,
        ))
        out1 = np.asarray(f(q, k, v))
        out2 = np.asarray(f(q, k, v))
        np.testing.assert_array_equal(out1, out2, err_msg="nondeterministic")
        out_2v = np.asarray(f(q, k, 2.0 * v))
        np.testing.assert_allclose(out_2v, 2.0 * out1, rtol=1e-5, atol=1e-5,
                                   err_msg="mask not value-independent")
        # dropout must actually drop: with all-ones V and uniform attention
        # the output deviates from 1 unless every entry was kept
        ones = np.asarray(f(jnp.zeros_like(q), jnp.zeros_like(k),
                            jnp.ones_like(v)))
        assert abs(float(ones.mean()) - 1.0) < 0.02, "keep-rate mean off"
        assert float(ones.std()) > 1e-3, "no dropout applied"

        # extract the kernel's actual mask: uniform attention (q = k = 0)
        # turns the output into (1/T) * M @ V, so V = T x identity blocks
        # reads M out column-block by column-block
        zq = jnp.zeros_like(q)
        cols = []
        eye = np.eye(d, dtype=np.float32) * t
        for j0 in range(0, t, d):
            vb = np.zeros((n, t, d), np.float32)
            vb[:, j0:j0 + d, :] = eye
            cols.append(np.asarray(f(zq, zq, jnp.asarray(vb))))
        mask = np.concatenate(cols, axis=2)  # (n, t, t) entries 0 or 1/keep
        frac = (mask > 0).mean()
        assert abs(frac - (1.0 - rate)) < 0.01, f"keep fraction {frac}"

        # exact eager reference driven by the extracted mask: forward and
        # all three grads must match the kernel path (fwd/bwd kernels that
        # disagree on even one tile's bits fail loudly here)
        w = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
        mask_j = jnp.asarray(mask)

        def eager_loss(q, k, v):
            s = jnp.einsum("nqd,nkd->nqk", q, k) * (d ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.vdot(jnp.einsum("nqk,nkd->nqd", p * mask_j, v), w)

        def kern_loss(q, k, v):
            return jnp.vdot(
                flash_attention(q, k, v, bias, scale=d ** -0.5,
                                dropout_rate=rate, dropout_seed=seed,
                                interpret=False), w)

        # forward: elementwise (the scalar loss is a large cancelling sum —
        # ill-conditioned for comparison)
        def eager_out(q, k, v):
            s = jnp.einsum("nqd,nkd->nqk", q, k) * (d ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("nqk,nkd->nqd", p * mask_j, v)

        # tolerances: fp32 XLA softmax vs in-kernel exp/max rounding — a
        # single wrong mask bit would show up as an O(p*v) ~ 0.1-1 error
        np.testing.assert_allclose(
            out1, np.asarray(jax.jit(eager_out)(q, k, v)),
            rtol=2e-2, atol=2e-3, err_msg="fwd vs eager+mask",
        )
        got = jax.jit(jax.grad(kern_loss, argnums=(0, 1, 2)))(q, k, v)
        want = jax.jit(jax.grad(eager_loss, argnums=(0, 1, 2)))(q, k, v)
        for name, g_got, g_want in zip("qkv", got, want):
            np.testing.assert_allclose(
                np.asarray(g_got), np.asarray(g_want), rtol=5e-2, atol=5e-3,
                err_msg=f"d{name} vs eager+mask",
            )
