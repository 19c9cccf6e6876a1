"""Fused Pallas decode-step attention vs the XLA lazy-reorder reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.ops.pallas.decode_attention import decode_attention  # noqa: E402

NEG = -1.0e30


def reference(pos, q, k_cache, v_cache, bias_ksj, heads):
    """Dense reference: lane-expanded joint softmax over (j, s <= pos)."""
    n, s_max, c = k_cache.shape
    b, k, _, j = bias_ksj.shape
    dh = c // heads
    kc = k_cache.reshape(b, k, s_max, heads, dh).astype(jnp.float32)
    vc = v_cache.reshape(b, k, s_max, heads, dh).astype(jnp.float32)
    qq = q.reshape(b, k, heads, dh).astype(jnp.float32)
    scores = jnp.einsum("bkhd,bjshd->bhkjs", qq, kc)
    bias = jnp.transpose(bias_ksj, (0, 1, 3, 2))  # (B, K, J, S)
    scores = scores + bias[:, None]
    flat = scores.reshape(b, heads, k, j * s_max)
    attn = jax.nn.softmax(flat, -1).reshape(b, heads, k, j, s_max)
    out = jnp.einsum("bhkjs,bjshd->bkhd", attn, vc)
    return out.reshape(n, c)


def make_case(seed, b=2, k=3, s_max=64, heads=4, dh=32, pos=11, dtype=np.float32):
    rng = np.random.RandomState(seed)
    n, c = b * k, heads * dh
    q = rng.randn(n, c).astype(dtype)
    k_cache = rng.randn(n, s_max, c).astype(dtype)
    v_cache = rng.randn(n, s_max, c).astype(dtype)
    # random ancestry for rows <= pos, everything beyond masked
    anc = rng.randint(0, k, size=(s_max, b, k))
    anc[pos] = np.arange(k)[None, :]  # current row: own lane
    s_idx = np.arange(s_max)
    valid = (s_idx <= pos)[:, None, None, None] & (
        anc[..., None] == np.arange(k)
    )
    bias_ksj = np.where(
        np.transpose(valid, (1, 2, 0, 3)), 0.0, NEG
    ).astype(np.float32)  # (B, K, S, J)
    return q, k_cache, v_cache, bias_ksj, pos, heads


@pytest.mark.parametrize("resident", [False, True])
@pytest.mark.parametrize("pos", [0, 11, 63])
def test_fused_matches_dense(pos, resident):
    q, k_cache, v_cache, bias, _, heads = make_case(3, pos=pos)
    out = decode_attention(
        jnp.asarray(pos), jnp.asarray(q),
        jnp.asarray(np.concatenate([k_cache, v_cache], -1)), jnp.asarray(bias),
        lanes=3, heads=heads, chunk=16, resident=resident,
    )
    want = reference(pos, jnp.asarray(q), jnp.asarray(k_cache),
                     jnp.asarray(v_cache), jnp.asarray(bias), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_cache():
    q, k_cache, v_cache, bias, pos, heads = make_case(5)
    to16 = lambda x: jnp.asarray(x).astype(jnp.bfloat16)  # noqa: E731
    out = decode_attention(
        jnp.asarray(pos), jnp.asarray(q),
        to16(np.concatenate([k_cache, v_cache], -1)), jnp.asarray(bias),
        lanes=3, heads=heads, chunk=16,
    )
    want = reference(
        pos, jnp.asarray(q),
        to16(k_cache).astype(jnp.float32), to16(v_cache).astype(jnp.float32),
        jnp.asarray(bias), heads,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_clamps_overflow_position():
    """pos >= S clamps like dynamic-update-slice: reads stay in bounds."""
    q, k_cache, v_cache, bias, _, heads = make_case(7, s_max=32, pos=31)
    out = decode_attention(
        jnp.asarray(40), jnp.asarray(q),  # past the buffer
        jnp.asarray(np.concatenate([k_cache, v_cache], -1)), jnp.asarray(bias),
        lanes=3, heads=heads, chunk=16,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_fused_prefix_bounded_reads():
    """Rows past pos never contribute: poisoning them changes nothing."""
    q, k_cache, v_cache, bias, pos, heads = make_case(9, s_max=64, pos=20)
    out1 = decode_attention(
        jnp.asarray(pos), jnp.asarray(q),
        jnp.asarray(np.concatenate([k_cache, v_cache], -1)), jnp.asarray(bias),
        lanes=3, heads=heads, chunk=16,
    )
    k2, v2 = k_cache.copy(), v_cache.copy()
    k2[:, pos + 1 :] = 1e6  # garbage beyond the prefix (masked to weight 0)
    v2[:, pos + 1 :] = -1e6
    out2 = decode_attention(
        jnp.asarray(pos), jnp.asarray(q),
        jnp.asarray(np.concatenate([k2, v2], -1)), jnp.asarray(bias),
        lanes=3, heads=heads, chunk=16,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("resident", [False, True])
@pytest.mark.parametrize("pos", [0, 11, 63])
def test_write_row_matches_prewritten(pos, resident):
    """kv_row mode (the kernel stores row `pos` itself, aliased cache
    output) must be bit-identical to pre-writing the row with a
    dynamic-update-slice and calling the read-only kernel."""
    q, k_cache, v_cache, bias, _, heads = make_case(17, pos=pos)
    kv = jnp.asarray(np.concatenate([k_cache, v_cache], -1))
    rng = np.random.RandomState(99)
    new_row = jnp.asarray(rng.randn(kv.shape[0], kv.shape[2]).astype(np.float32))

    pre = jax.lax.dynamic_update_slice(kv, new_row[:, None, :], (0, pos, 0))
    out_ref = decode_attention(
        jnp.asarray(pos), jnp.asarray(q), pre, jnp.asarray(bias),
        lanes=3, heads=heads, resident=resident,
    )
    # stale bytes at row pos in `kv`; the kernel must overwrite them
    out, kv_new = decode_attention(
        jnp.asarray(pos), jnp.asarray(q), kv, jnp.asarray(bias),
        lanes=3, heads=heads, kv_row=new_row, resident=resident,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(kv_new), np.asarray(pre))


@pytest.mark.parametrize("write_row", [False, True])
def test_resident_multigroup_double_buffer(write_row):
    """v3 with >2 groups exercises the double-buffered in-kernel group
    loop (issue g+2 after compute g) against the v2 grid path."""
    q, k_cache, v_cache, bias, pos, heads = make_case(23, b=8, pos=30)
    kv = jnp.asarray(np.concatenate([k_cache, v_cache], -1))
    kw = {}
    if write_row:
        rng = np.random.RandomState(41)
        kw["kv_row"] = jnp.asarray(
            rng.randn(kv.shape[0], kv.shape[2]).astype(np.float32)
        )
    got = decode_attention(
        jnp.asarray(pos), jnp.asarray(q), kv, jnp.asarray(bias),
        lanes=3, heads=heads, resident=True, **kw,
    )
    want = decode_attention(
        jnp.asarray(pos), jnp.asarray(q), kv, jnp.asarray(bias),
        lanes=3, heads=heads, resident=False, **kw,
    )
    if write_row:
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        got, want = got[0], want[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
