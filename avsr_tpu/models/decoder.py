"""Transformer decoder (ESPnet-lineage) with a TPU-native incremental path.

Training path matches the reference Decoder
(/root/reference/src/nets/backend/transformer/decoder.py:39): embedding +
sinusoidal positional encoding (x*sqrt(d) + pe), N pre-LN layers
(self-attn, src-attn, ReLU FFN; LayerNorm eps 1e-12), after_norm, output
projection.

Decoding path is re-architected for XLA: instead of re-running the layer
stack over a growing prefix with per-layer output caches
(decoder.py:153-183), we keep fixed-shape per-layer K/V caches and
precomputed source-attention K/V, so one decode step is a handful of
(beam, 1, D) matmuls — no recompilation, no dynamic shapes. The math is
identical to the reference's incremental forward.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = jnp.finfo(jnp.float32).min
LN_EPS = 1e-12


def sinusoidal_pe(maxlen: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sin/cos positional table (1, maxlen, d), reference embedding.py:55."""
    position = jnp.arange(maxlen, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((maxlen, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe[None].astype(dtype)


class MultiHeadAttention(nn.Module):
    """ESPnet MHA: scores / sqrt(d_k), biased projections, masked-fill-zero."""

    dim: int
    heads: int
    dropout: float = 0.0

    def setup(self):
        self.linear_q = nn.Dense(self.dim)
        self.linear_k = nn.Dense(self.dim)
        self.linear_v = nn.Dense(self.dim)
        self.linear_out = nn.Dense(self.dim)
        self.attn_drop = nn.Dropout(self.dropout)

    def _split(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.dim // self.heads)

    def project_kv(self, key: jax.Array, value: jax.Array):
        return self._split(self.linear_k(key)), self._split(self.linear_v(value))

    def attend(
        self,
        query: jax.Array,  # (B, Tq, D)
        k: jax.Array,  # (B, Tk, H, Dh)
        v: jax.Array,
        mask: Optional[jax.Array],  # (B, Tq, Tk) or (B, 1, Tk), True = keep
        deterministic: bool = True,
    ) -> jax.Array:
        b, tq, _ = query.shape
        d_k = self.dim // self.heads
        q = self._split(self.linear_q(query))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
        if mask is not None:
            m = mask[:, None, :, :]  # (B,1,Tq|1,Tk)
            scores = jnp.where(m, scores, NEG_INF)
            attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(query.dtype)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(query.dtype)
        attn = self.attn_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, tq, self.dim)
        return self.linear_out(out)

    def attend_kv_major(
        self,
        query: jax.Array,  # (B, 1, D) single decode position
        kv: jax.Array,  # (S, B, 2, H, Dh) fused seq-major K/V cache
        mask: jax.Array,  # (B, 1, S), True = keep
    ) -> jax.Array:
        """Decode-path attention over a sequence-major fused cache.

        The cache keeps the position axis leading so each decode step's
        update is one contiguous dynamic-update-slice row (profiling showed
        batch-major caches forced XLA into a full-buffer rewrite per step).
        """
        b = query.shape[0]
        d_k = self.dim // self.heads
        q = self._split(self.linear_q(query))  # (B, 1, H, Dh)
        scores = jnp.einsum("bqhd,sbhd->bhqs", q, kv[:, :, 0]) / math.sqrt(d_k)
        m = mask[:, None, :, :]  # (B, 1, 1, S)
        scores = jnp.where(m, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(query.dtype)
        attn = jnp.where(m, attn, 0.0)
        out = jnp.einsum("bhqs,sbhd->bqhd", attn, kv[:, :, 1])
        return self.linear_out(out.reshape(b, 1, self.dim))

    def attend_kv_lazy(
        self,
        query: jax.Array,  # (B*K, 1, D) single decode position
        kv: jax.Array,  # (S, B*K, 2, H, Dh) seq-major cache, never reordered
        lane_bias: jax.Array,  # (B, K, K, S): 0 on each position's ancestor
        # lane (and s <= pos), NEG elsewhere
    ) -> jax.Array:
        """Decode attention with lazy beam reorder (ancestry resolution).

        Physically reshuffling the K/V caches after every top-k costs a
        full-cache gather per layer per step (the dominant beam-loop cost in
        HLO profiles, and it forces the row-write into a copy). Instead the
        cache rows stay where they were written and each lane's attention
        reads its own ancestry: scores are computed against ALL K stored
        lanes per position (K x more score FLOPs — trivial next to the
        bandwidth saved) and non-ancestor lanes are masked by `lane_bias`,
        so the joint softmax over (lane, position) equals the softmax the
        reordered cache would produce.
        """
        s, n = kv.shape[0], kv.shape[1]
        b, k, j, _ = lane_bias.shape
        d_k = self.dim // self.heads
        q = self._split(self.linear_q(query)).reshape(b, k, self.heads, d_k)
        kvl = kv.reshape(s, b, k, 2, self.heads, d_k)
        scores = jnp.einsum("bkhd,sbjhd->bhkjs", q, kvl[:, :, :, 0]) / math.sqrt(d_k)
        scores = scores + lane_bias[:, None].astype(scores.dtype)
        flat = scores.reshape(b, self.heads, k, j * s)
        attn = jax.nn.softmax(flat.astype(jnp.float32), -1).astype(query.dtype)
        attn = attn.reshape(b, self.heads, k, j, s)
        out = jnp.einsum("bhkjs,sbjhd->bkhd", attn, kvl[:, :, :, 1])
        return self.linear_out(out.reshape(n, 1, self.dim))

    def __call__(self, query, key, value, mask, deterministic: bool = True):
        k, v = self.project_kv(key, value)
        return self.attend(query, k, v, mask, deterministic)


class DecoderLayer(nn.Module):
    """Pre-LN decoder block (reference decoder_layer.py:16)."""

    dim: int
    heads: int
    units: int
    dropout: float
    attn_dropout: float

    def setup(self):
        self.self_attn = MultiHeadAttention(self.dim, self.heads, self.attn_dropout)
        self.src_attn = MultiHeadAttention(self.dim, self.heads, self.attn_dropout)
        self.norm1 = nn.LayerNorm(epsilon=LN_EPS)
        self.norm2 = nn.LayerNorm(epsilon=LN_EPS)
        self.norm3 = nn.LayerNorm(epsilon=LN_EPS)
        self.w_1 = nn.Dense(self.units)
        self.w_2 = nn.Dense(self.dim)
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x: jax.Array, deterministic: bool) -> jax.Array:
        h = jax.nn.relu(self.w_1(x))
        h = self.drop(h, deterministic=deterministic)
        return self.w_2(h)

    def __call__(
        self,
        tgt: jax.Array,
        tgt_mask: Optional[jax.Array],
        memory: jax.Array,
        memory_mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        residual = tgt
        x = self.norm1(tgt)
        x = self.self_attn(x, x, x, tgt_mask, deterministic)
        x = residual + self.drop(x, deterministic=deterministic)

        residual = x
        h = self.norm2(x)
        h = self.src_attn(h, memory, memory, memory_mask, deterministic)
        x = residual + self.drop(h, deterministic=deterministic)

        residual = x
        h = self.norm3(x)
        x = residual + self.drop(self._ffn(h, deterministic), deterministic=deterministic)
        return x

    def step(
        self,
        x_t: jax.Array,  # (B, 1, D) current-position input
        pos: jax.Array,  # scalar int index
        self_kv: jax.Array,  # (maxlen, B, 2, H, Dh) seq-major fused K/V cache
        src_k: jax.Array,  # (B, S, H, Dh) precomputed
        src_v: jax.Array,
        memory_mask: Optional[jax.Array],  # (B, 1, S)
        lane_bias: Optional[jax.Array] = None,  # (B, K, K, maxlen) lazy reorder
    ):
        residual = x_t
        h = self.norm1(x_t)
        if self_kv.ndim == 3:  # (N, S, 2C) fused cache -> Pallas kernel path
            # fused Pallas decode attention over one (N, S, 2*H*Dh) K|V
            # buffer: q/k/v are one concatenated matmul (the weight concat is
            # loop-invariant, XLA hoists it), the K|V row write is ONE
            # dynamic-update-slice (the kernel is the cache's only consumer,
            # so layout assignment keeps rows contiguous), and the kernel
            # resolves beam ancestry via lane_bias ((B, K, S, J) layout).
            from avsr_tpu.ops.pallas.decode_attention import decode_attention

            n = x_t.shape[0]
            d_k = self.dim // self.heads
            pa = self.variables["params"]["self_attn"]
            w_qkv = jnp.concatenate(
                [pa["linear_q"]["kernel"], pa["linear_k"]["kernel"],
                 pa["linear_v"]["kernel"]], axis=1,
            )
            b_qkv = jnp.concatenate(
                [pa["linear_q"]["bias"], pa["linear_k"]["bias"],
                 pa["linear_v"]["bias"]]
            )
            qkv = h.reshape(n, self.dim) @ w_qkv + b_qkv  # (N, 3C)
            q = qkv[:, : self.dim] * d_k ** -0.5
            # In-kernel row write: under the v2 grid kernel, Mosaic rejects
            # the size-1 DMA slice at a dynamic position on the (8,128)-
            # tiled S dim ("must be aligned to tiling (8)") — so v2 keeps
            # the XLA dynamic-update-slice and the kernel write is opt-in
            # via AVSR_DECODE_FUSED_KV_WRITE=1. The v3 resident kernel
            # sidesteps the restriction with an 8-ALIGNED block write-back
            # (ops/pallas/decode_attention._kernel_resident), so the kernel
            # write is the DEFAULT there (the XLA dus + its relayout copy
            # cost ~25 us/layer/step at B=32); =0 forces the dus path.
            fkw = os.environ.get("AVSR_DECODE_FUSED_KV_WRITE")
            resident = (
                os.environ.get("AVSR_DECODE_ATTN_RESIDENT", "1") == "1"
            )
            use_kernel_write = fkw == "1" or (
                fkw is None and resident and self_kv.shape[1] % 8 == 0
            )
            if use_kernel_write:
                # the kernel stores this step's K|V row itself (aliased
                # in-place cache output) — one fewer XLA launch per layer
                out, self_kv = decode_attention(
                    pos, q, self_kv, lane_bias,
                    lanes=lane_bias.shape[1], heads=self.heads,
                    kv_row=qkv[:, self.dim:],
                )
            else:
                self_kv = jax.lax.dynamic_update_slice(
                    self_kv, qkv[:, None, self.dim:].astype(self_kv.dtype),
                    (0, pos, 0),
                )
                out = decode_attention(
                    pos, q, self_kv, lane_bias,
                    lanes=lane_bias.shape[1], heads=self.heads,
                )
            h = self.self_attn.linear_out(out[:, None, :].astype(h.dtype))
        else:
            k_t, v_t = self.self_attn.project_kv(h, h)  # (B,1,H,Dh)
            maxlen = self_kv.shape[0]
            # one contiguous (1,B,2,H,Dh) row write into the seq-major cache
            kv_t = jnp.stack(
                [k_t[:, 0], v_t[:, 0]], axis=1
            )[None].astype(self_kv.dtype)
            self_kv = jax.lax.dynamic_update_slice_in_dim(
                self_kv, kv_t, pos, axis=0
            )
            if lane_bias is not None:
                # causal mask + ancestor-lane selection folded into lane_bias
                h = self.self_attn.attend_kv_lazy(h, self_kv, lane_bias)
            else:
                causal = (jnp.arange(maxlen) <= pos)[None, None, :]  # (1,1,S)
                causal = jnp.broadcast_to(causal, (x_t.shape[0], 1, maxlen))
                h = self.self_attn.attend_kv_major(h, self_kv, causal)
        x = residual + h

        residual = x
        h = self.norm2(x)
        nb = src_k.shape[0]
        if h.shape[0] != nb:
            # src K/V shared per utterance (B, S, H, Dh) while lanes run at
            # B*K: fold the beam dim into the query axis — cross-attention
            # has no structure over queries, so this is exactly equivalent
            kk = h.shape[0] // nb
            hq = h.reshape(nb, kk, h.shape[-1])
            h = self.src_attn.attend(hq, src_k, src_v, memory_mask)
            h = h.reshape(nb * kk, 1, h.shape[-1])
        else:
            h = self.src_attn.attend(h, src_k, src_v, memory_mask)
        x = residual + h

        residual = x
        x = residual + self._ffn(self.norm3(x), deterministic=True)
        return x, self_kv


class _ScanDecoderLayer(DecoderLayer):
    """DecoderLayer with lax.scan-compatible method signatures.

    All three code paths (teacher-forced forward, src-K/V precompute,
    incremental step) scan one compiled layer body over stacked parameters —
    essential for decode latency, where the while-loop body's op count is the
    floor.
    """

    def fwd(self, x, _scanned, extras):
        tgt_mask, memory, memory_mask, deterministic = extras
        y = DecoderLayer.__call__(self, x, tgt_mask, memory, memory_mask, deterministic)
        return y, jnp.zeros((1,), x.dtype)

    def src_kv(self, carry, _scanned, memory):
        k, v = self.src_attn.project_kv(memory, memory)
        return carry, (k, v)


class DecoderCache(NamedTuple):
    """Fixed-shape decode state: per-layer fused self K/V + precomputed src K/V.

    Each layer's cache is a separate buffer (tuple over layers), NOT a stacked
    (L, ...) array: a stacked cache threaded through nn.scan's xs/ys forces XLA
    to materialize a per-layer unstack and a full restack every decode step,
    which HLO profiling showed dominating the beam loop. Per-layer buffers are
    read and dynamic-update-sliced in place; the beam reshuffle maps a gather
    over the tuple. K and V stay fused in one array per layer so that
    reshuffle is one gather per layer."""

    self_kv: Tuple[jax.Array, ...]  # L x (maxlen, B, 2, H, Dh) seq-major
    src_k: Tuple[jax.Array, ...]  # L x (B, S, H, Dh)
    src_v: Tuple[jax.Array, ...]
    # per-layer parameter trees + output-projection kernel, pre-sliced from
    # the scan-stacked storage and pre-cast to param_dtype at init time. HLO
    # profiling showed XLA re-materializing the slice+cast of every layer's
    # weights on every decode step when taken inside the loop body; carrying
    # them (loop-invariant, so the while loop aliases rather than copies)
    # makes the hoist explicit. With param_dtype=bfloat16 the decoder matmuls
    # also drop the 3-pass f32 MXU decomposition.
    params: Tuple  # L x DecoderLayer param pytree
    head_w: jax.Array  # (D, odim) output_layer kernel


class TransformerDecoder(nn.Module):
    """ESPnet decoder with output projection and incremental scoring."""

    odim: int
    dim: int = 1024
    heads: int = 16
    units: int = 3072
    layers: int = 6
    dropout: float = 0.1
    attn_dropout: float = 0.1
    max_decode_len: int = 512
    # decode KV-cache storage dtype; decode is cache-bandwidth-bound, so
    # bfloat16 roughly halves the per-token cost (scores still accumulate
    # in fp32 via mixed-precision matmuls)
    cache_dtype: str = "float32"
    # decode-path parameter/activation dtype (softmax and final log-softmax
    # stay fp32); bfloat16 halves weight reads and runs single-pass MXU
    decode_param_dtype: str = "float32"
    # fused Pallas decode-step self-attention (requires lazy beam reorder):
    # in-place KV row writes + prefix-bounded reads (ops/pallas/decode_attention)
    fused_decode_attention: bool = False
    # ONE Pallas program per decoder layer per step (norm1+QKV+self-attn+
    # cross-attn+FFN with VMEM-resident weights, ops/pallas/decoder_layer);
    # implies the fused (N, S, 2C) cache layout and lazy beam reorder
    fused_decode_layer: bool = False

    def setup(self):
        self.embed = nn.Embed(self.odim, self.dim)
        # unroll: a nested lax.scan inside the beam's while-loop body costs
        # more in loop machinery than it saves; unrolled-with-stacked-params
        # keeps the compile-time win without the runtime hit
        self.blocks = nn.scan(
            _ScanDecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=self.layers,
            unroll=self.layers,
            methods=("fwd", "src_kv"),
        )(self.dim, self.heads, self.units, self.dropout, self.attn_dropout)
        self.after_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.output_layer = nn.Dense(self.odim)
        self.pos_drop = nn.Dropout(self.dropout)

    def _embed(self, ys: jax.Array, deterministic: bool) -> jax.Array:
        x = self.embed(ys) * math.sqrt(self.dim)
        pe = sinusoidal_pe(ys.shape[-1], self.dim, x.dtype)
        return self.pos_drop(x + pe, deterministic=deterministic)

    def _dummy_scan_input(self, dtype):
        return jnp.zeros((self.layers, 1), dtype)

    def __call__(
        self,
        ys_in: jax.Array,  # (B, L) int
        tgt_mask: Optional[jax.Array],  # (B, L, L)
        memory: jax.Array,  # (B, S, D)
        memory_mask: Optional[jax.Array],  # (B, 1, S)
        deterministic: bool = True,
    ) -> jax.Array:
        x = self._embed(ys_in, deterministic)
        x, _ = self.blocks.fwd(
            x, self._dummy_scan_input(x.dtype),
            (tgt_mask, memory, memory_mask, deterministic),
        )
        return self.output_layer(self.after_norm(x))

    def init_cache(
        self, memory: jax.Array, maxlen: Optional[int] = None, beam: int = 1
    ) -> DecoderCache:
        """Precompute src K/V and allocate zeroed self K/V caches.

        With beam > 1 the memory is per-utterance (B, S, D) and the src K/V
        stay un-repeated while the self-KV buffers cover all B*beam lanes
        (BeamSearchConfig.shared_src_kv)."""
        maxlen = maxlen or self.max_decode_len
        b = memory.shape[0] * beam
        dh = self.dim // self.heads
        _, (src_k, src_v) = self.blocks.src_kv(
            jnp.zeros((1,), memory.dtype), self._dummy_scan_input(memory.dtype), memory
        )
        cdtype = jnp.dtype(self.cache_dtype)
        pdtype = jnp.dtype(self.decode_param_dtype)
        if self.fused_decode_attention or self.fused_decode_layer:
            # one fused (N, S, 2C) K|V buffer: lanes lead so the kernel's
            # per-group DMA slices the untiled major dim, and K|V concat
            # means one row-write per layer per step
            zeros = jnp.zeros((b, maxlen, 2 * self.dim), cdtype)
        else:
            zeros = jnp.zeros((maxlen, b, 2, self.heads, dh), cdtype)
        stacked = self.blocks.variables["params"]
        # split the scan-stacked src K/V (and parameters) into per-layer
        # buffers once, outside the decode loop (see DecoderCache docstring)
        if self.fused_decode_layer:
            from avsr_tpu.ops.pallas.decoder_layer import pack_layer_params

            params = tuple(
                pack_layer_params(
                    jax.tree.map(lambda a: a[i], stacked), pdtype
                )
                for i in range(self.layers)
            )
        else:
            params = tuple(
                jax.tree.map(lambda a: a[i].astype(pdtype), stacked)
                for i in range(self.layers)
            )
        return DecoderCache(
            self_kv=tuple(zeros for _ in range(self.layers)),
            src_k=tuple(src_k[i].astype(cdtype) for i in range(self.layers)),
            src_v=tuple(src_v[i].astype(cdtype) for i in range(self.layers)),
            params=params,
            head_w=self.variables["params"]["output_layer"]["kernel"].astype(pdtype),
        )

    def step(
        self,
        y_t: jax.Array,  # (B,) current token ids
        pos: jax.Array,  # scalar position index (0-based)
        cache: DecoderCache,
        memory_mask: Optional[jax.Array] = None,  # (B, 1, S)
        lane_bias: Optional[jax.Array] = None,  # (B, K, K, maxlen) lazy reorder
    ):
        """One decode step: returns (log-probs (B, V), updated cache)."""
        first = cache.self_kv[0]
        kv_len = first.shape[1] if first.ndim == 3 else first.shape[0]
        if self.fused_decode_attention or self.fused_decode_layer:
            if lane_bias is None:
                raise ValueError(
                    "fused decode kernels require lazy beam reorder "
                    "(BeamSearchConfig.lazy_reorder) supplying lane_bias"
                )
            # kernel layout: (B, K, J, S) -> (B, K, S, J); validity (s <= pos
            # on the ancestor lane) is unchanged — the current row is written
            # before the kernel reads
            lane_bias = jnp.swapaxes(lane_bias, 2, 3)
        x = self.embed(y_t)[:, None, :] * math.sqrt(self.dim)
        # PE table sized past the KV buffer: with a capped cache the position
        # index can exceed the buffer length (degenerate >cap hyps); the table
        # is shape-only, so XLA constant-folds it outside the decode loop
        pe = sinusoidal_pe(max(self.max_decode_len, kv_len), self.dim, x.dtype)
        x = x + jax.lax.dynamic_slice_in_dim(pe, pos, 1, axis=1)
        x = x.astype(jnp.dtype(self.decode_param_dtype))
        if self.fused_decode_layer:
            # one Pallas program per layer: norm1+QKV+self-attn (lazy
            # reorder) + cross-attn + FFN with VMEM-resident weights
            from avsr_tpu.ops.pallas.decoder_layer import decoder_layer_step

            xf = x[:, 0, :]
            nb, s_enc = cache.src_k[0].shape[:2]
            if memory_mask is not None:
                mem_bias = jnp.where(
                    memory_mask[:, 0, :], 0.0, -1.0e30
                ).astype(jnp.float32)
            else:
                mem_bias = jnp.zeros((nb, s_enc), jnp.float32)
            new_kvs = []
            for idx in range(self.layers):
                xf, kv = decoder_layer_step(
                    pos, xf, cache.self_kv[idx],
                    cache.src_k[idx].reshape(nb, s_enc, self.dim),
                    cache.src_v[idx].reshape(nb, s_enc, self.dim),
                    mem_bias, lane_bias, cache.params[idx],
                    lanes=lane_bias.shape[1], heads=self.heads,
                )
                new_kvs.append(kv)
            x = xf[:, None, :]
        else:
            # manual unrolled loop over the pre-sliced per-layer parameters in
            # the cache instead of nn.scan: scan would thread the KV caches
            # through stacked xs/ys, materializing a full-cache unstack +
            # restack each step (the dominant beam-loop cost in HLO profiles)
            layer = DecoderLayer(
                self.dim, self.heads, self.units, self.dropout,
                self.attn_dropout,
                parent=None,  # detached template, applied with explicit params
            )
            new_kvs = []
            for idx in range(self.layers):
                x, kv = layer.apply(
                    {"params": cache.params[idx]},
                    x, pos, cache.self_kv[idx],
                    cache.src_k[idx], cache.src_v[idx], memory_mask, lane_bias,
                    method="step",
                )
                new_kvs.append(kv)
        y = self.after_norm(x[:, 0])  # fp32 LN params promote y to fp32
        bias = self.variables["params"]["output_layer"]["bias"]
        logits = y.astype(cache.head_w.dtype) @ cache.head_w + bias
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, cache._replace(self_kv=tuple(new_kvs))
