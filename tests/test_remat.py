"""Encoder scan rematerialization: identical gradients, less saved memory.

scan_remat trades backward-pass HBM for recompute (jax.checkpoint around the
scanned layer body) so large per-chip batches fit on 16 GB v5e HBM — without
it, training OOMs past per-chip batch ~8 at T=384 (measured; the scan stacks
24 x O(B*T*D) saved buffers). Remat must not change the math.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.config import AVHubertEncoderConfig  # noqa: E402
from avsr_tpu.models.avhubert import AVHubertTransformer  # noqa: E402


def _grads(remat: str, dropout: bool = False):
    cfg = AVHubertEncoderConfig(
        encoder_embed_dim=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, scan_remat=remat,
    )
    m = AVHubertTransformer(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 32).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p):
        rngs = {"dropout": jax.random.PRNGKey(7)} if dropout else {}
        return jnp.sum(
            m.apply({"params": p}, x, deterministic=not dropout, rngs=rngs) ** 2
        )

    return jax.grad(loss)(v["params"])


@pytest.mark.parametrize("remat", ["dots", "full", "ffn"])
@pytest.mark.parametrize("dropout", [False, True])
def test_remat_grads_match(remat, dropout):
    base = _grads("none", dropout)
    got = _grads(remat, dropout)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), base, got)
    assert max(jax.tree.leaves(diff)) < 1e-5
