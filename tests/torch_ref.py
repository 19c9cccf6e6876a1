"""Helpers to run the upstream torch reference as a numerical oracle.

The reference at /root/reference is imported (never copied) to generate
golden outputs for parity tests. Small configs keep this fast on CPU.
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"

TINY_KW = dict(
    odim=61,
    adim=32,
    ddim=32,
    dheads=4,
    dunits=64,
    dlayers=2,
    encoder_embed_dim=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    hidden_size=32,
    intermediate_size=64,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def build_reference_model(seed: int = 0, **overrides):
    """Instantiate the reference AVHubertAVSR with randomized BN stats."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    from src.avhubert_avsr.avhubert_avsr_model import AVHubertAVSR
    from src.avhubert_avsr.configuration_avhubert_avsr import AVHubertAVSRConfig

    torch.manual_seed(seed)
    kw = dict(TINY_KW)
    kw.update(overrides)
    cfg = AVHubertAVSRConfig(**kw)
    model = AVHubertAVSR(cfg)

    # randomize BN running stats so eval-mode BN is a real test
    gen = torch.Generator().manual_seed(seed + 1)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
    model.load_state_dict(sd)
    model.eval()
    # The reference targets transformers 4.52; newer versions dropped the
    # `_use_flash_attention_2` attribute its masked path reads. Restore the
    # legacy (non-flash) behavior so the oracle runs.
    model.avsr.encoder.encoder._use_flash_attention_2 = False
    return cfg, model


def tiny_jax_config():
    from avsr_tpu.core.config import AVHubertAVSRConfig, AVHubertEncoderConfig

    return AVHubertAVSRConfig(
        odim=61,
        adim=32,
        ddim=32,
        dheads=4,
        dunits=64,
        dlayers=2,
        encoder=AVHubertEncoderConfig(
            encoder_embed_dim=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        ),
    )


def numpy_state_dict(model) -> dict[str, np.ndarray]:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def make_inputs(seed: int = 2, b: int = 2, t: int = 8):
    rng = np.random.RandomState(seed)
    video = rng.randn(b, 1, t, 88, 88).astype(np.float32)  # torch NCTHW
    audio = rng.randn(b, 104, t).astype(np.float32)  # torch (B, F, T)
    return video, audio
