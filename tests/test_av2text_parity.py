"""AV2Text (MuAViC) parity vs the reference avhubert_muavic implementation."""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.checkpoint import av2text_mapping, convert_state  # noqa: E402
from avsr_tpu.models.av2text import AV2TextConfig, AV2TextModel  # noqa: E402

pytestmark = requires_reference

TOL = dict(rtol=3e-4, atol=3e-4)

TINY = dict(
    vocab_size=51,
    d_model=32,
    decoder_layers=2,
    decoder_ffn_dim=64,
    decoder_attention_heads=2,
    encoder_layers=2,
    encoder_ffn_dim=64,
    encoder_attention_heads=2,
)


@pytest.fixture(scope="module")
def setup():
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    # the reference targets transformers 4.52; shim symbols removed in newer
    # versions so the oracle imports
    import transformers.models.wav2vec2.modeling_wav2vec2 as w2v2

    if not hasattr(w2v2, "WAV2VEC2_ATTENTION_CLASSES"):
        from types import SimpleNamespace

        class _EagerAttention(w2v2.Wav2Vec2Attention):
            def __init__(self, *args, **kw):
                if kw.get("config") is None:
                    kw["config"] = SimpleNamespace(_attn_implementation="eager")
                super().__init__(*args, **kw)

        w2v2.WAV2VEC2_ATTENTION_CLASSES = {"eager": _EagerAttention}
    import transformers.models.speech_to_text.modeling_speech_to_text as s2t

    if not hasattr(s2t, "SPEECH_TO_TEXT_ATTENTION_CLASSES"):
        s2t.SPEECH_TO_TEXT_ATTENTION_CLASSES = {"eager": s2t.Speech2TextAttention}

    from src.avhubert_muavic.av2text_config import AV2TextConfig as RefCfg
    from src.avhubert_muavic.avhubert2text import AV2TextForConditionalGeneration

    torch.manual_seed(11)
    tcfg = RefCfg(
        **TINY,
        encoder_hidden_size=TINY["d_model"],
        decoder_hidden_size=TINY["d_model"],
        encoder_embed_dim=TINY["d_model"],
        hidden_size=TINY["d_model"],
        num_attention_heads=TINY["encoder_attention_heads"],
        intermediate_size=TINY["encoder_ffn_dim"],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        audio_feat_dim=104,
        # fields the muavic code reads but RefCfg doesn't default
        label_rate=25,
        sample_rate=25,
        resnet_relu_type="prelu",
        resnet_weights=None,
        modality_fuse="concat",
        modality="av",
        modality_dropout=0.5,
        audio_dropout=0.5,
        sub_encoder_layers=0,
        masking_type="input",
        selection_type="same_seq",
        sim_type="cosine",
        skip_masked=False,
        skip_nomask=False,
        mask_prob_image=0.3,
        mask_prob_audio=0.8,
        mask_length_image=5,
        mask_length_audio=10,
        mask_selection="static",
        mask_other=0.0,
        no_mask_overlap=False,
        mask_min_space=1,
        mask_channel_prob=0.0,
        mask_channel_selection="static",
        mask_channel_other=0.0,
        mask_channel_length=10,
        no_mask_channel_overlap=False,
        mask_channel_min_space=1,
        dropout_input=0.1,
        dropout_features=0.1,
        feature_grad_mult=0.1,
        logit_temp=0.1,
        target_glu=False,
        untie_final_proj=True,
        final_dim=256,
        num_classes=2004,
        num_dictionaries=1,
        layerdrop=0.0,
        hidden_dropout=0.1,
        activation_dropout_enc=0.0,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        feat_extract_activation="gelu",
        conv_dim=(512,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=False,
        apply_spec_augment=True,
        mask_time_prob=0.0,
        mask_time_length=10,
        mask_time_min_masks=2,
        mask_feature_prob=0.0,
        mask_feature_length=10,
        mask_feature_min_masks=0,
        add_adapter=False,
        feat_proj_dropout=0.1,
        final_dropout=0.0,
    )
    tmodel = AV2TextForConditionalGeneration(tcfg)
    # randomize BN running stats for a real eval-mode test
    gen = torch.Generator().manual_seed(3)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
    tmodel.load_state_dict(sd)
    tmodel.eval()

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state(
        state,
        av2text_mapping(TINY["encoder_layers"], TINY["decoder_layers"]),
    )
    return tmodel, variables


def _jax_model():
    cfg = AV2TextConfig(
        **TINY, num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4
    )
    return AV2TextModel(cfg)


def test_av2text_encoder_parity(setup):
    import torch

    tmodel, variables = setup
    jmodel = _jax_model()

    rng = np.random.RandomState(0)
    b, t = 2, 6
    video_t = rng.randn(b, 1, t, 88, 88).astype(np.float32)
    audio_t = rng.randn(b, 104, t).astype(np.float32)
    with torch.no_grad():
        enc_t = tmodel.model.encoder(
            input_features=torch.from_numpy(audio_t),
            video=torch.from_numpy(video_t),
        ).last_hidden_state.numpy()

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    enc_j = np.asarray(
        jmodel.apply(variables, audios, videos, None, method="encode")
    )
    np.testing.assert_allclose(enc_j, enc_t, **TOL)


def test_av2text_decoder_and_generation_parity(setup):
    import torch

    tmodel, variables = setup
    jmodel = _jax_model()

    rng = np.random.RandomState(1)
    b, t = 2, 6
    video_t = rng.randn(b, 1, t, 88, 88).astype(np.float32)
    audio_t = rng.randn(b, 104, t).astype(np.float32)
    dec_ids = np.array([[2, 5, 9, 11], [2, 7, 3, 40]], dtype=np.int64)

    with torch.no_grad():
        enc_t = tmodel.model.encoder(
            input_features=torch.from_numpy(audio_t),
            video=torch.from_numpy(video_t),
        )
        dec_out = tmodel.model.decoder(
            input_ids=torch.from_numpy(dec_ids),
            encoder_hidden_states=enc_t.last_hidden_state,
            use_cache=False,
        )
        out_t = tmodel.lm_head(dec_out.last_hidden_state).numpy()

    videos = jnp.asarray(np.transpose(video_t, (0, 2, 3, 4, 1)))
    audios = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    out_j = np.asarray(
        jmodel.apply(
            variables, audios, videos, jnp.asarray(dec_ids.astype(np.int32))
        )
    )
    np.testing.assert_allclose(out_j, out_t, **TOL)

    # incremental decoding matches teacher forcing
    memory = jmodel.apply(variables, audios, videos, None, method="encode")
    cache = jmodel.apply(variables, memory, 8, method="decoder_init")
    for step in range(dec_ids.shape[1]):
        y = jnp.asarray(dec_ids[:, step].astype(np.int32))
        logp, cache = jmodel.apply(
            variables, y, step, cache, None, method="decoder_step"
        )
    full_logp = jax.nn.log_softmax(jnp.asarray(out_j[:, -1]), axis=-1)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(full_logp), **TOL)
