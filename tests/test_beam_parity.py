"""Beam-search parity: fixed-shape XLA search vs reference BatchBeamSearch."""

import numpy as np
import pytest

from tests.conftest import requires_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.checkpoint import torch_to_flax  # noqa: E402
from avsr_tpu.decode import ctc_prefix  # noqa: E402
from avsr_tpu.decode.beam import BeamSearchConfig, beam_search, greedy_ctc  # noqa: E402
from avsr_tpu.models.e2e import AVSRModel  # noqa: E402

pytestmark = requires_reference


@pytest.fixture(scope="module")
def setup():
    from tests.torch_ref import build_reference_model, numpy_state_dict, tiny_jax_config

    tcfg, tmodel = build_reference_model(seed=3)
    jcfg = tiny_jax_config()
    variables = torch_to_flax(numpy_state_dict(tmodel), jcfg)
    jmodel = AVSRModel(jcfg)
    return tmodel, jmodel, variables, jcfg


def _reference_beam(tmodel, x, beam_size=3):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.avhubert_avsr.avhubert_avsr_model import get_beam_search_decoder

    token_list = [f"tok{i}" for i in range(61)]
    bs = get_beam_search_decoder(
        tmodel.avsr, token_list, ctc_weight=0.1, beam_size=beam_size
    )
    with torch.no_grad():
        nbest = bs(torch.from_numpy(x))
    best = nbest[0]
    return np.asarray(best.yseq), float(best.score)


def _our_beam(jmodel, variables, jcfg, x, beam_size=3):
    feats = jnp.asarray(x)
    ctc_logp = jmodel.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=beam_size,
        ctc_weight=0.1,
        sos=jcfg.sos,
        eos=jcfg.eos,
        vocab=jcfg.odim,
    )

    def dec_step(y, pos, cache, mem_mask):
        return jmodel.apply(variables, y, pos, cache, mem_mask, method="decoder_step")

    def dec_init(memory, maxlen):
        return jmodel.apply(variables, memory, maxlen, method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    return np.asarray(yseq)[: int(length)], float(score)


@pytest.mark.parametrize("seed,t", [(7, 12), (11, 20), (13, 6)])
def test_beam_matches_reference(setup, seed, t):
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(seed)
    x = (rng.randn(t, 32) * 2.0).astype(np.float32)

    ref_yseq, ref_score = _reference_beam(tmodel, x)
    our_yseq, our_score = _our_beam(jmodel, variables, jcfg, x)

    np.testing.assert_array_equal(our_yseq, ref_yseq)
    np.testing.assert_allclose(our_score, ref_score, rtol=1e-3, atol=1e-3)


def test_beam_padded_invariance(setup):
    """Bucketed padding must not change the result."""
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(23)
    t = 10
    x = (rng.randn(t, 32) * 2.0).astype(np.float32)

    y1, s1 = _our_beam(jmodel, variables, jcfg, x)

    feats_pad = jnp.asarray(np.concatenate([x, rng.randn(6, 32).astype(np.float32)]))
    ctc_logp = jmodel.apply(variables, feats_pad[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos, vocab=jcfg.odim
    )

    def dec_step(y, pos, cache, mem_mask):
        return jmodel.apply(variables, y, pos, cache, mem_mask, method="decoder_step")

    def dec_init(memory, maxlen):
        return jmodel.apply(variables, memory, maxlen, method="decoder_init")

    yseq, length, s2 = beam_search(
        bcfg, dec_step, dec_init, feats_pad, ctc_logp, jnp.asarray(t)
    )
    y2 = np.asarray(yseq)[: int(length)]
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)


def test_ctc_prefix_matches_reference_impl(setup):
    """Closed-form CTC prefix recursion vs reference CTCPrefixScoreTH."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.nets.ctc_prefix_score import CTCPrefixScoreTH

    rng = np.random.RandomState(3)
    t, v, k, s = 9, 15, 3, 4
    eos = v - 1
    logits = rng.randn(t, v).astype(np.float32) * 2
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)

    impl = CTCPrefixScoreTH(logp[None].clone(), torch.tensor([t]), 0, eos)

    logp_j = ctc_prefix.pad_log_probs(jnp.asarray(logp.numpy()), jnp.asarray(t))
    state = ctc_prefix.init_state(logp_j, k, eos)

    # step 1: single hyp expanded (reference packs K identical hyps)
    y = [torch.tensor([eos])] * k
    ids = torch.from_numpy(
        np.stack([rng.choice(v - 1, s, replace=False) for _ in range(k)])
    )
    tscore, tstate = impl(y, None, ids)
    delta, log_psi, r_cands = ctc_prefix.score(
        logp_j, jnp.asarray(t), state, jnp.asarray(ids.numpy()), eos
    )
    rows = np.arange(k)[:, None]
    np.testing.assert_allclose(
        np.asarray(delta)[rows, ids.numpy()],
        tscore.numpy()[rows, ids.numpy()],
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(delta)[:, eos], tscore.numpy()[:, eos], rtol=1e-4, atol=1e-4
    )

    # select winners and do a second step
    prev = np.array([0, 1, 2])
    token = ids.numpy()[np.arange(k), np.array([0, 1, 2])]
    # reference state selection: best_ids in (K, V)-flat space per batch=1
    best_ids = torch.from_numpy((prev * v + token)[None, :])  # (1, K)
    tsel = impl.index_select_state(tstate, best_ids)
    state2 = ctc_prefix.select(
        state, log_psi, r_cands, jnp.asarray(ids.numpy()),
        jnp.asarray(prev), jnp.asarray(token),
    )
    np.testing.assert_allclose(
        np.asarray(state2.s), tsel[1][:, 0].numpy(), rtol=1e-4, atol=1e-4
    )

    y2 = [torch.tensor([eos, tok]) for tok in token]
    ids2 = torch.from_numpy(
        np.stack([rng.choice(v - 1, s, replace=False) for _ in range(k)])
    )
    tscore2, _ = impl(y2, tsel, ids2)
    delta2, _, _ = ctc_prefix.score(
        logp_j, jnp.asarray(t), state2, jnp.asarray(ids2.numpy()), eos
    )
    np.testing.assert_allclose(
        np.asarray(delta2)[rows, ids2.numpy()],
        tscore2.numpy()[rows, ids2.numpy()],
        rtol=1e-4,
        atol=1e-4,
    )


def test_greedy_ctc():
    lp = jnp.log(
        jnp.asarray(
            [
                [0.1, 0.8, 0.1],
                [0.1, 0.8, 0.1],
                [0.8, 0.1, 0.1],
                [0.1, 0.1, 0.8],
                [0.1, 0.1, 0.8],
                [0.8, 0.1, 0.1],
            ],
            jnp.float32,
        )
    )
    toks, n = greedy_ctc(lp, jnp.asarray(6))
    assert int(n) == 2
    np.testing.assert_array_equal(np.asarray(toks)[:2], [1, 2])
    # truncated length
    toks, n = greedy_ctc(lp, jnp.asarray(2))
    assert int(n) == 1
    assert int(toks[0]) == 1


def test_bf16_cache_token_stability(setup):
    """bfloat16 KV caches must not change decoded tokens on realistic inputs."""
    tmodel, jmodel, variables, jcfg = setup
    import dataclasses

    from avsr_tpu.models.e2e import AVSRModel

    cfg16 = dataclasses.replace(jcfg, decoder_cache_dtype="bfloat16")
    jmodel16 = AVSRModel(cfg16)
    rng = np.random.RandomState(31)
    for seed in (1, 2):
        x = (np.random.RandomState(seed).randn(14, 32) * 2).astype(np.float32)
        y32, _ = _our_beam(jmodel, variables, jcfg, x)
        y16, _ = _our_beam(jmodel16, variables, cfg16, x)
        np.testing.assert_array_equal(y32, y16)


def test_beam_penalty_matches_reference(setup):
    """Nonzero length bonus (reference scorers/length_bonus.py): +penalty per
    emitted token shifts cross-length comparisons (ended-hyp bookkeeping)."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from src.nets.batch_beam_search import BatchBeamSearch
    from src.nets.scorers.ctc import CTCPrefixScorer
    from src.nets.scorers.length_bonus import LengthBonus

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(31)
    x = (rng.randn(14, 32) * 2.0).astype(np.float32)
    penalty = 0.5

    model = tmodel.avsr
    token_list = [f"tok{i}" for i in range(jcfg.odim)]
    bs = BatchBeamSearch(
        beam_size=3,
        vocab_size=jcfg.odim,
        weights={"decoder": 0.9, "ctc": 0.1, "lm": 0.0, "length_bonus": penalty},
        scorers={
            "decoder": model.decoder,
            "ctc": CTCPrefixScorer(model.ctc, model.eos),
            "length_bonus": LengthBonus(jcfg.odim),
            "lm": None,
        },
        sos=model.sos,
        eos=model.eos,
        token_list=token_list,
        pre_beam_score_key="decoder",
    )
    with torch.no_grad():
        best = bs(torch.from_numpy(x))[0]
    ref_yseq, ref_score = np.asarray(best.yseq), float(best.score)

    feats = jnp.asarray(x)
    ctc_logp = jmodel.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos,
        vocab=jcfg.odim, penalty=penalty,
    )

    def dec_step(y, pos, cache, mem_mask):
        return jmodel.apply(variables, y, pos, cache, mem_mask, method="decoder_step")

    def dec_init(memory, maxlen):
        return jmodel.apply(variables, memory, maxlen, method="decoder_init")

    from avsr_tpu.decode.beam import beam_search

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    np.testing.assert_array_equal(np.asarray(yseq)[: int(length)], ref_yseq)
    np.testing.assert_allclose(score, ref_score, rtol=1e-3, atol=1e-3)


def test_max_decode_tokens_cap_preserves_output(setup):
    """A KV-buffer cap larger than the winning hypothesis must not change
    the result (the cap only trims unreachable buffer space)."""
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(41)
    x = (rng.randn(16, 32) * 2.0).astype(np.float32)

    y_ref, s_ref = _our_beam(jmodel, variables, jcfg, x)

    feats = jnp.asarray(x)
    ctc_logp = jmodel.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos,
        vocab=jcfg.odim, max_decode_tokens=len(y_ref) + 2,
    )

    def dec_step(y, pos, cache, mem_mask):
        return jmodel.apply(variables, y, pos, cache, mem_mask, method="decoder_step")

    def dec_init(memory, maxlen):
        return jmodel.apply(variables, memory, maxlen, method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    np.testing.assert_array_equal(np.asarray(yseq)[: int(length)], y_ref)
    np.testing.assert_allclose(score, s_ref, rtol=1e-5)


def test_bf16_decode_params_token_stability(setup):
    """bfloat16 decode weights (serving default) must produce the same tokens
    as fp32 on non-degenerate inputs (near-tie flips are possible in theory;
    this guards against systematic divergence)."""
    from avsr_tpu.core.config import AVHubertAVSRConfig
    from tests.torch_ref import tiny_jax_config

    tmodel, jmodel, variables, jcfg = setup
    cfg16 = tiny_jax_config()
    cfg16.decoder_param_dtype = "bfloat16"
    jmodel16 = AVSRModel(cfg16)

    rng = np.random.RandomState(53)
    x = (rng.randn(14, 32) * 2.0).astype(np.float32)
    y32, s32 = _our_beam(jmodel, variables, jcfg, x)
    y16, s16 = _our_beam(jmodel16, variables, cfg16, x)
    np.testing.assert_array_equal(y16, y32)
    np.testing.assert_allclose(s16, s32, rtol=0.05, atol=0.3)


def test_shared_src_kv_matches_unshared(setup):
    """shared_src_kv folds beam lanes into the cross-attn query axis; the
    math is identical, so tokens and scores must match the unshared path."""
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(61)
    x = (rng.randn(15, 32) * 2.0).astype(np.float32)

    y_ref, s_ref = _our_beam(jmodel, variables, jcfg, x)  # unshared

    feats = jnp.asarray(x)
    ctc_logp = jmodel.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos,
        vocab=jcfg.odim, shared_src_kv=True,
    )

    def dec_step(y, pos, cache, mem_mask):
        return jmodel.apply(variables, y, pos, cache, mem_mask, method="decoder_step")

    def dec_init(memory, maxlen, beam=1):
        return jmodel.apply(variables, memory, maxlen, beam, method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    np.testing.assert_array_equal(np.asarray(yseq)[: int(length)], y_ref)
    np.testing.assert_allclose(score, s_ref, rtol=1e-5)


def _lazy_beam(jmodel, variables, jcfg, x, beam_size=3, **cfg_kw):
    """Beam search in the serving configuration: lazy reorder + shared src KV."""
    feats = jnp.asarray(x)
    ctc_logp = jmodel.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=beam_size, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos,
        vocab=jcfg.odim, shared_src_kv=True, lazy_reorder=True, **cfg_kw,
    )

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel.apply(variables, memory, maxlen, beam, method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    return np.asarray(yseq)[: int(length)], float(score)


@pytest.mark.parametrize("seed,t", [(71, 14), (73, 20), (79, 9)])
def test_lazy_reorder_matches_eager(setup, seed, t):
    """Ancestry-resolved attention must be token- and score-identical to
    physically reordered caches."""
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(seed)
    x = (rng.randn(t, 32) * 2.0).astype(np.float32)
    y_ref, s_ref = _our_beam(jmodel, variables, jcfg, x)
    y_lazy, s_lazy = _lazy_beam(jmodel, variables, jcfg, x)
    np.testing.assert_array_equal(y_lazy, y_ref)
    np.testing.assert_allclose(s_lazy, s_ref, rtol=1e-4, atol=1e-4)


def test_lazy_reorder_serving_config_matches_torch(setup):
    """Full serving stack (lazy reorder + shared src KV + KV cap) stays
    token-exact vs the reference BatchBeamSearch."""
    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(83)
    x = (rng.randn(18, 32) * 2.0).astype(np.float32)
    ref_yseq, ref_score = _reference_beam(tmodel, x)
    y, s = _lazy_beam(jmodel, variables, jcfg, x, max_decode_tokens=16)
    np.testing.assert_array_equal(y, ref_yseq)
    np.testing.assert_allclose(s, ref_score, rtol=1e-3, atol=1e-3)


def test_lazy_reorder_batched_mixed_lengths(setup):
    """Batched lazy decode, each utterance a different length, must match the
    per-utterance eager result (exercises ancestry under divergent beams and
    padded lanes)."""
    from avsr_tpu.decode.beam import beam_search_batched

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(97)
    t_max = 20
    lens = [20, 13, 7]
    xs = [(rng.randn(t, 32) * 2.0).astype(np.float32) for t in lens]

    singles = [_our_beam(jmodel, variables, jcfg, x) for x in xs]

    feats = np.zeros((len(xs), t_max, 32), np.float32)
    for i, x in enumerate(xs):
        feats[i, : len(x)] = x
    feats = jnp.asarray(feats)
    ctc_logp = jmodel.apply(variables, feats, method="ctc_log_probs")
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=jcfg.sos, eos=jcfg.eos,
        vocab=jcfg.odim, shared_src_kv=True, lazy_reorder=True,
    )

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel.apply(variables, memory, maxlen, beam, method="decoder_init")

    yseqs, lengths, scores = beam_search_batched(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(lens)
    )
    for i, (y_ref, s_ref) in enumerate(singles):
        got = np.asarray(yseqs[i])[: int(lengths[i])]
        np.testing.assert_array_equal(got, y_ref, err_msg=f"utt {i}")
        np.testing.assert_allclose(float(scores[i]), s_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed,t", [(101, 14), (103, 20)])
def test_fused_decode_attention_matches_eager(setup, seed, t):
    """Fused Pallas decode-step kernel (in-place KV writes, prefix-bounded
    reads) must match the physically-reordered XLA path token for token."""
    from avsr_tpu.core.config import AVHubertAVSRConfig
    from tests.torch_ref import tiny_jax_config

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(seed)
    x = (rng.randn(t, 32) * 2.0).astype(np.float32)
    y_ref, s_ref = _our_beam(jmodel, variables, jcfg, x)

    cfg_f = tiny_jax_config()
    cfg_f.decode_fused_attention = True
    jmodel_f = AVSRModel(cfg_f)
    # chunk must divide the KV buffer (t + 2); use a cap that is a multiple
    cap = 16
    feats = jnp.asarray(x)
    ctc_logp = jmodel_f.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=cfg_f.sos, eos=cfg_f.eos,
        vocab=cfg_f.odim, shared_src_kv=True, lazy_reorder=True,
        max_decode_tokens=cap,
    )

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel_f.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel_f.apply(variables, memory, maxlen, beam,
                              method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    got = np.asarray(yseq)[: int(length)]
    np.testing.assert_array_equal(got, y_ref)
    np.testing.assert_allclose(score, s_ref, rtol=2e-4, atol=0.02)


@pytest.mark.parametrize("seed,t", [(111, 14), (113, 20)])
def test_fused_decode_layer_matches_eager(setup, seed, t):
    """ONE-Pallas-program-per-layer decode step (norm+QKV+self-attn+cross-
    attn+FFN, ops/pallas/decoder_layer) must stay token-exact vs the
    physically-reordered XLA path."""
    from tests.torch_ref import tiny_jax_config

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(seed)
    x = (rng.randn(t, 32) * 2.0).astype(np.float32)
    y_ref, s_ref = _our_beam(jmodel, variables, jcfg, x)

    cfg_f = tiny_jax_config()
    cfg_f.decode_fused_layer = True
    jmodel_f = AVSRModel(cfg_f)
    feats = jnp.asarray(x)
    ctc_logp = jmodel_f.apply(variables, feats[None], method="ctc_log_probs")[0]
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=cfg_f.sos, eos=cfg_f.eos,
        vocab=cfg_f.odim, shared_src_kv=True, lazy_reorder=True,
        max_decode_tokens=16,
    )

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel_f.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel_f.apply(variables, memory, maxlen, beam,
                              method="decoder_init")

    yseq, length, score = beam_search(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(x.shape[0])
    )
    got = np.asarray(yseq)[: int(length)]
    np.testing.assert_array_equal(got, y_ref)
    np.testing.assert_allclose(score, s_ref, rtol=2e-4, atol=0.02)


def test_fused_decode_layer_batched_mixed_lengths(setup):
    """Batched fused-layer decode (odd batch -> group clamp, padded memory
    masks) must match per-utterance eager decoding."""
    from avsr_tpu.decode.beam import beam_search_batched
    from tests.torch_ref import tiny_jax_config

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(131)
    t_max = 20
    lens = [20, 13, 7]
    xs = [(rng.randn(t, 32) * 2.0).astype(np.float32) for t in lens]
    singles = [_our_beam(jmodel, variables, jcfg, x) for x in xs]

    cfg_f = tiny_jax_config()
    cfg_f.decode_fused_layer = True
    jmodel_f = AVSRModel(cfg_f)
    feats = np.zeros((len(xs), t_max, 32), np.float32)
    for i, x in enumerate(xs):
        feats[i, : len(x)] = x
    feats = jnp.asarray(feats)
    ctc_logp = jmodel_f.apply(variables, feats, method="ctc_log_probs")
    bcfg = BeamSearchConfig(
        beam_size=3, ctc_weight=0.1, sos=cfg_f.sos, eos=cfg_f.eos,
        vocab=cfg_f.odim, shared_src_kv=True, lazy_reorder=True,
    )

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel_f.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel_f.apply(variables, memory, maxlen, beam,
                              method="decoder_init")

    yseqs, lengths, scores = beam_search_batched(
        bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(lens)
    )
    for i, (y_ref, s_ref) in enumerate(singles):
        got = np.asarray(yseqs[i])[: int(lengths[i])]
        np.testing.assert_array_equal(got, y_ref, err_msg=f"utt {i}")
        np.testing.assert_allclose(float(scores[i]), s_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ctc_w,penalty", [(0.1, 0.0), (0.1, 0.5), (0.0, 0.0)])
def test_fused_bookkeeping_matches_xla_path(setup, ctc_w, penalty):
    """The single-Pallas-program bookkeeping step (ops/pallas/beam_update.py)
    must be bit-identical to the plain XLA op chain it replaces — batched,
    mixed lengths, across CTC weight and length-penalty variants."""
    from avsr_tpu.decode.beam import beam_search_batched

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(31)
    lens = [12, 7, 16]
    t_max = max(lens)
    xs = [(rng.randn(t, 32) * 2.0).astype(np.float32) for t in lens]
    feats = jnp.asarray(
        np.stack([np.pad(x, ((0, t_max - x.shape[0]), (0, 0))) for x in xs])
    )
    ctc_logp = jmodel.apply(variables, feats, method="ctc_log_probs")

    def dec_step(y, pos, cache, mem_mask, lane_bias=None):
        return jmodel.apply(
            variables, y, pos, cache, mem_mask, lane_bias, method="decoder_step"
        )

    def dec_init(memory, maxlen, beam=1):
        return jmodel.apply(variables, memory, maxlen, beam, method="decoder_init")

    results = []
    for fused in (True, False):
        bcfg = BeamSearchConfig(
            beam_size=3, ctc_weight=ctc_w, sos=jcfg.sos, eos=jcfg.eos,
            vocab=jcfg.odim, penalty=penalty, shared_src_kv=True,
            lazy_reorder=True, fused_bookkeeping=fused,
        )
        results.append(
            beam_search_batched(
                bcfg, dec_step, dec_init, feats, ctc_logp, jnp.asarray(lens)
            )
        )
    (y1, l1, s1), (y2, l2, s2) = results
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))  # bit-exact


def test_bf16_encode_token_stability(setup):
    """Recognizer(encode_dtype='bfloat16'): the bf16 encoder forward must
    not change decoded tokens on realistic inputs (same contract as the
    bf16 KV-cache / decode-weight knobs)."""
    from avsr_tpu.decode.recognizer import Recognizer

    tmodel, jmodel, variables, jcfg = setup
    rng = np.random.RandomState(41)
    feats_a = [rng.randn(14, 104).astype(np.float32) for _ in range(2)]
    feats_v = [rng.randn(14, 88, 88, 1).astype(np.float32) for _ in range(2)]
    outs = {}
    for dt in ("float32", "bfloat16"):
        rec = Recognizer(
            model=jmodel, variables=variables, cfg=jcfg,
            t_buckets=(16,), encode_dtype=dt,
        )
        outs[dt] = rec.transcribe_batch(feats_a, feats_v, mode="beam")
    assert len(outs["float32"]) == len(outs["bfloat16"]) == 2
    for y32, y16 in zip(outs["float32"], outs["bfloat16"]):
        np.testing.assert_array_equal(np.asarray(y32), np.asarray(y16))


def test_batched_ctc_scorer_matches_vmapped():
    """score_candidates_cols_batched (T-major, (T, B*K*S) tiles) must equal
    the per-utterance vmapped form it replaces in the beam loop."""
    rng = np.random.RandomState(7)
    b, t, k, s, v = 3, 40, 3, 4, 25
    xlens = jnp.asarray([40, 33, 17], jnp.int32)
    logp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(np.float32)
    )
    logp = jax.vmap(ctc_prefix.pad_log_probs, in_axes=(0, 0))(logp, xlens)
    cum_b = jnp.cumsum(logp[:, :, 0], axis=1)
    part_ids = jnp.asarray(rng.randint(1, v, size=(b, k, s)), jnp.int32)
    state = ctc_prefix.CTCPrefixState(
        r=jnp.asarray(
            -np.abs(rng.randn(b, k, t, 2)).astype(np.float32) * 5.0
        ),
        s=jnp.asarray(rng.randn(b, k).astype(np.float32)),
        last=jnp.asarray(rng.randint(1, v, size=(b, k)), jnp.int32),
        out_len=jnp.asarray([0, 2, 5], jnp.int32),
    )
    xs_b = jnp.take_along_axis(
        logp[:, :, None, None, :],
        part_ids[:, None, :, :, None],
        axis=-1,
    )[..., 0]  # (B, T, K, S)
    want = jax.vmap(
        ctc_prefix.score_candidates_cols,
        in_axes=(0, 0, 0, 0, 0, None, None),
    )(xs_b, cum_b, xlens, state, part_ids, 2, 0)
    got = ctc_prefix.score_candidates_cols_batched(
        jnp.transpose(xs_b, (1, 0, 2, 3)), cum_b, xlens, state, part_ids, 2, 0
    )
    for name, g, w in zip(("psi_cand", "psi_eos", "r_cands"), got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5, err_msg=name
        )
