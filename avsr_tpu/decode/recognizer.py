"""End-to-end recognizer: features -> encoder -> joint CTC/attn beam -> tokens.

TPU execution strategy (vs the reference InferenceEngine, script/evaluation.py:209):
  - utterances are padded into a small set of static (batch, frames) buckets so
    every shape compiles once and is reused;
  - the encoder runs as one jitted batch; beam search is vmapped across the
    batch, so B utterances decode concurrently in one XLA program (the
    reference decodes batch=1 with a Python token loop);
  - greedy CTC decoding is available as a fast path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import AVHubertAVSRConfig
from avsr_tpu.decode.beam import BeamSearchConfig, beam_search_batched, greedy_ctc
from avsr_tpu.models.e2e import AVSRModel


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"utterance of {n} frames exceeds largest bucket {buckets[-1]}")


@dataclass
class Recognizer:
    model: AVSRModel
    variables: dict
    cfg: AVHubertAVSRConfig
    beam_size: int = 3
    ctc_weight: float = 0.1
    t_buckets: Sequence[int] = (96, 192, 288, 384)
    # audio layout per video frame: fbank features (1 x 104) for the
    # avhubert family, raw waveform (640 x 1) for the conformer family
    audio_rate: int = 1
    audio_dim: int = 104
    # self-KV buffer cap (see BeamSearchConfig.max_decode_tokens);
    # None = reference-exact frame-count-sized buffer
    max_decode_tokens: int | None = None
    # single-Pallas-program bookkeeping step (BeamSearchConfig equivalent).
    # Default False: the plain XLA ops measure faster at serving shapes —
    # the kernel boundary costs more in relayout copies + lost fusions than
    # the launch overhead it removes (see BeamSearchConfig.fused_bookkeeping)
    fused_bookkeeping: bool = False
    # encoder forward dtype at decode time. 'bfloat16' runs the 24x1024
    # encoder (+CTC head input) in bf16 — ~4x the fp32 MXU rate on v5e —
    # with the CTC log-softmax and all downstream beam math still fp32.
    # Like the bf16 decoder weights/caches, this trades exact fp32 parity
    # for speed: token-stability is tested at tiny scale and the flagship
    # stepwise-score bound covers the peaked trained-weight regime.
    # 'float32' (default) keeps the reference-exact serving numerics.
    encode_dtype: str = "float32"
    # video transfer codec: "uint8" uploads raw crops; "delta" uploads
    # temporal deltas (lossless, reconstructed on device — see data/wire.py);
    # "delta2" additionally zigzag-remaps and nibble-plane-packs the deltas
    # (same bytes; ~7-17% better in-flight compression on textured crops
    # with several-gray-level deltas, slightly worse on ultra-smooth
    # content — measure per payload). Smooth real video deltas compress
    # several-fold in transit on links that compress, turning the dominant
    # host->device transfer into a minor one. Exactness is unconditional,
    # so the delta codec is the default.
    video_wire: str = "delta"
    # data-parallel decode: shard the batch dim of the encoder + beam
    # programs over the mesh's 'data' axis (weights replicated). Eval WER
    # sweeps then scale with chips — each chunk is one batch element
    # (SURVEY §5.7). None = single-device.
    mesh: object | None = None
    _encode_cache: dict = field(default_factory=dict, repr=False)
    _beam_cache: dict = field(default_factory=dict, repr=False)
    _greedy_cache: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_pretrained(cls, model_dir: str, **kw) -> "Recognizer":
        from avsr_tpu.core.checkpoint import load_pretrained

        cfg, variables = load_pretrained(model_dir)
        return cls(model=AVSRModel(cfg), variables=variables, cfg=cfg, **kw)

    # ---------------- jitted stages (cached per shape) ----------------

    def _shardings(self, n_batch_args: int):
        """(in_shardings, out_shardings) kwargs for a decode-stage jit:
        variables replicated, batch-leading args/results on the data axis."""
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        return {
            "in_shardings": (repl,) + (data,) * n_batch_args,
            "out_shardings": data,
        }

    def _encode_fn(self):
        # NOTE: variables are a traced argument, never a closure constant —
        # closed-over weights become XLA constants and constant-folding the
        # 325M-parameter model takes minutes.
        if "fn" not in self._encode_cache:
            model = self.model

            wire = self.video_wire
            enc_dtype = jnp.dtype(self.encode_dtype)

            @functools.partial(jax.jit, **self._shardings(3))
            def run(variables, audios, videos, lengths):
                if videos.dtype == jnp.uint8:
                    # crops travel host->device as uint8 (4x less transfer
                    # over the interconnect); normalize on device
                    from avsr_tpu.data.transforms import VIDEO_MEAN, VIDEO_STD
                    from avsr_tpu.data.wire import (
                        delta2_decode_video,
                        delta_decode_video,
                    )

                    if wire == "delta":
                        videos = delta_decode_video(videos)
                    elif wire == "delta2":
                        videos = delta2_decode_video(videos)
                    videos = (videos.astype(jnp.float32) / 255.0 - VIDEO_MEAN) / VIDEO_STD
                if enc_dtype != jnp.float32:
                    # bf16 encoder forward: cast params, BN stats and inputs
                    # (fp32 BN stats would re-promote every trunk activation
                    # to fp32 via flax's dtype promotion, silently undoing
                    # the cast). At inference BN is just an affine rescale.
                    variables = jax.tree.map(
                        lambda x: x.astype(enc_dtype)
                        if x.dtype == jnp.float32 else x,
                        variables,
                    )
                    audios = audios.astype(enc_dtype)
                    videos = videos.astype(enc_dtype)
                feats = model.apply(
                    variables, audios, videos, lengths, method="encode"
                )
                ctc_logp = model.apply(variables, feats, method="ctc_log_probs")
                # beam math downstream is fp32 regardless of encode dtype
                return feats.astype(jnp.float32), ctc_logp

            self._encode_cache["fn"] = run
        return self._encode_cache["fn"]

    def _beam_fn(self):
        if "fn" not in self._beam_cache:
            bcfg = BeamSearchConfig(
                beam_size=self.beam_size,
                ctc_weight=self.ctc_weight,
                sos=self.cfg.sos,
                eos=self.cfg.eos,
                blank=self.cfg.blank,
                vocab=self.cfg.odim,
                max_decode_tokens=self.max_decode_tokens,
                fused_bookkeeping=self.fused_bookkeeping,
                # both recognizer families use TransformerDecoder, whose
                # cross-attention folds beam lanes into the query axis
                shared_src_kv=True,
                # and whose decode step resolves beam ancestry at attention
                # time, so the KV caches are never physically reshuffled
                lazy_reorder=True,
            )
            model = self.model

            @functools.partial(jax.jit, **self._shardings(3))
            def run(variables, feats, ctc_logp, xlens):
                def dec_step(y, pos, cache, mem_mask, lane_bias=None):
                    return model.apply(
                        variables, y, pos, cache, mem_mask, lane_bias,
                        method="decoder_step",
                    )

                def dec_init(memory, maxlen, beam=1):
                    return model.apply(
                        variables, memory, maxlen, beam, method="decoder_init"
                    )

                return beam_search_batched(
                    bcfg, dec_step, dec_init, feats, ctc_logp, xlens
                )

            self._beam_cache["fn"] = run
        return self._beam_cache["fn"]

    def _greedy_fn(self):
        if "fn" not in self._greedy_cache:
            sh = self._shardings(2)
            if sh:
                sh["in_shardings"] = sh["in_shardings"][1:]  # no variables arg
            self._greedy_cache["fn"] = jax.jit(
                jax.vmap(functools.partial(greedy_ctc, blank=self.cfg.blank)),
                **sh,
            )
        return self._greedy_cache["fn"]

    # ---------------- host-side batching ----------------

    def _pad_batch(
        self,
        audio_feats: List[np.ndarray],  # each (T_i, 104)
        videos: List[np.ndarray],  # each (T_i, 88, 88, 1)
        batch_pad: Optional[int] = None,
    ):
        lengths = np.asarray([len(v) for v in videos], np.int32)
        t_b = pick_bucket(self.t_buckets, int(lengths.max()))
        b = batch_pad or len(videos)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            b = -(-b // n_data) * n_data  # round up to a shardable batch
        vdtype = np.uint8 if videos[0].dtype == np.uint8 else np.float32
        adtype = np.dtype(np.float32)
        if self.encode_dtype == "bfloat16":
            # the encode stage casts fp32 features to bf16 on device anyway
            # (round-to-nearest-even both sides), so uploading bf16 is
            # bit-identical and halves the audio payload
            import ml_dtypes

            adtype = np.dtype(ml_dtypes.bfloat16)
        aud = np.zeros((b, t_b * self.audio_rate, self.audio_dim), adtype)
        vid = np.zeros((b, t_b, 88, 88, 1), vdtype)
        for i, (a, v) in enumerate(zip(audio_feats, videos)):
            a = a.reshape(-1, self.audio_dim)
            aud[i, : len(a)] = a
            vid[i, : len(v)] = v
        lens = np.zeros((b,), np.int32)
        lens[: len(videos)] = lengths
        # padded rows decode 1 dummy frame to keep while_loops trivial
        lens[len(videos):] = 1
        if vdtype == np.uint8 and self.video_wire == "delta":
            from avsr_tpu.data.wire import delta_encode_video

            vid = delta_encode_video(vid)
        elif vdtype == np.uint8 and self.video_wire == "delta2":
            from avsr_tpu.data.wire import delta2_encode_video

            vid = delta2_encode_video(vid)
        return jnp.asarray(aud), jnp.asarray(vid), jnp.asarray(lens), len(videos)

    def transcribe_batch_async(
        self,
        audio_feats: List[np.ndarray],
        videos: List[np.ndarray],
        mode: str = "beam",
        batch_pad: Optional[int] = None,
    ) -> "_PendingBatch":
        """Dispatch a batch without blocking (jax dispatch is async): the
        caller can collate/transfer the next batch while this one decodes.
        """
        aud, vid, lens, n = self._pad_batch(audio_feats, videos, batch_pad)
        feats, ctc_logp = self._encode_fn()(self.variables, aud, vid, lens)
        if mode == "greedy":
            toks, tlens = self._greedy_fn()(ctc_logp, lens)
            return _PendingBatch(self, "greedy", n, (toks, tlens))
        outs = self._beam_fn()(self.variables, feats, ctc_logp, lens)
        return _PendingBatch(self, "beam", n, outs)

    def transcribe_batch(
        self,
        audio_feats: List[np.ndarray],
        videos: List[np.ndarray],
        mode: str = "beam",
        batch_pad: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Decode a batch; returns per-utterance token ids (no sos/eos)."""
        return self.transcribe_batch_async(
            audio_feats, videos, mode, batch_pad
        ).result()

    def transcribe(
        self, audio_feats: np.ndarray, video: np.ndarray, mode: str = "beam"
    ) -> np.ndarray:
        return self.transcribe_batch([audio_feats], [video], mode=mode)[0]


class _PendingBatch:
    """In-flight decode result; .result() blocks and post-processes."""

    def __init__(self, rec: Recognizer, mode: str, n: int, arrays):
        self.rec = rec
        self.mode = mode
        self.n = n
        self.arrays = arrays

    def result(self) -> List[np.ndarray]:
        if self.mode == "greedy":
            toks, tlens = self.arrays
            toks, tlens = np.asarray(toks), np.asarray(tlens)
            return [toks[i, : tlens[i]] for i in range(self.n)]
        yseqs, ylens, _scores = self.arrays
        yseqs, ylens = np.asarray(yseqs), np.asarray(ylens)
        out = []
        for i in range(self.n):
            seq = yseqs[i, 1 : ylens[i]]  # strip sos
            seq = seq[seq != self.rec.cfg.eos]  # strip eos (incl. forced double)
            out.append(seq)
        return out
