"""Generation for the AV2Text (MuAViC) seq2seq family.

The reference uses HF `generate()` (script/evaluation.py:200); here decoding
runs through the same fixed-shape beam machinery as the other families with
attention-only scoring (ctc_weight=0), vmapped over the batch.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.decode.beam import BeamSearchConfig, beam_search_batched
from avsr_tpu.models.av2text import AV2TextModel


class S2TGenerator:
    def __init__(self, model: AV2TextModel, variables: dict, beam_size: int = 3):
        self.model = model
        self.variables = variables
        cfg = model.cfg
        self.bcfg = BeamSearchConfig(
            beam_size=beam_size,
            ctc_weight=0.0,
            sos=cfg.decoder_start_token_id,
            eos=cfg.eos_token_id,
            blank=cfg.pad_token_id,  # unused (ctc off)
            vocab=cfg.vocab_size,
        )
        model_ = model

        @jax.jit
        def run(variables, audios, videos, lengths):
            memory = model_.apply(
                variables, audios, videos, lengths, method="encode"
            )

            def dec_step(y, pos, cache, mem_mask):
                return model_.apply(
                    variables, y, pos, cache, mem_mask, method="decoder_step"
                )

            def dec_init(mem, maxlen):
                return model_.apply(variables, mem, maxlen, method="decoder_init")

            dummy_ctc = jnp.zeros(
                memory.shape[:2] + (self.bcfg.vocab,), jnp.float32
            )
            return beam_search_batched(
                self.bcfg, dec_step, dec_init, memory, dummy_ctc, lengths
            )

        self._run = run

    def generate(
        self, audios: np.ndarray, videos: np.ndarray, lengths: np.ndarray
    ) -> List[np.ndarray]:
        """Returns per-utterance token ids (sos/eos stripped)."""
        yseqs, ylens, _ = self._run(
            self.variables, jnp.asarray(audios), jnp.asarray(videos),
            jnp.asarray(lengths),
        )
        yseqs, ylens = np.asarray(yseqs), np.asarray(ylens)
        out = []
        eos = self.bcfg.eos
        for i in range(len(yseqs)):
            seq = yseqs[i, 1 : ylens[i]]
            out.append(seq[seq != eos])
        return out
