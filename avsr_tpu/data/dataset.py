"""Training datasets: streamed HF mixture (online) + synthetic (offline).

Mirrors the reference mixture recipe (/root/reference/script/train.py:40-167):
LRS2 (train+pretrain) 0.30, VoxCeleb2 dev 0.20, AVYT (talking+silent) 0.25,
AVYT-mix 0.25 — or with MCoRec: .25/.10/.20/.25/.20 — interleaved with seed 11
and 'all_exhausted'; LRS2 train tars double as the interferer pool for SNR
augmentation. Retries downloads 5x with 10 s backoff.

The synthetic dataset generates deterministic AV samples with pre-decoded
frames/waveforms so the full train/eval path runs without network or media
backends.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import numpy as np

MIXTURE_PROBS = {"lrs2": 0.3, "vox2": 0.2, "avyt": 0.25, "avyt-mix": 0.25}
MIXTURE_PROBS_MCOREC = {
    "lrs2": 0.25,
    "vox2": 0.10,
    "avyt": 0.20,
    "avyt-mix": 0.25,
    "mcorec": 0.2,
}
INTERLEAVE_SEED = 11


def _retry(fn, tries: int = 5, sleep_s: float = 10.0):
    for attempt in range(tries):
        try:
            return fn()
        except Exception:
            if attempt == tries - 1:
                raise
            time.sleep(sleep_s)


def load_avsr_mixture(
    cache_dir: str = "data-bin/cache",
    include_mcorec: bool = False,
    streaming: bool = True,
):
    """Build (train, valid, interferer) HF datasets (requires network)."""
    import datasets

    def load(config):
        return _retry(
            lambda: datasets.load_dataset(
                "nguyenvulebinh/AVYT", config, streaming=streaming,
                cache_dir=cache_dir,
            ).remove_columns(["__key__", "__url__"])
        )

    lrs2, vox2, avyt, avyt_mix = load("lrs2"), load("vox2"), load("avyt"), load("avyt-mix")
    mcorec = None
    if include_mcorec:
        mcorec = _retry(
            lambda: datasets.load_dataset(
                "MCoRecChallenge/MCoRec", streaming=streaming, cache_dir=cache_dir
            ).remove_columns(["__key__", "__url__"])
        )

    if not streaming:
        for ds in filter(None, [lrs2, vox2, avyt, avyt_mix, mcorec]):
            for split in ds:
                n = len(ds[split])
                shards = max(20, n // 10000) if n > 10000 else 1
                ds[split] = ds[split].to_iterable_dataset(num_shards=shards)

    probs = MIXTURE_PROBS_MCOREC if include_mcorec else MIXTURE_PROBS
    trains = {
        "lrs2": datasets.concatenate_datasets([lrs2["train"], lrs2["pretrain"]]),
        "vox2": vox2["dev"],
        "avyt": datasets.concatenate_datasets([avyt["talking"], avyt["silent"]]),
        "avyt-mix": avyt_mix["train"],
    }
    valids = [lrs2["valid"], lrs2["test_snr_0_interferer_2"], avyt_mix["test"]]
    if include_mcorec:
        trains["mcorec"] = mcorec["train"]
        valids = [mcorec["valid"]]

    train = datasets.interleave_datasets(
        [trains[k] for k in probs],
        probabilities=[probs[k] for k in probs],
        seed=INTERLEAVE_SEED,
        stopping_strategy="all_exhausted",
    )
    valid = datasets.interleave_datasets(valids, stopping_strategy="first_exhausted")

    def fmt(sample):
        if isinstance(sample.get("label"), bytes):
            sample["label"] = sample["label"].decode("utf-8")
        return sample

    interferer = _retry(
        lambda: datasets.load_dataset(
            "nguyenvulebinh/AVYT", "lrs2", cache_dir=cache_dir,
            data_files="lrs2/lrs2-train-*.tar",
        ).remove_columns(["__key__", "__url__"])["train"]
    )
    return train.map(fmt), valid.map(fmt), interferer


def shard_for_host(dataset, process_index: Optional[int] = None,
                   process_count: Optional[int] = None):
    """Give each host a distinct set of shards (per-rank tar sharding,
    reference train.py:82-85 + dispatch_batches=False)."""
    import jax

    process_index = jax.process_index() if process_index is None else process_index
    process_count = jax.process_count() if process_count is None else process_count
    if process_count == 1:
        return dataset
    return dataset.shard(num_shards=process_count, index=process_index)


# ---------------------------------------------------------------------------
# synthetic offline dataset
# ---------------------------------------------------------------------------

_WORDS = (
    "THE QUICK BROWN FOX JUMPS OVER LAZY DOG WE ARE BUILDING SPEECH MODELS "
    "ON TENSOR PROCESSING UNITS WITH GOOD RESULTS EVERY DAY"
).split()


def synthetic_samples(
    n: int, seed: int = 0, min_frames: int = 16, max_frames: int = 80
) -> Iterator[Dict]:
    """Deterministic pre-decoded AV samples for offline pipelines/tests."""
    rng = np.random.RandomState(seed)
    for i in range(n):
        t = int(rng.randint(min_frames, max_frames + 1))
        n_words = int(rng.randint(2, 8))
        words = [str(_WORDS[rng.randint(len(_WORDS))]) for _ in range(n_words)]
        yield {
            "sample_id": f"synthetic_{i}",
            "video_frames": rng.randint(0, 256, size=(t, 96, 96, 1)).astype(
                np.float32
            ),
            "audio_wave": (rng.randn(t * 640) * 0.1).astype(np.float32),
            "label": " ".join(words),
            "length": t,
        }
