"""Offline end-to-end tests: collator -> training loop -> recognizer."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from avsr_tpu.data.collate import DataCollator  # noqa: E402
from avsr_tpu.data.dataset import synthetic_samples  # noqa: E402
from avsr_tpu.data.transforms import AudioTransform, VideoTransform  # noqa: E402
from avsr_tpu.train.loop import LoopConfig, batches_from_samples, run_training  # noqa: E402
from avsr_tpu.train.trainer import TrainConfig  # noqa: E402
from tests.conftest import requires_reference
from tests.test_train import tiny_cfg  # noqa: E402


class DummyTokenizer:
    def tokenize(self, text):
        # deterministic across processes (builtin hash() is per-process
        # randomized, which broke the spawn-worker-pool equality test)
        return np.asarray(
            [(sum(ord(c) * 31 ** i for i, c in enumerate(w)) % 25) + 1
             for w in text.split()],
            np.int32,
        )


def make_collator(subset="test", seed=0):
    return DataCollator(
        text_transform=DummyTokenizer(),
        video_transform=VideoTransform(subset),
        audio_transform=AudioTransform(subset),
        seed=seed,
    )


def test_collator_shapes_and_buckets():
    coll = make_collator()
    coll.t_buckets = (32, 64, 128)
    coll.l_buckets = (8, 16)
    samples = list(synthetic_samples(3, seed=0, min_frames=20, max_frames=40))
    batch = coll(samples)
    assert batch["videos"].shape[1] in (32, 64)
    assert batch["videos"].shape[2:] == (88, 88, 1)
    assert batch["audios"].shape[:2] == batch["videos"].shape[:2]
    assert batch["labels"].shape[1] in (8, 16)
    assert (batch["video_lengths"] <= batch["videos"].shape[1]).all()
    # features: audio rows == video frames per sample
    for i, s in enumerate(samples):
        assert batch["video_lengths"][i] == s["length"]


def test_train_augmentations_run():
    coll = make_collator("train", seed=3)
    samples = list(synthetic_samples(2, seed=2, min_frames=30, max_frames=40))
    batch = coll(samples)
    assert np.isfinite(batch["videos"]).all()
    assert np.isfinite(batch["audios"]).all()


def test_batches_from_samples_accum():
    coll = make_collator()
    it = batches_from_samples(
        synthetic_samples(8, seed=1, min_frames=16, max_frames=30), coll, 2, 2
    )
    batch = next(it)
    assert batch["videos"].shape[:2] == (2, 2)


def test_run_training_synthetic(tmp_path):
    """Full loop: synthetic data, 3 steps, checkpoint written, resume works."""
    loop_cfg = LoopConfig(
        output_dir=str(tmp_path),
        max_steps=3,
        batch_size=1,  # per data-parallel device (8 virtual) -> global 8
        grad_accum=1,
        save_steps=2,
        eval_steps=2,
        eval_batches=1,
        log_interval=1,
    )
    tcfg = TrainConfig(warmup_steps=1, max_steps=3, grad_accum=1)
    coll = make_collator("train", seed=0)
    state = run_training(
        tiny_cfg(),
        loop_cfg,
        synthetic_samples(64, seed=0, min_frames=16, max_frames=24),
        coll,
        valid_samples=lambda: synthetic_samples(8, seed=1, min_frames=16, max_frames=24),
        valid_collator=make_collator("test"),
        train_cfg=tcfg,
    )
    assert int(state.step) == 3
    import os

    assert os.path.isdir(tmp_path / "checkpoints" / "2")

    # resume picks up the saved step
    state2 = run_training(
        tiny_cfg(),
        loop_cfg,
        synthetic_samples(64, seed=2, min_frames=16, max_frames=24),
        coll,
        train_cfg=tcfg,
        resume_from_checkpoint=True,
    )
    assert int(state2.step) == 3


def test_recognizer_roundtrip():
    """Recognizer end-to-end on the tiny model: batch beam + greedy decode."""
    import jax.numpy as jnp

    from avsr_tpu.decode.recognizer import Recognizer
    from avsr_tpu.models.e2e import AVSRModel

    cfg = tiny_cfg()
    model = AVSRModel(cfg)
    rng = np.random.RandomState(0)
    videos = jnp.asarray(rng.randn(1, 4, 88, 88, 1).astype(np.float32))
    audios = jnp.asarray(rng.randn(1, 4, 104).astype(np.float32))
    labels = jnp.asarray([[3, 4]], dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, videos, audios, labels,
        jnp.asarray([4]), jnp.asarray([2]),
    )
    rec = Recognizer(
        model=model, variables=variables, cfg=cfg, t_buckets=(16, 32)
    )
    auds = [rng.randn(t, 104).astype(np.float32) for t in (10, 14, 7)]
    vids = [rng.randn(t, 88, 88, 1).astype(np.float32) for t in (10, 14, 7)]
    for mode in ("beam", "greedy"):
        outs = rec.transcribe_batch(auds, vids, mode=mode)
        assert len(outs) == 3
        for toks in outs:
            assert toks.ndim == 1
            assert all(0 < t < cfg.odim for t in toks)  # never blank
            if mode == "beam":
                assert all(t != cfg.eos for t in toks)  # sos/eos stripped

    # single-utterance convenience API
    toks = rec.transcribe(auds[0], vids[0])
    np.testing.assert_array_equal(toks, rec.transcribe_batch(auds[:1], vids[:1])[0])


def test_cli_parsers():
    from avsr_tpu.cli.evaluation import build_parser as eval_parser
    from avsr_tpu.cli.train import build_parser as train_parser

    args = train_parser().parse_args(["--batch_size", "2", "--synthetic_dataset"])
    assert args.batch_size == 2 and args.synthetic_dataset
    args = eval_parser().parse_args(["--dataset_name", "AVCocktail", "--set_id", "video_3"])
    assert args.set_id == "video_3"


def test_batches_from_samples_worker_pools_match_inline():
    """Thread and spawn-process worker pools must yield the exact batches,
    in order, that inline collation produces (deterministic seeded collator).
    """
    def batches(num_workers, use_processes=False):
        coll = make_collator("train", seed=5)
        it = batches_from_samples(
            synthetic_samples(12, seed=4, min_frames=16, max_frames=30),
            coll, 2, 2, num_workers=num_workers, use_processes=use_processes,
        )
        out = [next(it) for _ in range(3)]
        it.close()
        return out

    inline = batches(0)
    threaded = batches(3)
    for a, b in zip(inline, threaded):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"threads {k}")
    procs = batches(2, use_processes=True)
    for a, b in zip(inline, procs):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"processes {k}")


def test_interferer_pool_rotates_off_critical_path():
    """InterfererPool: draws never decode inline; background refresher
    rotates entries toward full coverage (cli/train.py interferer path)."""
    import time

    from avsr_tpu.data.dataset import InterfererPool

    waves = [np.full((100 + i,), float(i), np.float32) for i in range(40)]
    decoded = []

    def decode_fn(sample):
        decoded.append(sample["i"])
        return waves[sample["i"]]

    ds = [{"i": i} for i in range(40)]
    pool = InterfererPool(
        ds, size=16, decode_fn=decode_fn, warm_start=4,
        refresh_per_draw=1.0, seed=0,
    )
    assert len(pool._entries) == 4  # warm start decoded synchronously
    n_sync = len(decoded)
    rng = np.random.RandomState(1)
    outs = [pool(rng) for _ in range(64)]
    # every draw returns a pool waveform without decoding inline
    assert all(any(o is w for w in waves) for o in outs)
    # background refresher makes progress (grow phase, then rotation)
    deadline = time.time() + 10.0
    while pool.refreshes < n_sync + 8 and time.time() < deadline:
        pool(rng)
        time.sleep(0.01)
    assert pool.refreshes > n_sync
    assert len(pool._entries) <= 16
    # draws hit multiple distinct entries (uniform over the pool)
    assert len({id(o) for o in outs}) > 1
