"""ASD train/eval driver (reference src/talking_detector/ASD.py:11-103):
optimizer loop learns, eval scores are probabilities, AP metric sane, and
the training path's lossAV head is consistent with the scoring path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.frontends.asd import ASDModel  # noqa: E402
from avsr_tpu.frontends.asd_trainer import ASDTrainer, average_precision  # noqa: E402

B, T, HW = 2, 4, 48  # tiny spatial size: the network is fully convolutional


def synthetic_batch(seed=0):
    rng = np.random.RandomState(seed)
    # learnable signal: speaking frames get bright frames + loud audio
    labels = rng.randint(0, 2, size=(B, T)).astype(np.int32)
    visual = rng.rand(B, T, HW, HW).astype(np.float32) * 40 + 80
    visual += 80.0 * labels[..., None, None]
    audio = rng.randn(B, 4 * T, 13).astype(np.float32) * 0.1
    audio += 2.0 * np.repeat(labels, 4, axis=1)[..., None]
    return audio, visual, labels


def test_asd_training_loss_decreases_and_lr_decays():
    batch = synthetic_batch()
    trainer = ASDTrainer(lr=0.005, seed=0)
    loss0, lr0 = trainer.train_network([batch] * 2, epoch=1, verbose=False)
    losses = [loss0]
    for epoch in range(2, 7):
        loss, lr = trainer.train_network([batch] * 2, epoch=epoch,
                                         verbose=False)
        losses.append(loss)
    # reference schedules: StepLR gamma 0.95 per epoch (ASD.py:17),
    # r = 1.3 - 0.02*(epoch-1) (:26)
    assert lr0 == pytest.approx(0.005)
    assert lr == pytest.approx(0.005 * 0.95 ** 5)
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_asd_eval_scores_and_ap(tmp_path):
    batch = synthetic_batch()
    trainer = ASDTrainer(lr=0.005, seed=0)
    for epoch in range(1, 5):
        trainer.train_network([batch] * 2, epoch=epoch, verbose=False)
    scores = trainer.evaluate_network([batch])
    assert scores.shape == (B * T,)
    assert ((scores >= 0) & (scores <= 1)).all()
    # CSV + mAP path against a ground-truth CSV in the AVA format
    import pandas

    labels = batch[2].reshape(-1)
    truth = pandas.DataFrame({
        "video_id": ["v"] * len(labels),
        "frame_timestamp": np.arange(len(labels)) / 25.0,
        "label": ["SPEAKING_AUDIBLE" if l else "NOT_SPEAKING" for l in labels],
        "label_id": labels,
        "instance_id": [f"i{i}" for i in range(len(labels))],
    })
    orig = tmp_path / "orig.csv"
    truth.to_csv(orig, index=False)
    out_csv = tmp_path / "pred.csv"
    scores2, mAP = trainer.evaluate_network(
        [batch], eval_csv_save=str(out_csv), eval_orig=str(orig)
    )
    np.testing.assert_allclose(scores2, scores)
    # the model fit this batch, so ranking must beat chance decisively
    assert mAP > 0.9
    saved = pandas.read_csv(out_csv)
    assert "label_id" not in saved and "instance_id" not in saved
    assert (saved["label"] == "SPEAKING_AUDIBLE").all()
    np.testing.assert_allclose(saved["score"].to_numpy(), scores, rtol=1e-6)


def test_average_precision_metric():
    y = np.array([1, 1, 0, 0])
    assert average_precision(np.array([0.9, 0.8, 0.2, 0.1]), y) == 1.0
    ap_rev = average_precision(np.array([0.1, 0.2, 0.8, 0.9]), y)
    assert ap_rev < 0.6
    assert average_precision(np.zeros(4), np.zeros(4)) == 0.0


def test_train_logits_consistent_with_score_path():
    """train_logits(train=False) lossAV column == __call__ scores (the
    setup() refactor must not change the serving path)."""
    model = ASDModel()
    audio, visual, _ = synthetic_batch(1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(visual),
        method="train_logits",
    )
    score = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(audio), jnp.asarray(visual),
    )
    la, lv = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(audio), jnp.asarray(visual), False,
        method="train_logits",
    )
    np.testing.assert_allclose(np.asarray(score), np.asarray(la[..., 1]),
                               rtol=1e-6)
    assert lv.shape == la.shape


def test_asd_trainer_save_load_roundtrip(tmp_path):
    batch = synthetic_batch()
    trainer = ASDTrainer(lr=0.005, seed=0)
    trainer.train_network([batch], epoch=1, verbose=False)
    path = tmp_path / "asd.msgpack"
    trainer.save(str(path))
    scores = trainer.evaluate_network([batch])
    other = ASDTrainer(lr=0.005, seed=123)
    other.init(*batch[:2])
    other.load(str(path))
    np.testing.assert_allclose(other.evaluate_network([batch]), scores)
