"""ASD training/eval driver (reference src/talking_detector/ASD.py:11-103).

TPU-native redesign of the reference's torch loop: ONE jitted train step
(both-head loss + grads + Adam update + BN batch-stat update) with the
per-epoch StepLR learning rate (gamma 0.95) and the loss-smoothing
schedule r = 1.3 - 0.02*(epoch-1) passed as traced scalars, so epoch
changes never recompile. Evaluation is a jitted batched score pass; the
AVA mAP is computed natively (the reference shells out to
utils/get_ava_active_speaker_performance.py, ASD.py:79-81).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.frontends.asd import ASDModel, asd_torch_to_flax


def _bce(p: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """torch nn.BCELoss on probabilities (mean reduction, clamped logs)."""
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """Frame-level average precision (the AVA active-speaker metric the
    reference computes via an external script, ASD.py:79-81)."""
    scores = np.asarray(scores, np.float64).ravel()
    y = np.asarray(labels).ravel().astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    y = y[order]
    tp = np.cumsum(y)
    precision = tp / (np.arange(len(y)) + 1.0)
    denom = y.sum()
    return float((precision * y).sum() / denom) if denom else 0.0


@dataclass
class ASDTrainer:
    """Reference-equivalent optimizer loop: Adam lr 1e-3, StepLR gamma 0.95
    per epoch, loss = lossAV + 0.5 * lossV (ASD.py:12-38)."""

    lr: float = 0.001
    lr_decay: float = 0.95
    seed: int = 0
    params: dict = field(default=None, repr=False)
    batch_stats: dict = field(default=None, repr=False)

    def __post_init__(self):
        import optax

        self.model = ASDModel()
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)
        self.opt_state = None
        self._jit_step = None
        self._jit_score = None

    # ---------------- state ----------------

    def init(self, audio: np.ndarray, visual: np.ndarray) -> None:
        """Initialize params/batch-stats from one (audio, visual) batch."""
        variables = self.model.init(
            jax.random.PRNGKey(self.seed),
            jnp.asarray(audio[:1]), jnp.asarray(visual[:1]),
            method="train_logits",
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

    def load_torch(self, state: dict) -> None:
        """Load a reference talking_detector checkpoint state dict
        (keys 'model.*' / 'lossAV.*' / 'lossV.*' — ASD.py:89-103)."""
        variables = asd_torch_to_flax(state)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

    # ---------------- jitted kernels ----------------

    def _step_fn(self):
        if self._jit_step is None:
            model, tx = self.model, self.tx

            @jax.jit
            def step(params, batch_stats, opt_state, audio, visual, labels,
                     r, lr):
                y = labels.reshape(-1).astype(jnp.float32)

                def loss_fn(p):
                    (la, lv), upd = model.apply(
                        {"params": p, "batch_stats": batch_stats},
                        audio, visual, method="train_logits",
                        mutable=["batch_stats"],
                    )
                    la = la.reshape(-1, 2)
                    lv = lv.reshape(-1, 2)
                    # reference loss.py: BCE on softmax(x/r)[:, 1]
                    loss_av = _bce(jax.nn.softmax(la / r, -1)[:, 1], y)
                    loss_v = _bce(jax.nn.softmax(lv / r, -1)[:, 1], y)
                    loss = loss_av + 0.5 * loss_v
                    pred = jnp.round(jax.nn.softmax(la, -1)[:, 1])
                    correct = jnp.sum(pred == y)
                    return loss, (upd["batch_stats"], loss_av, loss_v, correct)

                grads, (new_stats, loss_av, loss_v, correct) = jax.grad(
                    loss_fn, has_aux=True
                )(params)
                opt_state.hyperparams["learning_rate"] = lr
                updates, new_opt = tx.update(grads, opt_state, params)
                import optax

                new_params = optax.apply_updates(params, updates)
                return new_params, new_stats, new_opt, (
                    loss_av + 0.5 * loss_v, loss_av, loss_v, correct
                )

            self._jit_step = step
        return self._jit_step

    def _score_fn(self):
        if self._jit_score is None:
            model = self.model

            @jax.jit
            def score(params, batch_stats, audio, visual):
                la, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    audio, visual, False, method="train_logits",
                )
                # eval predScore = softmax(logits)[:, 1] (loss.py:23)
                return jax.nn.softmax(la, -1)[..., 1]

            self._jit_score = score
        return self._jit_score

    # ---------------- driver loops ----------------

    def train_network(
        self, loader: Iterable, epoch: int, verbose: bool = True
    ) -> Tuple[float, float]:
        """One epoch; returns (mean loss, lr) like the reference (:21-53)."""
        lr = self.lr * self.lr_decay ** (epoch - 1)  # StepLR(step_size=1)
        r = 1.3 - 0.02 * (epoch - 1)
        step = self._step_fn()
        batches = iter(loader)
        if self.params is None:
            import itertools

            first = next(batches)
            self.init(np.asarray(first[0]), np.asarray(first[1]))
            batches = itertools.chain([first], batches)
        tot = np.zeros(3)
        top1 = n_frames = 0
        num = 0
        for num, (audio, visual, labels) in enumerate(batches, start=1):
            self.params, self.batch_stats, self.opt_state, metrics = step(
                self.params, self.batch_stats, self.opt_state,
                jnp.asarray(audio), jnp.asarray(visual), jnp.asarray(labels),
                jnp.float32(r), jnp.float32(lr),
            )
            loss, loss_av, loss_v, correct = map(float, metrics)
            tot += (loss, loss_av, loss_v)
            top1 += correct
            n_frames += int(np.asarray(labels).size)
            if verbose:
                sys.stderr.write(
                    time.strftime("%m-%d %H:%M:%S")
                    + " [%2d] r: %2f, Lr: %5f," % (epoch, r, lr)
                    + " LossV: %.5f, LossAV: %.5f, Loss: %.5f, ACC: %2.2f%% \r"
                    % (tot[2] / num, tot[1] / num, tot[0] / num,
                       100 * top1 / n_frames)
                )
                sys.stderr.flush()
        if verbose:
            sys.stderr.write("\n")
        return (tot[0] / max(num, 1), lr)

    def evaluate_network(
        self,
        loader: Iterable,
        eval_csv_save: Optional[str] = None,
        eval_orig: Optional[str] = None,
    ):
        """Batched score pass. Returns the per-frame scores; when eval_orig
        (the AVA ground-truth CSV) is given, also writes the prediction CSV
        in the reference format and returns (scores, mAP) (:55-82)."""
        score = self._score_fn()
        preds = []
        for audio, visual, *_ in loader:
            s = score(self.params, self.batch_stats,
                      jnp.asarray(audio), jnp.asarray(visual))
            preds.extend(np.asarray(s).reshape(-1).tolist())
        preds = np.asarray(preds, np.float32)
        if eval_orig is None:
            return preds
        import pandas

        eval_res = pandas.read_csv(eval_orig)
        truth = (eval_res["label"] == "SPEAKING_AUDIBLE").to_numpy()
        out = eval_res.copy()
        out["score"] = pandas.Series(preds)
        out["label"] = pandas.Series(["SPEAKING_AUDIBLE"] * len(preds))
        for col in ("label_id", "instance_id"):
            if col in out:
                out.drop([col], axis=1, inplace=True)
        if eval_csv_save is not None:
            out.to_csv(eval_csv_save, index=False)
        return preds, average_precision(preds, truth)

    # ---------------- checkpoint ----------------

    def save(self, path: str) -> None:
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": self.params, "batch_stats": self.batch_stats}
            ))

    def load(self, path: str) -> None:
        from flax import serialization

        if self.params is None:
            raise ValueError("call init() first to build the target tree")
        with open(path, "rb") as f:
            tree = serialization.from_bytes(
                {"params": self.params, "batch_stats": self.batch_stats},
                f.read(),
            )
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.opt_state = self.tx.init(self.params)
