"""Training executor: epoch loop, CV, checkpointing, TensorBoard.

Replaces cosyvoice/utils/executor.py:37-176 + utils/train_utils.py save/log
helpers with a functional JAX loop. Uneven-data joins are unnecessary because
the dataset shards drop ragged tails (data/dataset.py), so every rank runs
the same number of steps per epoch.
"""

import json
import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np


class Executor:
    def __init__(
        self,
        train_step: Callable,
        out_dir: str,
        model_name: str = "model",
        log_interval: int = 100,
        save_per_step: int = -1,
        tensorboard: bool = True,
        rank: int = 0,
    ):
        self.train_step = train_step
        self.out_dir = out_dir
        self.model_name = model_name
        self.log_interval = log_interval
        self.save_per_step = save_per_step
        self.rank = rank
        self.step = 0
        self.epoch = 0
        self.writer = None
        if tensorboard and rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(os.path.join(out_dir, "tensorboard"))
            except Exception:  # noqa: BLE001
                logging.warning("tensorboard unavailable; logging to stdout only")
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def train_one_epoch(self, params, opt_state, train_iter: Iterable, collate: Callable, cv_fn=None, cv_iter=None):
        t0 = time.time()
        for batch in train_iter:
            model_batch = collate(batch)
            params, opt_state, metrics = self.train_step(params, opt_state, model_batch, self.step)
            self.step += 1
            if self.step % self.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = self.log_interval / (time.time() - t0)
                t0 = time.time()
                logging.info("epoch %d step %d %s (%.2f it/s)", self.epoch, self.step, m, rate)
                self._tb(m)
            if self.save_per_step > 0 and self.step % self.save_per_step == 0 and self.rank == 0:
                cv_metrics = self.cross_validate(params, cv_fn, cv_iter, collate) if cv_fn else {}
                self.save(params, opt_state, cv_metrics)
        self.epoch += 1
        return params, opt_state

    def cross_validate(self, params, loss_fn, cv_iter, collate):
        if cv_iter is None:
            return {}
        if callable(cv_iter):  # factory: fresh pass per CV (mid-epoch saves)
            cv_iter = cv_iter()
        tot, n = 0.0, 0
        for batch in cv_iter:
            loss = float(loss_fn(params, collate(batch)))
            tot += loss
            n += 1
        metrics = {"cv_loss": tot / max(n, 1)}
        logging.info("CV epoch %d step %d: %s", self.epoch, self.step, metrics)
        self._tb(metrics)
        return metrics

    # ------------------------------------------------------------------
    def save(self, params, opt_state, metrics: Optional[dict] = None):
        """Checkpoint + sidecar json (reference train_utils.py:195-214)."""
        import flax.serialization as ser

        tag = f"{self.model_name}_epoch{self.epoch}_step{self.step}"
        path = os.path.join(self.out_dir, f"{tag}.msgpack")
        with open(path, "wb") as f:
            f.write(ser.to_bytes(params))
        side = {"epoch": self.epoch, "step": self.step, "save_time": time.strftime("%Y-%m-%d %H:%M:%S")}
        for k, v in (metrics or {}).items():
            try:
                side[k] = float(v)
            except (TypeError, ValueError):  # non-numeric metadata (e.g. {"note": "init"})
                side[k] = v
        with open(os.path.join(self.out_dir, f"{tag}.json"), "w") as f:
            json.dump(side, f, indent=2)
        logging.info("saved %s", path)
        return path

    def resume(self, params, checkpoint_path: str):
        import flax.serialization as ser

        with open(checkpoint_path, "rb") as f:
            params = ser.from_bytes(params, f.read())
        side_path = checkpoint_path.replace(".msgpack", ".json")
        if os.path.exists(side_path):
            with open(side_path) as f:
                side = json.load(f)
            self.step = side.get("step", 0)
            self.epoch = side.get("epoch", 0)
        logging.info("resumed from %s (epoch %d step %d)", checkpoint_path, self.epoch, self.step)
        return params

    def _tb(self, metrics: dict):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f"train/{k}", v, self.step)


def average_checkpoints(paths, template):
    """Average best-N checkpoints (reference bin/average_model.py:44-93)."""
    import flax.serialization as ser

    acc = None
    for p in paths:
        with open(p, "rb") as f:
            params = ser.from_bytes(template, f.read())
        if acc is None:
            acc = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree_util.tree_map(lambda a, x: a + np.asarray(x, np.float64), acc, params)
    return jax.tree_util.tree_map(lambda a: (a / len(paths)).astype(np.float32), acc)


def select_best_checkpoints(out_dir: str, model_name: str, num: int = 5, metric: str = "cv_loss"):
    """Pick the N checkpoints with lowest CV loss from sidecar jsons."""
    import glob

    cands = []
    for side in glob.glob(os.path.join(out_dir, f"{model_name}_*.json")):
        with open(side) as f:
            info = json.load(f)
        if metric in info:
            cands.append((info[metric], side.replace(".json", ".msgpack")))
    cands.sort()
    return [p for _, p in cands[:num]]
