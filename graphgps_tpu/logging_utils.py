"""Per-split epoch loggers + cross-run aggregation.

Capability parity with /root/reference/graphgps/logger.py:201-303 (CustomLogger:
per-iteration accumulation, task-dispatched epoch metrics, stats.json streams)
and graphgps/agg_runs.py:82-162 (mean±std over seeds, best-epoch selection by
cfg.metric_best/metric_agg, agg/{split}/{stats,best}.json).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np

from .metrics import compute_task_metrics

log = logging.getLogger("graphgps_tpu")


class SplitLogger:
    """Accumulates (pred, true, loss) per iteration; emits epoch stats.

    Optional sinks (reference logger.py:281-284 + wandb hooks in
    custom_train.py:102-179): tensorboardX per-run event files when
    ``tensorboard=True``; W&B when installed and ``wandb_run`` given.
    """

    def __init__(self, split: str, out_dir: str, task_type: str,
                 thresh: float = 0.5, precision: int = 5,
                 tensorboard: bool = False, wandb_run=None):
        self.split = split
        self.out_dir = out_dir
        self.task_type = task_type
        self.thresh = thresh
        self.precision = precision
        self.wandb_run = wandb_run
        self.params = 0   # model param count, set by the train loop
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(out_dir, split))
            except Exception as e:  # keep training alive without TB
                log.warning("tensorboard disabled: %s", e)
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        self.reset()

    def reset(self):
        self._preds: List[np.ndarray] = []
        self._trues: List[np.ndarray] = []
        self._loss = 0.0
        self._lr = 0.0
        self._size = 0
        self._iters = 0
        self._time = 0.0
        self._custom: Dict[str, List[float]] = {}

    def add_epoch_metrics(self, metrics: Dict[str, float]) -> None:
        """Extra metrics merged into the next write_epoch (e.g. MRR/Hits@k
        computed outside the per-iteration path)."""
        for k, v in metrics.items():
            self._custom.setdefault(k, []).append(float(v))

    def update_stats(self, pred: np.ndarray, true: np.ndarray, loss: float,
                     lr: float, time_used: float, batch_size: int,
                     **custom):
        self._preds.append(np.asarray(pred))
        self._trues.append(np.asarray(true))
        self._loss += float(loss) * batch_size
        self._lr = float(lr)
        self._size += batch_size
        self._iters += 1
        self._time += time_used
        for k, v in custom.items():
            self._custom.setdefault(k, []).append(float(v))

    def write_epoch(self, cur_epoch: int) -> Dict[str, float]:
        pred = np.concatenate(self._preds) if self._preds else np.zeros((0,))
        true = np.concatenate(self._trues) if self._trues else np.zeros((0,))
        stats: Dict[str, float] = dict(
            epoch=cur_epoch,
            loss=round(self._loss / max(self._size, 1), self.precision + 3),
            lr=self._lr, params=int(self.params),
            time_iter=round(self._time / max(self._iters, 1), self.precision + 3),
            time_epoch=round(self._time, self.precision + 3),
        )
        if pred.size:
            task_stats = compute_task_metrics(self.task_type, pred, true, self.thresh)
            stats.update({k: round(v, self.precision) for k, v in task_stats.items()})
        for k, vals in self._custom.items():
            stats[k] = round(float(np.mean(vals)), self.precision)
        path = os.path.join(self.out_dir, self.split, "stats.json")
        with open(path, "a") as f:
            f.write(json.dumps(stats) + "\n")
        if self._tb is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    self._tb.add_scalar(k, v, cur_epoch)
        if self.wandb_run is not None:
            self.wandb_run.log({f"{self.split}/{k}": v for k, v in stats.items()
                                if isinstance(v, (int, float))}, step=cur_epoch)
        log.info("%s: %s", self.split, {k: v for k, v in stats.items()
                                        if k not in ("params",)})
        self.reset()
        return stats


def create_loggers(out_dir: str, task_type: str, splits=("train", "val", "test"),
                   thresh: float = 0.5):
    return [SplitLogger(s, out_dir, task_type, thresh) for s in splits]


# ---------------------------------------------------------------------------------
# Aggregation over seeds (reference agg_runs.py:82-162)

def _read_stats(path: str) -> List[Dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def agg_dict_list(dict_list: List[Dict]) -> Dict:
    """Mean±std over a list of same-key dicts (reference agg_runs.py:45-58)."""
    out: Dict = {}
    for key in dict_list[0]:
        vals = [d[key] for d in dict_list if key in d]
        if not vals or not all(isinstance(v, (int, float)) for v in vals):
            continue
        if key == "epoch":
            out[key] = int(vals[0])
        else:
            out[key] = float(np.mean(vals))
            out[f"{key}_std"] = float(np.std(vals))
    return out


def agg_runs(out_dir: str, metric_best: str = "auto",
             metric_agg: str = "argmax",
             tensorboard: bool = True) -> Dict[str, Dict]:
    """Aggregate seed dirs under out_dir: mean±std per epoch + best-epoch stats.

    Seed dirs are numeric subdirs each holding {split}/stats.json. Writes
    agg/{split}/{stats,best}.json. Best epoch is chosen on the VAL split by
    metric_best with argmax/argmin (reference agg_runs.py:95-131).

    Callers with a cfg should pass ``resolve_metric_best(cfg)`` (the driver
    does) so best-epoch selection here can never drift from the in-run
    selection; the 'auto' fallback below is for standalone/partial-run use.
    ``tensorboard`` gates the aggregate TB writer (cfg.tensorboard_agg).
    """
    seed_dirs = sorted(d for d in os.listdir(out_dir)
                       if d.isdigit() and os.path.isdir(os.path.join(out_dir, d)))
    per_split: Dict[str, List[List[Dict]]] = {}
    best_epochs: List[int] = []
    for sd in seed_dirs:
        sdir = os.path.join(out_dir, sd)
        splits = [s for s in ("train", "val", "test")
                  if os.path.exists(os.path.join(sdir, s, "stats.json"))]
        if not splits:
            continue
        stats = {s: _read_stats(os.path.join(sdir, s, "stats.json")) for s in splits}
        if "val" in stats and stats["val"]:
            key = metric_best if metric_best != "auto" else (
                "mae" if "mae" in stats["val"][0] else
                "ap" if "ap" in stats["val"][0] else "accuracy")
            vals = [e.get(key, 0.0) for e in stats["val"]]
            best_row = int(np.argmin(vals) if metric_agg == "argmin" or key in
                           ("mae", "mse", "rmse", "loss") else np.argmax(vals))
            # record the EPOCH NUMBER, not the row index: with eval_period>1
            # the train split has one row per epoch while val/test only have
            # eval-epoch rows, so indexing by position would mix epochs
            best = int(stats["val"][best_row].get("epoch", best_row))
        else:
            last = stats[splits[0]][-1]
            best = int(last.get("epoch", len(stats[splits[0]]) - 1))
        best_epochs.append(best)
        for s in splits:
            per_split.setdefault(s, []).append(stats[s])

    results: Dict[str, Dict] = {}
    for s, runs in per_split.items():
        agg_dir = os.path.join(out_dir, "agg", s)
        os.makedirs(agg_dir, exist_ok=True)
        # per-epoch aggregation over seeds (to min common length)
        min_len = min(len(r) for r in runs)
        epoch_stats = [agg_dict_list([r[i] for r in runs]) for i in range(min_len)]
        with open(os.path.join(agg_dir, "stats.json"), "w") as f:
            for e in epoch_stats:
                f.write(json.dumps(e) + "\n")
        # TensorBoard for aggregates (reference agg_runs.py:150-156),
        # gated by cfg.tensorboard_agg
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                with SummaryWriter(agg_dir) as tb:
                    for e in epoch_stats:
                        for k, v in e.items():
                            if isinstance(v, (int, float)) and k != "epoch":
                                tb.add_scalar(k, v, int(e.get("epoch", 0)))
            except Exception:
                pass
        # best-epoch stats: each seed contributes its own best val epoch's
        # stats, matched by the recorded 'epoch' field (closest ≤ best when
        # this split has no row at exactly that epoch)
        best_list = []
        for r, be in zip(runs, best_epochs):
            cand = [row for row in r if row.get("epoch", -1) <= be]
            best_list.append(cand[-1] if cand else r[-1])
        best_agg = agg_dict_list(best_list)
        with open(os.path.join(agg_dir, "best.json"), "w") as f:
            f.write(json.dumps(best_agg) + "\n")
        results[s] = best_agg
        log.info("agg %s best: %s", s, best_agg)
    return results
