"""Dataset split generation: standard / random / k-fold CV / fixed indices.

Capability parity with /root/reference/graphgps/loader/split_generator.py:11-271:
- ``standard``: keep the loader-provided canonical split;
- ``random``: fractional random split with per-seed reproducibility;
- ``cv-<k>``: k-fold cross-validation with JSON-cached fold indices and
  ``split_index`` selecting the fold (val = fold i, test = fold i+1 mod k);
- ``fixed``/``sliced``: explicit index lists supplied via cfg.dataset.split_dir.
Split intersection checks mirror set_dataset_splits (reference :163-200).
"""
from __future__ import annotations

import json
import logging
import os
from typing import List, Sequence, Tuple

import numpy as np

from .datasets.base import DatasetSplits

log = logging.getLogger("graphgps_tpu")


def _check_disjoint(idx_sets: Sequence[np.ndarray]) -> None:
    for i in range(len(idx_sets)):
        for j in range(i + 1, len(idx_sets)):
            inter = np.intersect1d(idx_sets[i], idx_sets[j])
            if inter.size:
                raise ValueError(
                    f"splits {i} and {j} intersect: {inter.size} shared indices")


def random_split(n: int, fracs: Sequence[float], seed: int,
                 shuffle: bool = True) -> Tuple[np.ndarray, ...]:
    """``shuffle=False`` (cfg.dataset.shuffle_split, GraphGym parity) takes
    contiguous index ranges instead of a seeded permutation."""
    if abs(sum(fracs) - 1.0) > 1e-6:
        raise ValueError(f"split fractions must sum to 1, got {fracs}")
    perm = (np.random.default_rng(seed).permutation(n) if shuffle
            else np.arange(n))
    a = int(n * fracs[0])
    b = a + int(n * fracs[1])
    out = (perm[:a], perm[a:b], perm[b:])
    _check_disjoint(out)
    return out


def cv_fold_indices(n: int, k: int, seed: int, cache_dir: str = "",
                    dataset_name: str = "dataset") -> List[np.ndarray]:
    """k-fold indices, cached as JSON like the reference (:203-271)."""
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir,
                            f"{dataset_name}_{k}fold_seed{seed}.json")
        if os.path.exists(path):
            with open(path) as f:
                return [np.asarray(ix, dtype=np.int64) for ix in json.load(f)]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = [np.sort(perm[i::k]) for i in range(k)]
    if cache_dir:
        with open(path, "w") as f:
            json.dump([ix.tolist() for ix in folds], f)
        log.info("cached %d-fold CV split at %s", k, path)
    return folds


def prepare_splits(splits: DatasetSplits, cfg) -> DatasetSplits:
    """Re-split according to cfg.dataset.split_mode (reference :11-31)."""
    mode = cfg.dataset.split_mode
    if mode == "standard":
        return splits
    graphs = splits.all_graphs
    n = len(graphs)
    if mode == "random":
        fr = list(cfg.dataset.split) or [0.8, 0.1, 0.1]
        tr, va, te = random_split(n, fr, cfg.seed,
                                  shuffle=cfg.dataset.shuffle_split)
    elif mode.startswith("cv-"):
        k = int(mode.split("-")[1])
        folds = cv_fold_indices(n, k, cfg.seed, cfg.dataset.split_dir,
                                cfg.dataset.name or cfg.dataset.format)
        i = cfg.dataset.split_index % k
        va = folds[i]
        te = folds[(i + 1) % k]
        tr = np.setdiff1d(np.arange(n), np.union1d(va, te))
        _check_disjoint((tr, va, te))
    elif mode in ("fixed", "sliced"):
        path = os.path.join(cfg.dataset.split_dir,
                            f"{cfg.dataset.name}_{mode}.json")
        with open(path) as f:
            idx = json.load(f)
        tr, va, te = (np.asarray(idx["train"]), np.asarray(idx["val"]),
                      np.asarray(idx["test"]))
        _check_disjoint((tr, va, te))
    else:
        raise ValueError(f"unknown split_mode {mode!r}")
    return DatasetSplits(train=[graphs[i] for i in tr],
                         val=[graphs[i] for i in va],
                         test=[graphs[i] for i in te],
                         meta=splits.meta)
