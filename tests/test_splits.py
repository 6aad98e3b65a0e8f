"""Split generation: random fractions, CV folds, caching, disjointness."""
import numpy as np
import pytest

from graphgps_tpu.data.splits import (cv_fold_indices, prepare_splits,
                                      random_split)
from graphgps_tpu.data.datasets.base import DatasetSplits

from conftest import make_chain_graph


def test_random_split_disjoint():
    tr, va, te = random_split(100, [0.8, 0.1, 0.1], seed=1)
    assert len(tr) == 80 and len(va) == 10
    all_idx = np.concatenate([tr, va, te])
    assert len(np.unique(all_idx)) == 100


def test_random_split_reproducible():
    a = random_split(50, [0.6, 0.2, 0.2], seed=7)
    b = random_split(50, [0.6, 0.2, 0.2], seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = random_split(50, [0.6, 0.2, 0.2], seed=8)
    assert not np.array_equal(a[0], c[0])


def test_bad_fractions_raise():
    with pytest.raises(ValueError):
        random_split(10, [0.5, 0.1, 0.1], seed=0)


def test_cv_folds_partition(tmp_path):
    folds = cv_fold_indices(23, 5, seed=3, cache_dir=str(tmp_path), dataset_name="x")
    allidx = np.concatenate(folds)
    assert len(np.unique(allidx)) == 23
    # cache round-trip
    folds2 = cv_fold_indices(23, 5, seed=3, cache_dir=str(tmp_path), dataset_name="x")
    for a, b in zip(folds, folds2):
        np.testing.assert_array_equal(a, b)


def test_prepare_splits_cv_modes(base_cfg):
    cfg = base_cfg.clone()
    graphs = [make_chain_graph(n % 7 + 3) for n in range(30)]
    ds = DatasetSplits(train=graphs[:20], val=graphs[20:25], test=graphs[25:])
    cfg.dataset.split_mode = "cv-5"
    cfg.dataset.split_dir = ""
    cfg.dataset.split_index = 1
    out = prepare_splits(ds, cfg)
    assert len(out.val) == 6 and len(out.test) == 6 and len(out.train) == 18

    cfg.dataset.split_mode = "random"
    cfg.dataset.split = [0.8, 0.1, 0.1]
    out2 = prepare_splits(ds, cfg)
    assert len(out2.train) == 24
