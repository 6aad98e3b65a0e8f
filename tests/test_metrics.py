"""Metric parity vs sklearn (when available) and closed-form cases — mirroring the
reference's own cross-check asserts (/root/reference/graphgps/logger.py:74-81)."""
import numpy as np
import pytest

from graphgps_tpu import metrics as M

sklearn = pytest.importorskip("sklearn", reason="sklearn not in image") \
    if False else None
try:
    import sklearn.metrics as skm
    HAVE_SK = True
except Exception:
    HAVE_SK = False


def test_regression_basic():
    pred = np.array([1.0, 2.0, 3.0])
    true = np.array([1.0, 2.0, 5.0])
    assert M.mae(pred, true) == pytest.approx(2 / 3)
    assert M.rmse(pred, true) == pytest.approx(np.sqrt(4 / 3))
    assert M.r2(pred, np.array([1.0, 2.0, 3.0])) == pytest.approx(1.0)


def test_spearman_perfect_monotone():
    pred = np.array([1.0, 10.0, 100.0, 1000.0])
    true = np.array([0.1, 0.2, 0.3, 0.4])
    assert M.spearmanr(pred, true) == pytest.approx(1.0)
    assert M.spearmanr(-pred, true) == pytest.approx(-1.0)


def test_auroc_closed_form(rng):
    score = np.array([0.9, 0.8, 0.3, 0.1])
    true = np.array([1, 0, 1, 0])
    # pairs: (0.9>0.8)✓ (0.9>0.1)✓ (0.3<0.8)✗ (0.3>0.1)✓ → 3/4
    assert M.auroc(score, true) == pytest.approx(0.75)
    if HAVE_SK:
        s = rng.normal(size=200)
        t = (rng.random(200) > 0.6).astype(float)
        assert M.auroc(s, t) == pytest.approx(skm.roc_auc_score(t, s), abs=1e-9)


def test_ap_vs_sklearn(rng):
    if not HAVE_SK:
        pytest.skip("sklearn unavailable")
    s = rng.normal(size=300)
    t = (rng.random(300) > 0.7).astype(float)
    assert M.average_precision(s, t) == pytest.approx(
        skm.average_precision_score(t, s), abs=1e-9)


def test_multilabel_nan_column_policy():
    score = np.array([[0.9, 0.5], [0.1, 0.5], [0.8, 0.5]])
    true = np.array([[1.0, np.nan], [0.0, np.nan], [1.0, np.nan]])
    # col 1 all-NaN → ignored; col 0 perfect ranking → AP 1, AUROC 1
    assert M.ogb_ap_multilabel(score, true) == pytest.approx(1.0)
    assert M.ogb_rocauc_multilabel(score, true) == pytest.approx(1.0)


def test_accuracy_sbm_class_balance():
    pred = np.array([0, 0, 0, 1])
    true = np.array([0, 0, 1, 1])
    # class 0 acc = 1.0, class 1 acc = 0.5 → 0.75 (plain accuracy also 0.75 here)
    assert M.accuracy_sbm(pred, true) == pytest.approx(0.75)
    pred2 = np.array([0, 0, 0, 0, 0, 1])
    true2 = np.array([0, 0, 0, 0, 1, 1])
    assert M.accuracy_sbm(pred2, true2) == pytest.approx((1.0 + 0.5) / 2)


def test_mrr_hits():
    pos = np.array([3.0, 1.0])
    neg = np.array([[1.0, 2.0], [2.0, 3.0]])
    out = M.mrr_hits(pos, neg)
    # ranks: 1 and 3 → MRR = (1 + 1/3)/2
    assert out["mrr"] == pytest.approx((1 + 1 / 3) / 2)
    assert out["hits@1"] == pytest.approx(0.5)
    assert out["hits@3"] == pytest.approx(1.0)


def test_subtoken_f1():
    f1 = M.subtoken_f1([["a", "b"]], [["a", "c"]])
    assert f1 == pytest.approx(0.5)


def test_task_dispatch_keys():
    pred = np.random.default_rng(0).normal(size=(50, 3))
    true = (np.random.default_rng(1).random((50, 3)) > 0.5).astype(float)
    out = M.compute_task_metrics("classification_multilabel", pred, true)
    assert set(out) == {"ap", "auc"}
    out = M.compute_task_metrics("regression", pred[:, 0], true[:, 0])
    assert {"mae", "mse", "rmse", "r2", "spearmanr"} <= set(out)
