"""MetricWrapper NaN policies + thresholding + per-column metrics, sklearn
cross-checked (the reference self-checks its wrapper against sklearn the same
way, logger.py:74-81,156-169; wrapper spec metric_wrapper.py:196-329)."""
import numpy as np
import pytest

from graphgps_tpu.metrics import MetricWrapper, Thresholder

sk = pytest.importorskip("sklearn.metrics")


def _multilabel(nan_cols=True, seed=0):
    rng = np.random.default_rng(seed)
    n, c = 64, 4
    score = rng.normal(size=(n, c))
    true = (rng.random((n, c)) < 0.4).astype(np.float64)
    if nan_cols:
        true[rng.random((n, c)) < 0.25] = np.nan
    return score, true


def test_ignore_mean_label_matches_sklearn_per_column():
    score, true = _multilabel()
    w = MetricWrapper("auroc", target_nan_mask="ignore-mean-label",
                      per_column=True)
    val, cols = w(score, true)
    ref_cols = []
    for ii in range(true.shape[1]):
        keep = ~np.isnan(true[:, ii])
        t = true[keep, ii]
        if np.unique(t).size < 2:
            ref_cols.append(np.nan)
            continue
        ref_cols.append(sk.roc_auc_score(t, score[keep, ii]))
    np.testing.assert_allclose(cols, ref_cols, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(val, np.nanmean(ref_cols), rtol=1e-6)


def test_ignore_flatten_matches_sklearn():
    score, true = _multilabel()
    w = MetricWrapper("averageprecision", target_nan_mask="ignore-flatten")
    keep = ~np.isnan(true)
    ref = sk.average_precision_score(true[keep], score[keep])
    np.testing.assert_allclose(w(score, true), ref, rtol=1e-6)


def test_numeric_replacement_policy():
    score, true = _multilabel()
    w0 = MetricWrapper("mae", target_nan_mask=0)
    t0 = np.nan_to_num(true, nan=0.0)
    np.testing.assert_allclose(w0(score, true),
                               np.abs(score - t0).mean(), rtol=1e-6)
    w1 = MetricWrapper("mae", target_nan_mask=1.0)
    t1 = np.where(np.isnan(true), 1.0, true)
    np.testing.assert_allclose(w1(score, true),
                               np.abs(score - t1).mean(), rtol=1e-6)


def test_none_policy_propagates_nan():
    """None = 'do not change behaviour': NaN targets reach the metric
    untouched (a plain mean then returns NaN; our built-in mae is itself
    NaN-robust, so use a raw callable to observe the passthrough)."""
    score, true = _multilabel()
    raw_mae = lambda p, t: float(np.abs(p - t).mean())  # noqa: E731
    assert np.isnan(MetricWrapper(raw_mae, target_nan_mask=None)(score, true))
    # the same raw metric under a replacement policy is finite
    assert np.isfinite(MetricWrapper(raw_mae, target_nan_mask=0)(score, true))


def test_invalid_policy_raises():
    with pytest.raises(ValueError, match="Invalid option"):
        MetricWrapper("mae", target_nan_mask="bogus")(np.zeros(3), np.zeros(3))


def test_thresholder_accuracy():
    rng = np.random.default_rng(1)
    score = rng.normal(size=(40,))
    true = (score + rng.normal(scale=0.5, size=40) > 0).astype(np.float64)
    w = MetricWrapper("accuracy",
                      threshold_kwargs=dict(threshold=0.0, operator="greater"))
    ref = sk.accuracy_score(true, score > 0.0)
    np.testing.assert_allclose(w(score, true), ref, rtol=1e-6)
    assert ">" in repr(Thresholder(0.5))
    assert "<" in repr(Thresholder(0.5, operator="lower"))


def test_degenerate_column_skipped():
    rng = np.random.default_rng(2)
    score = rng.normal(size=(20, 2))
    true = np.stack([np.ones(20),                      # single class → skip
                     (rng.random(20) < 0.5).astype(float)], axis=1)
    val, cols = MetricWrapper("auroc", target_nan_mask="ignore-mean-label",
                              per_column=True)(score, true)
    assert np.isnan(cols[0]) and np.isfinite(cols[1])
    np.testing.assert_allclose(val, cols[1])
