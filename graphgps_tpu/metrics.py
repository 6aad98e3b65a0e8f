"""Metric suite — numpy implementations of every metric the reference emits.

Capability parity with /root/reference/graphgps/logger.py:64-199 (per-task-type
epoch metrics), graphgps/metrics_ogb.py:9-117 (OGB evaluator copies), and
graphgps/head/inductive_edge.py:115-155 (MRR / Hits@k). Metrics run once per
epoch on host over accumulated predictions — not in the jitted step — so plain
numpy (sort-based AUROC/AP) is the right tool; sklearn parity is covered in tests
where sklearn is available (mirroring the reference's own cross-check asserts,
logger.py:74-81,156-169).

All functions take numpy arrays; NaN targets mark missing labels (ogbg-molpcba
convention) and are excluded column-wise.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------------
# Regression (reference logger.py:189-199)

def mae(pred: np.ndarray, true: np.ndarray) -> float:
    m = ~np.isnan(true)
    return float(np.abs(pred[m] - true[m]).mean()) if m.any() else 0.0


def mse(pred: np.ndarray, true: np.ndarray) -> float:
    m = ~np.isnan(true)
    return float(((pred[m] - true[m]) ** 2).mean()) if m.any() else 0.0


def rmse(pred: np.ndarray, true: np.ndarray) -> float:
    return float(np.sqrt(mse(pred, true)))


def r2(pred: np.ndarray, true: np.ndarray) -> float:
    """Coefficient of determination (multioutput uniform average like sklearn)."""
    pred = np.atleast_2d(pred.reshape(pred.shape[0], -1))
    true = np.atleast_2d(true.reshape(true.shape[0], -1))
    scores = []
    for c in range(true.shape[1]):
        t, p = true[:, c], pred[:, c]
        m = ~np.isnan(t)
        t, p = t[m], p[m]
        if t.size < 2:
            continue
        ss_res = ((t - p) ** 2).sum()
        ss_tot = ((t - t.mean()) ** 2).sum()
        scores.append(1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average ranks (ties averaged), like scipy.stats.rankdata."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(x) + 1)
    # average ties
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = ranks[order[i:j + 1]].mean()
        i = j + 1
    return ranks


def pearsonr(pred: np.ndarray, true: np.ndarray) -> float:
    m = ~np.isnan(true.ravel())
    p, t = pred.ravel()[m], true.ravel()[m]
    if p.size < 2:
        return 0.0
    p = p - p.mean()
    t = t - t.mean()
    denom = np.sqrt((p ** 2).sum() * (t ** 2).sum())
    return float((p * t).sum() / denom) if denom > 0 else 0.0


def spearmanr(pred: np.ndarray, true: np.ndarray) -> float:
    m = ~np.isnan(true.ravel())
    p, t = pred.ravel()[m], true.ravel()[m]
    if p.size < 2:
        return 0.0
    return pearsonr(_rankdata(p), _rankdata(t))


# ---------------------------------------------------------------------------------
# Classification (reference logger.py:64-125, metrics_ogb.py)

def accuracy(pred_label: np.ndarray, true: np.ndarray) -> float:
    return float((pred_label == true).mean()) if true.size else 0.0


def accuracy_sbm(pred_label: np.ndarray, true: np.ndarray) -> float:
    """Per-class averaged accuracy for PATTERN/CLUSTER
    (reference logger.py:21-41)."""
    classes = np.unique(true)
    accs = []
    for c in classes:
        m = true == c
        accs.append(float((pred_label[m] == c).mean()))
    return float(np.mean(accs)) if accs else 0.0


def precision_recall_f1(pred_label: np.ndarray, true: np.ndarray) -> Dict[str, float]:
    tp = float(((pred_label == 1) & (true == 1)).sum())
    fp = float(((pred_label == 1) & (true == 0)).sum())
    fn = float(((pred_label == 0) & (true == 1)).sum())
    prec = tp / (tp + fp) if tp + fp > 0 else 0.0
    rec = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return dict(precision=prec, recall=rec, f1=f1)


def auroc(score: np.ndarray, true: np.ndarray) -> float:
    """Binary ROC-AUC by rank statistic (ties handled via average ranks)."""
    m = ~np.isnan(true)
    score, true = score[m], true[m]
    pos = true == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.0
    ranks = _rankdata(score)
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def average_precision(score: np.ndarray, true: np.ndarray) -> float:
    """AP as used by the OGB evaluator (sklearn average_precision_score semantics:
    AP = Σ (R_k − R_{k−1}) P_k over descending-score thresholds)."""
    m = ~np.isnan(true)
    score, true = score[m], true[m]
    n_pos = float((true == 1).sum())
    if n_pos == 0:
        return 0.0
    order = np.argsort(-score, kind="mergesort")
    t = (true[order] == 1).astype(np.float64)
    tp = np.cumsum(t)
    k = np.arange(1, len(t) + 1)
    precision = tp / k
    # handle ties: only count at last index of each distinct score block
    s_sorted = score[order]
    distinct = np.r_[s_sorted[1:] != s_sorted[:-1], True]
    rec = tp / n_pos
    prev_rec = np.r_[0.0, rec[distinct][:-1]]
    return float(((rec[distinct] - prev_rec) * precision[distinct]).sum())


def ogb_rocauc_multilabel(score: np.ndarray, true: np.ndarray) -> float:
    """Column-averaged AUROC over labels with both classes present
    (reference metrics_ogb.py eval_rocauc)."""
    score = np.atleast_2d(score.reshape(score.shape[0], -1))
    true = np.atleast_2d(true.reshape(true.shape[0], -1))
    vals = []
    for c in range(true.shape[1]):
        t = true[:, c]
        m = ~np.isnan(t)
        if (t[m] == 1).any() and (t[m] == 0).any():
            vals.append(auroc(score[m, c], t[m]))
    return float(np.mean(vals)) if vals else 0.0


def ogb_ap_multilabel(score: np.ndarray, true: np.ndarray) -> float:
    """Column-averaged AP (reference metrics_ogb.py eval_ap / logger.py:144-153)."""
    score = np.atleast_2d(score.reshape(score.shape[0], -1))
    true = np.atleast_2d(true.reshape(true.shape[0], -1))
    vals = []
    for c in range(true.shape[1]):
        t = true[:, c]
        m = ~np.isnan(t)
        if (t[m] == 1).any() and (t[m] == 0).any():
            vals.append(average_precision(score[m, c], t[m]))
    return float(np.mean(vals)) if vals else 0.0


# ---------------------------------------------------------------------------------
# Ranking (reference head/inductive_edge.py:115-155)

def mrr_hits(pos_scores: np.ndarray, neg_scores: np.ndarray,
             ks=(1, 3, 10)) -> Dict[str, float]:
    """MRR + Hits@k of each positive vs its row of negatives.

    pos_scores (P,), neg_scores (P, num_neg); optimistic/pessimistic tie handling
    averaged (the OGB convention).
    """
    opt_rank = 1 + (neg_scores > pos_scores[:, None]).sum(axis=1)
    pes_rank = 1 + (neg_scores >= pos_scores[:, None]).sum(axis=1)
    rank = (opt_rank + pes_rank) / 2.0
    out = {"mrr": float((1.0 / rank).mean()) if rank.size else 0.0}
    for k in ks:
        out[f"hits@{k}"] = float((rank <= k).mean()) if rank.size else 0.0
    return out


# ---------------------------------------------------------------------------------
# Subtoken sequence F1 (reference logger.py:173-187, ogbg-code2 evaluator)

def subtoken_f1(pred_seqs, true_seqs) -> float:
    """Set-based F1 between predicted and true token sets per sample, averaged
    (the OGB code2 evaluator's convention: reference feeds raw target strings,
    so a predicted '__UNK__' can never match — see compute_task_metrics)."""
    f1s = []
    for p, t in zip(pred_seqs, true_seqs):
        pset, tset = set(p), set(t)
        tp = len(pset & tset)
        prec = tp / len(pset) if pset else 0.0
        rec = tp / len(tset) if tset else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0)
    return float(np.mean(f1s)) if f1s else 0.0


# ---------------------------------------------------------------------------------
# Per-task-type dispatch (reference logger.py write_epoch :239-254)

def compute_task_metrics(task_type: str, pred: np.ndarray, true: np.ndarray,
                         thresh: float = 0.5) -> Dict[str, float]:
    out: Dict[str, float] = {}
    if task_type == "regression":
        out["mae"] = mae(pred, true)
        out["mse"] = mse(pred, true)
        out["rmse"] = rmse(pred, true)
        out["r2"] = r2(pred, true)
        out["spearmanr"] = spearmanr(pred, true)
    elif task_type == "classification_binary":
        score = pred.ravel()
        t = true.ravel()
        if score.min() < 0 or score.max() > 1:  # logits → prob
            score = 1.0 / (1.0 + np.exp(-score))
        label = (score > thresh).astype(np.int64)
        out["accuracy"] = accuracy(label, t)
        out["accuracy-SBM"] = accuracy_sbm(label, t)
        out.update(precision_recall_f1(label, t))
        out["auc"] = auroc(score, t)
    elif task_type == "classification_multilabel":
        out["ap"] = ogb_ap_multilabel(pred, true)
        out["auc"] = ogb_rocauc_multilabel(pred, true)
    elif task_type == "subtoken_prediction":
        lab = pred.argmax(axis=-1)  # (B, seq)
        eos = pred.shape[-1] - 1    # EOS / UNK are the last two vocab ids
        unk = pred.shape[-1] - 2    # (code2_utils.get_vocab_mapping)

        def strip(row, is_pred):
            toks = []
            for t in row:
                t = int(t)
                if t == eos:
                    break
                # a predicted UNK can never match a real target token (the
                # reference evaluates against RAW target strings); keep it as
                # a distinct sentinel so it still costs precision
                toks.append("UNK_PRED" if (is_pred and t == unk) else t)
            return toks

        out["f1"] = subtoken_f1([strip(r, True) for r in lab],
                                [strip(r, False)
                                 for r in true.astype(np.int64)])
    else:  # multiclass
        if pred.ndim > 1 and pred.shape[-1] > 1:
            label = pred.argmax(axis=-1)
        else:
            label = pred.astype(np.int64).ravel()
        t = true.astype(np.int64).ravel()
        label = label.ravel()
        out["accuracy"] = accuracy(label, t)
        out["accuracy-SBM"] = accuracy_sbm(label, t)
        if pred.ndim > 1 and pred.shape[-1] > 1:
            # macro F1 for VOC/COCO-style reporting
            f1s = []
            for c in np.unique(t):
                stats = precision_recall_f1((label == c).astype(int), (t == c).astype(int))
                f1s.append(stats["f1"])
            out["f1"] = float(np.mean(f1s)) if f1s else 0.0
    return out


# ---------------------------------------------------------------------------------
# MetricWrapper: named metric + thresholding + NaN-target policies
# (capability parity with /root/reference/graphgps/metric_wrapper.py:25-329)

METRICS_DICT = {
    "mae": mae,
    "mse": mse,
    "rmse": rmse,
    "accuracy": lambda p, t: accuracy(np.asarray(p), np.asarray(t)),
    "auroc": auroc,
    "averageprecision": average_precision,
    "f1": lambda p, t: precision_recall_f1(np.asarray(p), np.asarray(t))["f1"],
    "precision": lambda p, t: precision_recall_f1(
        np.asarray(p), np.asarray(t))["precision"],
    "recall": lambda p, t: precision_recall_f1(
        np.asarray(p), np.asarray(t))["recall"],
    "pearsonr": pearsonr,
    "spearmanr": spearmanr,
}


class Thresholder:
    """Apply a scalar threshold to predictions (and optionally targets)
    before a metric (reference metric_wrapper.py:25-86)."""

    def __init__(self, threshold: float, operator: str = "greater",
                 th_on_preds: bool = True, th_on_target: bool = False,
                 target_to_int: bool = False):
        self.threshold = threshold
        self.th_on_preds = th_on_preds
        self.th_on_target = th_on_target
        self.target_to_int = target_to_int
        name = operator.lower() if isinstance(operator, str) else operator
        if name in ("greater", "gt"):
            self.operator, self.op_str = np.greater, ">"
        elif name in ("lower", "lt"):
            self.operator, self.op_str = np.less, "<"
        elif callable(operator):
            self.operator, self.op_str = operator, operator.__name__
        else:
            raise ValueError(f"operator {operator!r} not supported")

    def __call__(self, preds, target):
        if self.th_on_preds:
            preds = self.operator(preds, self.threshold)
        if self.th_on_target:
            target = self.operator(target, self.threshold)
        if self.target_to_int:
            target = target.astype(np.int64)
        return preds, target

    def __repr__(self):
        return f"x {self.op_str} {self.threshold}"


class MetricWrapper:
    """Named/callable metric with optional thresholding and 4 NaN-target
    policies (reference metric_wrapper.py:196-329):

    - ``None``: NaNs reach the metric untouched;
    - int/float: NaN targets replaced by the value;
    - ``'ignore-flatten'``: drop NaN-target entries from the flattened pair;
    - ``'ignore-mean-label'``: compute the metric per COLUMN over that
      column's non-NaN rows, skip degenerate columns (single-class, like the
      OGB evaluator), average the rest. ``per_column=True`` additionally
      returns the per-column values.
    """

    def __init__(self, metric, threshold_kwargs=None, target_nan_mask=None,
                 per_column: bool = False, **kwargs):
        self.metric = METRICS_DICT[metric] if isinstance(metric, str) else metric
        self.thresholder = (Thresholder(**threshold_kwargs)
                            if threshold_kwargs is not None else None)
        self.target_nan_mask = target_nan_mask
        self.per_column = per_column
        self.kwargs = kwargs

    def compute(self, preds, target):
        preds = np.asarray(preds, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        if preds.ndim == 1:
            preds = preds[:, None]
        if target.ndim == 1:
            target = target[:, None]
        nans = np.isnan(target)

        if self.thresholder is not None:
            preds, target = self.thresholder(preds, target)
        target = np.asarray(target, dtype=np.float64)

        mask_kind = self.target_nan_mask
        if mask_kind is None:
            pass
        elif isinstance(mask_kind, (int, float)) and not isinstance(mask_kind,
                                                                    bool):
            target = target.copy()
            target[nans] = mask_kind
        elif mask_kind == "ignore-flatten":
            preds, target = preds[~nans], target[~nans]
        elif mask_kind != "ignore-mean-label":
            raise ValueError(f"Invalid option `{mask_kind}`")

        if mask_kind == "ignore-mean-label":
            per_col = []
            for ii in range(target.shape[-1]):
                keep = ~nans[..., ii]
                t, p = target[keep, ii], preds[keep, ii]
                if t.size == 0 or np.unique(t).size < 2:
                    # degenerate column (no rows / single class): skipped,
                    # like the OGB evaluator / torchmetrics-warning catch
                    per_col.append(np.nan)
                    continue
                try:
                    per_col.append(float(self.metric(p, t, **self.kwargs)))
                except Exception:
                    per_col.append(np.nan)
            val = float(np.nanmean(per_col)) if np.isfinite(
                np.asarray(per_col, dtype=np.float64)).any() else float("nan")
            if self.per_column:
                return val, per_col
            return val
        val = float(self.metric(preds, target, **self.kwargs))
        return val

    def __call__(self, preds, target):
        return self.compute(preds, target)

    def __repr__(self):
        name = getattr(self.metric, "__name__", str(self.metric))
        return f"{name}({self.thresholder})" if self.thresholder else name
