"""Remaining benchmark dataset loaders: LRGB peptides, AQSOL, MalNetTiny,
PCQM4Mv2Contact, ogbg-code2, TUDatasets, MNIST/CIFAR superpixels.

Capability analogs of /root/reference/graphgps/loader/dataset/* and the
preformat_* family (master_loader.py:256-613). Each reads a local cache in the
generic npz graph-list layout (see ``_npz_splits``) and falls back to a
statistics-matched synthetic dataset when absent (no network egress here).
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Optional

import numpy as np

from ...registry import register_dataset
from ..graph import Graph
from .base import DatasetSplits
from .synthetic import _random_molecule, _graph_label, _split

log = logging.getLogger(__name__)


def _npz_splits(path: str) -> Optional[DatasetSplits]:
    """Generic cache layout: npz with train/val/test object arrays of dicts
    {x, edge_index, edge_attr?, y?} (+ optional 'meta' dict)."""
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=True)
    out = {}
    for split in ("train", "val", "test"):
        graphs = []
        for rec in z[split]:
            graphs.append(Graph(
                node_feat=rec["x"], edge_index=rec["edge_index"],
                edge_feat=rec.get("edge_attr"), y=rec.get("y")))
        out[split] = graphs
    meta = z["meta"].item() if "meta" in z.files else {}
    return DatasetSplits(train=out["train"], val=out["val"], test=out["test"],
                         meta=meta)


def _synthetic_molecular(cfg, num_tasks: int, task_type: str,
                         min_n=20, max_n=150, n_types=9, e_types=3,
                         feat_cols=9, efeat_cols=3) -> DatasetSplits:
    """OGB-molecule-shaped synthetic fallback (multi-column int features)."""
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    w = rng.normal(size=(4 + n_types,))
    graphs = []
    for _ in range(d.synth_num_graphs):
        g = _random_molecule(rng, min_n, max_n, n_types, e_types)
        # expand to multi-column OGB-style features
        x = np.concatenate([g.node_feat] +
                           [rng.integers(0, 4, size=(g.num_nodes, 1))
                            for _ in range(feat_cols - 1)], axis=1)
        e = np.concatenate([g.edge_feat] +
                           [rng.integers(0, 2, size=(g.num_edges, 1))
                            for _ in range(efeat_cols - 1)], axis=1)
        g.node_feat, g.edge_feat = x.astype(np.int64), e.astype(np.int64)
        scores = np.array([_graph_label(g, n_types, rng, np.roll(w, t))
                           for t in range(num_tasks)])
        if task_type == "classification_multilabel":
            y = (scores > 0).astype(np.float32)
            y[rng.random(num_tasks) < 0.05] = np.nan
        else:
            y = scores.astype(np.float32)
        g.y = y
        graphs.append(g)
    return _split(graphs)


def _fallback_warn(cfg, what: str):
    if not cfg.dataset.get("synthetic_fallback", True):
        raise FileNotFoundError(f"{what} not cached under {cfg.dataset.dir}")
    log.warning("%s not cached under %s — substituting synthetic analog",
                what, cfg.dataset.dir)


@register_dataset("PyG-Peptides-functional")
@register_dataset("OGB-peptides-functional")
def peptides_functional(cfg) -> DatasetSplits:
    """15.5k peptide graphs, 10-task multilabel
    (reference peptides_functional.py:15-134)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "peptides-functional.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, "peptides-functional")
    return _synthetic_molecular(cfg, 10, "classification_multilabel")


@register_dataset("PyG-Peptides-structural")
@register_dataset("OGB-peptides-structural")
def peptides_structural(cfg) -> DatasetSplits:
    """Same graphs, 11-task regression (reference peptides_structural.py:15-157)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "peptides-structural.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, "peptides-structural")
    return _synthetic_molecular(cfg, 11, "regression")


@register_dataset("PyG-AQSOL")
def aqsol(cfg) -> DatasetSplits:
    """Solubility regression, TypeDict 65 node / 5 edge types
    (reference aqsol_molecules.py:13-133)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "aqsol.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, "AQSOL")
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    w = rng.normal(size=(4 + 65,))
    graphs = []
    for _ in range(d.synth_num_graphs):
        g = _random_molecule(rng, 8, 40, 65, 5)
        g.y = np.array([_graph_label(g, 65, rng, w)], dtype=np.float32)
        graphs.append(g)
    return _split(graphs)


@register_dataset("PyG-MalNetTiny")
def malnet_tiny(cfg) -> DatasetSplits:
    """5k function-call graphs ≤5k nodes, 5 classes; LocalDegreeProfile or
    constant node features (reference malnet_tiny.py:21-124 + feature choice
    master_loader.py:288-318)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "malnet-tiny.npz"))
    if ds is None:
        _fallback_warn(cfg, "MalNetTiny")
        d = cfg.dataset
        rng = np.random.default_rng(d.synth_seed)
        graphs = []
        for _ in range(d.synth_num_graphs):
            n = int(rng.integers(30, min(300, max(31, d.synth_max_nodes * 10))))
            # scale-free-ish call graph
            s = rng.integers(0, np.maximum(1, np.arange(1, n)), size=n - 1)
            ei = np.stack([s, np.arange(1, n)])
            g = Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei)
            g.y = np.array([int(n * 7 + ei.shape[1]) % 5], dtype=np.int64)
            graphs.append(g)
        ds = _split(graphs)
    feat = cfg.dataset.get("malnet_features", "ldp")
    if feat == "ldp":
        for g in ds.all_graphs:
            g.node_feat = local_degree_profile(g)
    elif feat == "constant":
        for g in ds.all_graphs:
            g.node_feat = np.ones((g.num_nodes, 1), dtype=np.float32)
    return ds


def local_degree_profile(g: Graph) -> np.ndarray:
    """LDP features: [deg, min/max/mean/std of neighbor degrees] (PyG
    LocalDegreeProfile semantics, used for MalNet)."""
    n = g.num_nodes
    deg = np.zeros(n)
    s, r = g.edge_index
    np.add.at(deg, r, 1)
    out = np.zeros((n, 5), dtype=np.float32)
    out[:, 0] = deg
    nbr: list = [[] for _ in range(n)]
    for a, b in zip(s.tolist(), r.tolist()):
        nbr[b].append(deg[a])
    for i in range(n):
        if nbr[i]:
            v = np.asarray(nbr[i])
            out[i, 1:] = [v.min(), v.max(), v.mean(), v.std()]
    return out


@register_dataset("OGB-ogbg-code2")
def ogbg_code2(cfg) -> DatasetSplits:
    """Code AST graphs with 5-subtoken method-name targets
    (reference preformat_OGB_Graph ogbg-code2 branch, master_loader.py:344-368).
    Applies vocab building, AST edge augmentation, graph clipping to ≤1000
    nodes, and y→(5,) int encoding."""
    from ..transforms import clip_graph_to_size
    from .code2_utils import (augment_edge, encode_y_to_arr, get_vocab_mapping)

    ds = _npz_splits(os.path.join(cfg.dataset.dir, "ogbg-code2.npz"))
    if ds is None:
        _fallback_warn(cfg, "ogbg-code2")
        d = cfg.dataset
        rng = np.random.default_rng(d.synth_seed)
        words = [f"tok{i}" for i in range(50)]
        graphs = []
        seqs = []
        for _ in range(d.synth_num_graphs):
            n = int(rng.integers(20, 120))
            parent = rng.integers(0, np.maximum(1, np.arange(1, n)), size=n - 1)
            ei = np.stack([parent, np.arange(1, n)])  # AST tree edges
            x = np.stack([rng.integers(0, 90, n), rng.integers(0, 100, n),
                          np.minimum(np.arange(n) % 20, 19)], axis=1)
            g = Graph(node_feat=x.astype(np.int64), edge_index=ei)
            seq = [words[int(i)] for i in rng.integers(0, 50, rng.integers(1, 6))]
            g.extras["y_seq"] = np.array(seq, dtype=object)
            graphs.append(g)
            seqs.append(seq)
        ds = _split(graphs)
    train_seqs = [list(g.extras["y_seq"]) for g in ds.train]
    vocab2idx, idx2vocab = get_vocab_mapping(train_seqs, num_vocab=5000)
    ds.meta["idx2vocab"] = idx2vocab
    for g in ds.all_graphs:
        augment_edge(g)
        clip_graph_to_size(g, 1000)
        g.y = encode_y_to_arr(list(g.extras.pop("y_seq")), vocab2idx, 5)
    return ds


@register_dataset("PyG-TUDataset")
def tu_dataset(cfg) -> DatasetSplits:
    """TUDatasets (NCI1/ENZYMES/PROTEINS/IMDB…; reference
    preformat_TUDataset master_loader.py:566-579)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir,
                                  f"tu-{cfg.dataset.name.lower()}.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, f"TUDataset {cfg.dataset.name}")
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    n_classes = 2 if d.name.upper() in ("NCI1", "PROTEINS", "DD", "IMDB-BINARY") else 6
    w = rng.normal(size=(4 + 16,))
    graphs = []
    for _ in range(d.synth_num_graphs):
        g = _random_molecule(rng, 10, 40, 16, 2)
        score = _graph_label(g, 16, rng, w)
        g.y = np.array([int(abs(score * 11)) % n_classes], dtype=np.int64)
        graphs.append(g)
    return _split(graphs)


@register_dataset("PyG-GNNBenchmarkDataset-MNIST")
@register_dataset("PyG-GNNBenchmarkDataset-CIFAR10")
def mnist_cifar_superpixels(cfg) -> DatasetSplits:
    """MNIST/CIFAR superpixel graph classification (reference
    preformat_GNNBenchmarkDataset: concat_x_and_pos + float cast)."""
    name = cfg.dataset.name
    ds = _npz_splits(os.path.join(cfg.dataset.dir, f"{name.lower()}-sp.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, f"{name} superpixels")
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    fdim = 3 if name == "MNIST" else 5   # intensity(+rgb) + pos(2)
    graphs = []
    for _ in range(d.synth_num_graphs):
        n = int(rng.integers(40, 76))
        x = rng.normal(size=(n, fdim)).astype(np.float32)
        s = np.repeat(np.arange(n), 4)
        r = rng.integers(0, n, size=4 * n)
        keep = s != r
        ei = np.stack([np.concatenate([s[keep], r[keep]]),
                       np.concatenate([r[keep], s[keep]])])
        e = rng.normal(size=(ei.shape[1], 1)).astype(np.float32)
        y = np.array([int(abs(x.sum() * 3)) % 10], dtype=np.int64)
        graphs.append(Graph(node_feat=x, edge_index=ei, edge_feat=e, y=y))
    return _split(graphs)


@register_dataset("PyG-PCQM4Mv2Contact")
@register_dataset("OGB-PCQM4Mv2Contact")
def pcqm4mv2_contact(cfg) -> DatasetSplits:
    """3D-contact link prediction on PCQM4Mv2 molecules: positive contact pairs
    (<3.5Å, >5 hops) + negative sampling (reference pcqm4mv2_contact.py:263-540).
    Cache reader; synthetic molecular fallback builds random contact labels."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "pcqm4mv2-contact.npz"))
    if ds is None:
        _fallback_warn(cfg, "PCQM4Mv2Contact")
        d = cfg.dataset
        rng = np.random.default_rng(d.synth_seed)
        graphs = []
        for _ in range(d.synth_num_graphs):
            g = _random_molecule(rng, 12, 40, 9, 3)
            n = g.num_nodes
            # sample positive "contact" pairs among distant nodes + negatives
            num_pos = max(1, n // 8)
            pos = rng.integers(0, n, size=(2, num_pos))
            neg = rng.integers(0, n, size=(2, num_pos))
            eli = np.concatenate([pos, neg], axis=1)
            lab = np.concatenate([np.ones(num_pos), np.zeros(num_pos)])
            g.extras["edge_label_index"] = eli.astype(np.int64)
            g.extras["edge_label"] = lab.astype(np.float32)
            graphs.append(g)
        ds = _split(graphs)
    return ds
