"""Remaining benchmark dataset loaders: LRGB peptides, AQSOL, MalNetTiny,
PCQM4Mv2Contact, ogbg-code2, TUDatasets, MNIST/CIFAR superpixels.

Capability analogs of /root/reference/graphgps/loader/dataset/* and the
preformat_* family (master_loader.py:256-613). Each loader first parses the
genuine upstream raw layout (see ``io_formats``), then a legacy npz cache, and
falls back to a statistics-matched synthetic dataset when neither is present
(no network egress here). Peptides parses either an npz cache
(tools/export_cache.py) or the genuine upstream raw SMILES table via the
in-repo pure-Python OGB featurizer (``smiles.py`` — no rdkit needed).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from ...registry import register_dataset
from ..graph import Graph
from . import io_formats
from .base import DatasetSplits
from .synthetic import _random_molecule, _graph_label, _split

log = logging.getLogger(__name__)

_KNOWN_REC_KEYS = ("x", "edge_index", "edge_attr", "y")


def _npz_splits(path: str) -> Optional[DatasetSplits]:
    """Generic cache layout: npz with train/val/test object arrays of dicts
    {x, edge_index, edge_attr?, y?, <extras…>} (+ optional 'meta' dict).
    Unknown record keys land in ``Graph.extras``."""
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=True)
    out = {}
    for split in ("train", "val", "test"):
        graphs = []
        for rec in z[split]:
            g = Graph(node_feat=rec["x"], edge_index=rec["edge_index"],
                      edge_feat=rec.get("edge_attr"), y=rec.get("y"))
            for k, v in rec.items():
                if k not in _KNOWN_REC_KEYS:
                    g.extras[k] = v
            graphs.append(g)
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
    raw = io_formats.read_peptides_raw(cfg.dataset.dir, "functional")
    if raw is not None:
        return DatasetSplits(train=raw["train"], val=raw["val"],
                             test=raw["test"], meta={})
    _fallback_warn(cfg, "peptides-functional")
    return _synthetic_molecular(cfg, 10, "classification_multilabel")


@register_dataset("PyG-Peptides-structural")
@register_dataset("OGB-peptides-structural")
def peptides_structural(cfg) -> DatasetSplits:
    """Same graphs, 11-task regression (reference peptides_structural.py:15-157)."""
    ds = _npz_splits(os.path.join(cfg.dataset.dir, "peptides-structural.npz"))
    if ds is not None:
        return ds
    raw = io_formats.read_peptides_raw(cfg.dataset.dir, "structural")
    if raw is not None:
        return DatasetSplits(train=raw["train"], val=raw["val"],
                             test=raw["test"], meta={})
    _fallback_warn(cfg, "peptides-structural")
    return _synthetic_molecular(cfg, 11, "regression")


@register_dataset("PyG-AQSOL")
def aqsol(cfg) -> DatasetSplits:
    """Solubility regression, TypeDict 65 node / 5 edge types
    (reference aqsol_molecules.py:84-131)."""
    raw = io_formats.read_aqsol_raw(cfg.dataset.dir)
    if raw is not None:
        return DatasetSplits(train=raw["train"], val=raw["val"],
                             test=raw["test"],
                             meta=dict(num_node_types=65, num_edge_types=5))
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


_MALNET_FEATURE_SETS = ("none", "Constant", "OneHotDegree",
                        "LocalDegreeProfile")


@register_dataset("PyG-MalNetTiny")
def malnet_tiny(cfg) -> DatasetSplits:
    """5k function-call graphs ≤5k nodes, 5 classes. The feature set is chosen
    by dataset.name like the reference (Constant / OneHotDegree /
    LocalDegreeProfile; preformat_MalNetTiny master_loader.py:288-318,
    raw edgelist layout malnet_tiny.py:72-124)."""
    parsed = io_formats.read_malnet_raw(cfg.dataset.dir)
    if parsed is not None:
        graphs, split_idx = parsed
        ds = DatasetSplits(train=[graphs[i] for i in split_idx["train"]],
                           val=[graphs[i] for i in split_idx["val"]],
                           test=[graphs[i] for i in split_idx["test"]])
    else:
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

    feat = cfg.dataset.name if cfg.dataset.name in _MALNET_FEATURE_SETS \
        else cfg.dataset.get("malnet_features", "LocalDegreeProfile")
    feat = {"ldp": "LocalDegreeProfile", "constant": "Constant",
            "none": "Constant"}.get(feat, feat)
    if feat == "LocalDegreeProfile":
        for g in ds.all_graphs:
            g.node_feat = local_degree_profile(g)
    elif feat == "OneHotDegree":
        max_deg = max(1, max(
            (int(np.bincount(g.edge_index[1], minlength=g.num_nodes).max())
             if g.num_edges else 0) for g in ds.all_graphs))
        for g in ds.all_graphs:
            g.node_feat = io_formats.one_hot_degree(g, max_deg)
    elif feat == "Constant":
        for g in ds.all_graphs:
            g.node_feat = np.ones((g.num_nodes, 1), dtype=np.float32)
    else:
        raise ValueError(f"Unexpected MalNetTiny feature set: {feat!r}")
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

    ds = None
    parsed = io_formats.read_ogb_graph_raw(
        os.path.join(cfg.dataset.dir, "ogbg_code2"), "ogbg-code2")
    if parsed is not None:
        graphs, split_idx = parsed
        ds = DatasetSplits(train=[graphs[i] for i in split_idx["train"]],
                           val=[graphs[i] for i in split_idx["val"]],
                           test=[graphs[i] for i in split_idx["test"]])
        # node features: [type, attr] columns + depth as a third column
        for g in ds.all_graphs:
            depth = g.extras.pop("node_depth", None)
            if depth is not None and g.node_feat.shape[1] == 2:
                g.node_feat = np.concatenate(
                    [g.node_feat, depth.reshape(-1, 1)], axis=1)
            g.extras.pop("node_dfs_order", None)
    if ds is None:
        ds = _npz_splits(os.path.join(cfg.dataset.dir, "ogbg-code2.npz"))
    if ds is None:
        _fallback_warn(cfg, "ogbg-code2")
        d = cfg.dataset
        rng = np.random.default_rng(d.synth_seed)
        words = [f"tok{i}" for i in range(50)]
        graphs = []
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
    """TUDatasets (NCI1/ENZYMES/PROTEINS/IMDB…) parsed from the classic
    ``<NAME>_A.txt`` text layout (reference preformat_TUDataset
    master_loader.py:566-579; IMDB/COLLAB get constant features)."""
    name = cfg.dataset.name
    graphs = io_formats.read_tudataset_raw(cfg.dataset.dir, name)
    if graphs is not None:
        if name.startswith("IMDB-") or name == "COLLAB":
            for g in graphs:  # T.Constant() analog
                g.node_feat = np.ones((g.num_nodes, 1), dtype=np.float32)
        # TU raw files are class-ordered — shuffle deterministically so the
        # contiguous 80/10/10 slices are class-balanced
        order = np.random.default_rng(42).permutation(len(graphs))
        return _split([graphs[i] for i in order])
    ds = _npz_splits(os.path.join(cfg.dataset.dir, f"tu-{name.lower()}.npz"))
    if ds is not None:
        return ds
    _fallback_warn(cfg, f"TUDataset {name}")
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    n_classes = 2 if name.upper() in ("NCI1", "PROTEINS", "DD", "IMDB-BINARY") else 6
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
    raw = (io_formats.read_gnnbenchmark_pt(
        os.path.join(cfg.dataset.dir, "GNNBenchmarkDataset"), name)
        or io_formats.read_gnnbenchmark_pt(cfg.dataset.dir, name))
    if raw is not None:
        return DatasetSplits(train=raw["train"], val=raw["val"],
                             test=raw["test"])
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


# ---------------------------------------------------------------------------
# PCQM4Mv2Contact — link prediction with the reference's 3 negative-sampling
# strategies (pcqm4mv2_contact.py:120-260)
# ---------------------------------------------------------------------------

def create_link_label(id_pos: np.ndarray, id_neg: np.ndarray) -> np.ndarray:
    return np.concatenate([np.ones(id_pos.shape[1], np.float32),
                           np.zeros(id_neg.shape[1], np.float32)])


def structured_neg_sampling_transform(g: Graph, rng: np.random.Generator,
                                      num_neg_per_pos: int = 2) -> Graph:
    """For each positive edge head i, sample ``num_neg_per_pos`` random tails k
    and keep (i,k) pairs that are not positive edges (reference
    structured_neg_sampling_transform + custom_structured_negative_sampling,
    pcqm4mv2_contact.py:120-214).

    TPU note: the reference DROPS collision pairs (dynamic shapes are free in
    torch); here the negative block keeps its fixed (2, P·k) shape and
    collisions are marked invalid in ``edge_label_mask`` — re-sampling every
    epoch (``dataset.resample_negative``) then never changes batch shapes, so
    the train step compiles once."""
    eli, lab = g.extras["edge_label_index"], g.extras["edge_label"]
    id_pos = eli[:, lab == 1]
    n = g.num_nodes
    heads = np.repeat(id_pos[0], num_neg_per_pos)
    rand = rng.integers(0, n, size=heads.shape[0])
    pos_set = set(map(tuple, id_pos.T.tolist()))
    valid = np.array([(h, t) not in pos_set
                      for h, t in zip(heads.tolist(), rand.tolist())], bool)
    id_neg = np.stack([heads, rand]).astype(np.int64)
    g.extras["edge_label_index"] = np.concatenate([id_pos, id_neg], axis=1)
    g.extras["edge_label"] = create_link_label(id_pos, id_neg)
    g.extras["edge_label_mask"] = np.concatenate(
        [np.ones(id_pos.shape[1], bool), valid])
    return g


def neg_sampling_transform(g: Graph, rng: np.random.Generator) -> Graph:
    """Sample 2× positives random non-edges, force-undirected (reference
    neg_sampling_transform, pcqm4mv2_contact.py:216-236). Fixed-size negative
    block with a validity mask (see structured_neg_sampling_transform)."""
    eli, lab = g.extras["edge_label_index"], g.extras["edge_label"]
    id_pos = eli[:, lab == 1]
    n = g.num_nodes
    avoid = set(map(tuple, np.concatenate([id_pos, g.edge_index], 1).T.tolist()))
    want = 2 * id_pos.shape[1]
    out = []
    # rejection-sample undirected non-edges
    for _ in range(20):
        cand = rng.integers(0, n, size=(2, max(4, 2 * want)))
        for a, b in cand.T.tolist():
            if a != b and (a, b) not in avoid and (b, a) not in avoid:
                out.append((a, b))
                avoid.add((a, b))
                if len(out) >= want:
                    break
        if len(out) >= want:
            break
    id_neg = np.zeros((2, want), np.int64)
    valid = np.zeros(want, bool)
    if out:
        arr = np.array(out, np.int64).T
        id_neg[:, : arr.shape[1]] = arr
        valid[: arr.shape[1]] = True
    g.extras["edge_label_index"] = np.concatenate([id_pos, id_neg], axis=1)
    g.extras["edge_label"] = create_link_label(id_pos, id_neg)
    g.extras["edge_label_mask"] = np.concatenate(
        [np.ones(id_pos.shape[1], bool), valid])
    return g


def complete_neg_transform(g: Graph) -> Graph:
    """Mark every non-positive ordered pair (i≠j) negative — V²−V labeled links
    (reference complete_neg_transform, pcqm4mv2_contact.py:238-260)."""
    eli, lab = g.extras["edge_label_index"], g.extras["edge_label"]
    id_pos = eli[:, lab == 1]
    n = g.num_nodes
    full = np.ones((n, n), bool)
    np.fill_diagonal(full, False)
    full[id_pos[0], id_pos[1]] = False
    id_neg = np.stack(np.nonzero(full)).astype(np.int64)
    g.extras["edge_label_index"] = np.concatenate([id_pos, id_neg], axis=1)
    g.extras["edge_label"] = create_link_label(id_pos, id_neg)
    return g


@register_dataset("PyG-PCQM4Mv2Contact")
@register_dataset("OGB-PCQM4Mv2Contact")
def pcqm4mv2_contact(cfg) -> DatasetSplits:
    """3D-contact link prediction on PCQM4Mv2 molecules: positive contact pairs
    (<3.5Å, >5 hops) + negative sampling (reference pcqm4mv2_contact.py:263-540).
    Cache carries per-graph positive pairs; the negative-sampling strategy is
    picked by ``dataset.contact_neg_sampling`` (structured / random / complete)
    and re-applied when ``dataset.resample_negative`` is set (reference
    master_loader.py:486-487). Split variant ('shuffle' / 'num-atoms') comes
    from the dataset name suffix."""
    split_name = "shuffle"
    if cfg.dataset.name.startswith("PCQM4Mv2Contact-"):
        split_name = cfg.dataset.name.split("-", 1)[1]
    path = os.path.join(cfg.dataset.dir, "pcqm4mv2-contact.npz")
    ds = None
    if os.path.exists(path):
        z = np.load(path, allow_pickle=True)
        key = f"split_{split_name.replace('-', '_')}"
        if key in z.files:
            graphs = []
            for rec in z["graphs"]:
                g = Graph(node_feat=rec["x"], edge_index=rec["edge_index"],
                          edge_feat=rec.get("edge_attr"), y=rec.get("y"))
                for k, v in rec.items():
                    if k not in _KNOWN_REC_KEYS:
                        g.extras[k] = v
                graphs.append(g)
            idx = z[key].item()
            ds = DatasetSplits(
                train=[graphs[i] for i in idx["train"]],
                val=[graphs[i] for i in idx["val"]],
                test=[graphs[i] for i in idx["test"]])
        else:
            ds = _npz_splits(path)
    if ds is None:
        _fallback_warn(cfg, "PCQM4Mv2Contact")
        d = cfg.dataset
        rng = np.random.default_rng(d.synth_seed)
        graphs = []
        for _ in range(d.synth_num_graphs):
            g = _random_molecule(rng, 12, 40, 9, 3)
            n = g.num_nodes
            # sample positive "contact" pairs among distant nodes
            num_pos = max(1, n // 8)
            pos = rng.integers(0, n, size=(2, num_pos))
            g.extras["edge_label_index"] = pos.astype(np.int64)
            g.extras["edge_label"] = np.ones(num_pos, np.float32)
            graphs.append(g)
        ds = _split(graphs)
    strategy = cfg.dataset.get("contact_neg_sampling", "structured")
    rng = np.random.default_rng(cfg.seed)
    for g in ds.all_graphs:
        if strategy == "structured":
            structured_neg_sampling_transform(g, rng)
        elif strategy == "random":
            neg_sampling_transform(g, rng)
        elif strategy == "complete":
            complete_neg_transform(g)
        else:
            raise ValueError(f"unknown contact_neg_sampling: {strategy!r}")
    return ds
