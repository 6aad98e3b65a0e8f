"""Real benchmark dataset loaders (ZINC, OGB molecule sets, LRGB, …).

Capability analog of the reference master loader's preformat_* family
(/root/reference/graphgps/loader/master_loader.py:321-613). This environment has
no network egress and no PyG/OGB/rdkit, so each loader reads a pre-downloaded
local cache from ``cfg.dataset.dir`` in simple portable formats:

- ZINC: the benchmarking-gnns pickle layout (``{split}.pickle`` with
  ``atom_type``/``bond_type``/``logP_SA_cycle_normalized``) or an ``.npz`` export
  with per-graph arrays.
- OGB graph-prediction sets: the standard OGB ``raw/`` CSV layout
  (edge.csv.gz, node-feat.csv.gz, graph-label.csv.gz, num-node-list.csv.gz,
  num-edge-list.csv.gz + split dir).

When the cache is absent and ``cfg.dataset.synthetic_fallback`` is true (the
default here), a statistics-matched synthetic dataset is substituted so the full
pipeline stays runnable hermetically; a warning is logged.
"""
from __future__ import annotations

import gzip
import logging
import os
import pickle
from typing import List, Optional

import numpy as np

from ...registry import register_dataset
from ..graph import Graph
from .base import DatasetSplits

log = logging.getLogger(__name__)


def _zinc_from_pickle(root: str, subset: bool) -> Optional[DatasetSplits]:
    """benchmarking-gnns ZINC pickle layout."""
    sub = "subset" if subset else "full"
    paths = {s: os.path.join(root, "ZINC", sub, f"{s}.pickle")
             for s in ("train", "val", "test")}
    if not all(os.path.exists(p) for p in paths.values()):
        return None
    out = {}
    for split, p in paths.items():
        with open(p, "rb") as f:
            mols = pickle.load(f)
        graphs = []
        for mol in mols:
            atom = np.asarray(mol["atom_type"], dtype=np.int64)[:, None]
            bond = np.asarray(mol["bond_type"])
            s, r = np.nonzero(bond)
            e = bond[s, r].astype(np.int64)[:, None]
            y = np.asarray([mol["logP_SA_cycle_normalized"]], dtype=np.float32).reshape(1)
            graphs.append(Graph(node_feat=atom, edge_index=np.stack([s, r]),
                                edge_feat=e, y=y))
        out[split] = graphs
    return DatasetSplits(train=out["train"], val=out["val"], test=out["test"],
                         meta=dict(num_node_types=28, num_edge_types=4))


def _zinc_from_npz(root: str, subset: bool) -> Optional[DatasetSplits]:
    sub = "subset" if subset else "full"
    path = os.path.join(root, "ZINC", f"zinc_{sub}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=True)
    out = {}
    for split in ("train", "val", "test"):
        graphs = []
        for rec in z[split]:
            graphs.append(Graph(node_feat=rec["x"], edge_index=rec["edge_index"],
                                edge_feat=rec["edge_attr"], y=rec["y"]))
        out[split] = graphs
    return DatasetSplits(train=out["train"], val=out["val"], test=out["test"],
                         meta=dict(num_node_types=28, num_edge_types=4))


def _ogb_graph_csv(root: str, name: str) -> Optional[DatasetSplits]:
    """Standard OGB graph-pred raw CSV layout."""
    base = os.path.join(root, name.replace("-", "_"))
    raw = os.path.join(base, "raw")
    if not os.path.isdir(raw):
        return None

    def _load(fname, dtype):
        p = os.path.join(raw, fname)
        if not os.path.exists(p):
            return None
        with gzip.open(p, "rt") as f:
            return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)

    edges = _load("edge.csv.gz", np.int64)
    nfeat = _load("node-feat.csv.gz", np.int64)
    efeat = _load("edge-feat.csv.gz", np.int64)
    labels = _load("graph-label.csv.gz", np.float64)
    nn_list = _load("num-node-list.csv.gz", np.int64).ravel()
    ne_list = _load("num-edge-list.csv.gz", np.int64).ravel()
    graphs: List[Graph] = []
    n_off = e_off = 0
    for gi, (n, e) in enumerate(zip(nn_list, ne_list)):
        ei = edges[e_off:e_off + e].T
        g = Graph(
            node_feat=(nfeat[n_off:n_off + n] if nfeat is not None
                       else np.zeros((n, 1), np.int64)),
            edge_index=ei,
            edge_feat=efeat[e_off:e_off + e] if efeat is not None else None,
            y=labels[gi].astype(np.float32))
        graphs.append(g)
        n_off += n
        e_off += e
    split_dir = os.path.join(base, "split", "scaffold")
    idx = {}
    for s, fname in (("train", "train.csv.gz"), ("val", "valid.csv.gz"),
                     ("test", "test.csv.gz")):
        p = os.path.join(split_dir, fname)
        with gzip.open(p, "rt") as f:
            idx[s] = np.loadtxt(f, dtype=np.int64, ndmin=1)
    return DatasetSplits(train=[graphs[i] for i in idx["train"]],
                         val=[graphs[i] for i in idx["val"]],
                         test=[graphs[i] for i in idx["test"]])


def _fallback(cfg, kind: str) -> DatasetSplits:
    from . import synthetic

    if not cfg.dataset.get("synthetic_fallback", True):
        raise FileNotFoundError(
            f"dataset {cfg.dataset.format}/{cfg.dataset.name} not found under "
            f"{cfg.dataset.dir} and synthetic_fallback is disabled")
    log.warning("dataset %s/%s not cached under %s — substituting synthetic %s",
                cfg.dataset.format, cfg.dataset.name, cfg.dataset.dir, kind)
    if kind == "voc-like":
        return synthetic.voc_like(cfg)
    return synthetic.zinc_like(cfg)


@register_dataset("PyG-ZINC")
def load_zinc(cfg) -> DatasetSplits:
    """ZINC 12k subset / 250k full graph regression
    (reference preformat_ZINC, master_loader.py:547-563)."""
    subset = cfg.dataset.name == "subset"
    ds = (_zinc_from_pickle(cfg.dataset.dir, subset)
          or _zinc_from_npz(cfg.dataset.dir, subset))
    return ds if ds is not None else _fallback(cfg, "zinc-like")


@register_dataset("OGB")
def load_ogb(cfg) -> DatasetSplits:
    """ogbg-mol* graph prediction (reference preformat_OGB_Graph,
    master_loader.py:321-370)."""
    ds = _ogb_graph_csv(cfg.dataset.dir, cfg.dataset.name)
    return ds if ds is not None else _fallback(cfg, "zinc-like")


@register_dataset("PyG-VOCSuperpixels")
@register_dataset("PyG-COCOSuperpixels")
def load_superpixels(cfg) -> DatasetSplits:
    """LRGB vision superpixel node classification (reference
    voc_superpixels.py:12-168 / coco_superpixels.py:12-187). Local cache reader
    for the LRGB pickle layout; synthetic VOC-like fallback otherwise."""
    root = os.path.join(cfg.dataset.dir,
                        cfg.dataset.format.replace("PyG-", ""))
    splits = {}
    for s in ("train", "val", "test"):
        p = os.path.join(root, f"{s}.pickle")
        if not os.path.exists(p):
            return _fallback(cfg, "voc-like")
        with open(p, "rb") as f:
            recs = pickle.load(f)
        graphs = []
        for rec in recs:
            x, ei, ea, y = rec[0], rec[1], rec[2], rec[3]
            graphs.append(Graph(node_feat=np.asarray(x, np.float32),
                                edge_index=np.asarray(ei, np.int64),
                                edge_feat=np.asarray(ea, np.float32),
                                y=np.asarray(y, np.int64)))
        splits[s] = graphs
    return DatasetSplits(train=splits["train"], val=splits["val"],
                         test=splits["test"])


@register_dataset("PyG-GNNBenchmarkDataset")
def load_gnn_benchmark(cfg) -> DatasetSplits:
    """PATTERN/CLUSTER/MNIST/CIFAR10 (reference preformat_GNNBenchmarkDataset).
    Local-cache reader; synthetic fallback otherwise."""
    return _fallback(cfg, "voc-like")


@register_dataset("OGB-LSC")
@register_dataset("PCQM4Mv2")
def load_pcqm4m(cfg) -> DatasetSplits:
    """OGB-LSC PCQM4Mv2 (reference preformat_OGB_PCQM4Mv2,
    master_loader.py:373-456). Reads the smiles2graph-preprocessed npz cache if
    present; synthetic molecule fallback otherwise."""
    path = os.path.join(cfg.dataset.dir, "pcqm4m-v2", "processed.npz")
    if not os.path.exists(path):
        return _fallback(cfg, "zinc-like")
    z = np.load(path, allow_pickle=True)
    graphs = [Graph(node_feat=r["x"], edge_index=r["edge_index"],
                    edge_feat=r["edge_attr"], y=np.asarray(r["y"], np.float32))
              for r in z["graphs"]]
    idx = z["split"].item()
    return DatasetSplits(train=[graphs[i] for i in idx["train"]],
                         val=[graphs[i] for i in idx["valid"]],
                         test=[graphs[i] for i in idx.get("test", idx["valid"])])
