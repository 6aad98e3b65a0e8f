"""Readers for the GENUINE on-disk formats of every supported benchmark family.

Each function parses the exact raw layout the upstream dataset ships in (the
same bytes PyG/OGB download), so a user can point ``cfg.dataset.dir`` at an
existing data directory and train without any conversion step:

- ZINC: benchmarking-gnns pickles ``ZINC/raw/{split}.pickle`` of dicts with
  torch tensors + ``{split}.index`` subset files (PyG ``ZINC`` raw layout;
  reference preformat_ZINC /root/reference/graphgps/loader/master_loader.py:547-563).
- OGB graph-property datasets: ``<name>/raw/*.csv.gz`` + ``split/<scheme>/``
  (ogb.io.read_csv_graph_raw layout), incl. ogbg-ppa (no node features) and
  ogbg-code2 (extra node files + space-separated subtoken labels;
  reference preformat_OGB_Graph master_loader.py:321-370).
- GNNBenchmarkDataset: ``<name>/raw/<name>.pt`` torch archives holding
  [train, val, test] lists of tensor dicts (PyG v2 layout; reference
  preformat_GNNBenchmarkDataset master_loader.py:256-286).
- LRGB VOC/COCO superpixels: ``slic_compactness_<c>/<variant>/raw/{split}.pickle``
  of (x, edge_attr, edge_index, y) tuples (reference voc_superpixels.py:127-168,
  coco_superpixels.py:123-187 incl. the label remap).
- AQSOL: ``AQSOL/raw/{split}.pickle`` of (x, edge_attr, edge_index, y) tuples
  with the reference's graph-skipping rules (aqsol_molecules.py:84-131).
- MalNetTiny: ``raw/malnet-graphs-tiny/<type>/**/*.edgelist`` + the
  ``split_info_tiny/type/{train,val,test}.txt`` name lists
  (reference malnet_tiny.py:72-124).
- TUDataset: the classic ``<NAME>_A.txt`` / ``_graph_indicator`` /
  ``_graph_labels`` / ``_node_labels`` / ``_node_attributes`` text layout.
- PCQM4Mv2: ``pcqm4m-v2/split_dict.pt`` (torch pickle of index arrays) consumed
  by the official split-mode construction in ``real.py``.

All outputs are numpy ``Graph`` records; torch is imported lazily and only used
to deserialize ``.pt`` archives.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..graph import Graph


def _to_np(v) -> np.ndarray:
    """torch.Tensor / array-like → numpy (no copy when possible)."""
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# ZINC (benchmarking-gnns pickle + index layout, as shipped by PyG's ZINC)
# ---------------------------------------------------------------------------

def read_zinc_raw(root: str, subset: bool) -> Optional[Dict[str, List[Graph]]]:
    """``<root>/ZINC/raw/{train,val,test}.pickle`` (+ ``.index`` for subset).

    Each pickle holds a list of dicts with keys ``atom_type`` (N,) long,
    ``bond_type`` (N, N) long dense adjacency, ``logP_SA_cycle_normalized``
    scalar float — all torch tensors in the genuine files.
    """
    raw = os.path.join(root, "ZINC", "raw")
    if not all(os.path.exists(os.path.join(raw, f"{s}.pickle"))
               for s in ("train", "val", "test")):
        return None
    out: Dict[str, List[Graph]] = {}
    for split in ("train", "val", "test"):
        with open(os.path.join(raw, f"{split}.pickle"), "rb") as f:
            mols = pickle.load(f)
        indices = range(len(mols))
        if subset:
            # PyG ZINC subset: comma-separated indices, trailing newline
            with open(os.path.join(raw, f"{split}.index")) as f:
                indices = [int(i) for i in f.read().strip().split(",")]
        graphs = []
        for i in indices:
            mol = mols[i]
            atom = _to_np(mol["atom_type"]).astype(np.int64).reshape(-1, 1)
            bond = _to_np(mol["bond_type"])
            s, r = np.nonzero(bond)
            e = bond[s, r].astype(np.int64).reshape(-1, 1)
            y = _to_np(mol["logP_SA_cycle_normalized"]).astype(np.float32).reshape(1)
            graphs.append(Graph(node_feat=atom,
                                edge_index=np.stack([s, r]).astype(np.int64),
                                edge_feat=e, y=y))
        out[split] = graphs
    return out


# ---------------------------------------------------------------------------
# OGB graph-property-prediction raw CSV layout
# ---------------------------------------------------------------------------

# Per-dataset metadata mirroring ogb's master.csv (split scheme + whether the
# raw edge list stores each bond once and needs mirrored edges added).
OGB_META = {
    "ogbg-molhiv": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molpcba": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-moltox21": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molbace": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molbbbp": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molclintox": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molmuv": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molsider": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-moltoxcast": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molesol": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-molfreesolv": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-mollipo": dict(add_inverse_edge=True, split="scaffold"),
    "ogbg-ppa": dict(add_inverse_edge=False, split="species"),
    "ogbg-code2": dict(add_inverse_edge=False, split="project",
                       node_files=("node_is_attributed", "node_dfs_order",
                                   "node_depth"),
                       string_labels=True),
}


def _read_csv_gz(path: str, dtype=None) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    import pandas as pd

    df = pd.read_csv(path, compression="gzip", header=None)
    arr = df.values
    return arr if dtype is None else arr.astype(dtype)


def read_ogb_graph_raw(base: str, name: str
                       ) -> Optional[Tuple[List[Graph], Dict[str, np.ndarray]]]:
    """Parse ``<base>/raw`` + ``<base>/split`` in the ogb.io layout.

    Returns (graphs, split_idx) or None when the directory is absent. For
    ogbg-code2, per-graph subtoken target sequences land in
    ``g.extras['y_seq']`` and the extra node files in ``g.extras``.
    """
    raw = os.path.join(base, "raw")
    if not os.path.isdir(raw):
        return None
    meta = OGB_META.get(name, dict(add_inverse_edge=True, split="scaffold"))

    edges = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int64)
    nn_list = _read_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), np.int64)
    ne_list = _read_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"), np.int64)
    if edges is None or nn_list is None or ne_list is None:
        return None
    nn_list, ne_list = nn_list.ravel(), ne_list.ravel()
    nfeat = _read_csv_gz(os.path.join(raw, "node-feat.csv.gz"), np.int64)
    efeat_f = os.path.join(raw, "edge-feat.csv.gz")
    efeat = _read_csv_gz(efeat_f, np.float32 if name == "ogbg-ppa" else np.int64)

    extra_node: Dict[str, np.ndarray] = {}
    for key in meta.get("node_files", ()):  # code2 auxiliary node columns
        arr = _read_csv_gz(os.path.join(raw, f"{key}.csv.gz"), np.int64)
        if arr is not None:
            extra_node[key] = arr.ravel()

    labels_raw = None
    label_path = os.path.join(raw, "graph-label.csv.gz")
    if meta.get("string_labels"):
        if os.path.exists(label_path):
            import pandas as pd

            df = pd.read_csv(label_path, compression="gzip", header=None)
            # one space-separated subtoken string per graph
            labels_raw = [str(v).split(" ") for v in df.values[:, 0]]
    else:
        labels_raw = _read_csv_gz(label_path, np.float32)

    graphs: List[Graph] = []
    n_off = e_off = 0
    for gi, (n, e) in enumerate(zip(nn_list, ne_list)):
        ei = edges[e_off:e_off + e].T
        ef = efeat[e_off:e_off + e] if efeat is not None else None
        if meta["add_inverse_edge"] and ei.size:
            ei = np.concatenate([ei, ei[::-1]], axis=1)
            if ef is not None:
                ef = np.concatenate([ef, ef], axis=0)
        x = (nfeat[n_off:n_off + n] if nfeat is not None
             else np.zeros((n, 1), np.int64))
        g = Graph(node_feat=x, edge_index=np.ascontiguousarray(ei),
                  edge_feat=ef)
        if meta.get("string_labels"):
            if labels_raw is not None:
                g.extras["y_seq"] = np.array(labels_raw[gi], dtype=object)
        elif labels_raw is not None:
            g.y = labels_raw[gi]
        for key, col in extra_node.items():
            g.extras[key] = col[n_off:n_off + n]
        graphs.append(g)
        n_off += n
        e_off += e

    split_root = os.path.join(base, "split")
    scheme = meta["split"]
    if not os.path.isdir(os.path.join(split_root, scheme)):
        subdirs = sorted(d for d in os.listdir(split_root)
                         if os.path.isdir(os.path.join(split_root, d))) \
            if os.path.isdir(split_root) else []
        if not subdirs:
            return None
        scheme = subdirs[0]
    split_idx = {}
    for s, fname in (("train", "train.csv.gz"), ("val", "valid.csv.gz"),
                     ("test", "test.csv.gz")):
        arr = _read_csv_gz(os.path.join(split_root, scheme, fname), np.int64)
        if arr is None:
            return None
        split_idx[s] = arr.ravel()
    return graphs, split_idx


# ---------------------------------------------------------------------------
# GNNBenchmarkDataset .pt archives (PATTERN / CLUSTER / MNIST / CIFAR10)
# ---------------------------------------------------------------------------

def read_gnnbenchmark_pt(root: str, name: str
                         ) -> Optional[Dict[str, List[Graph]]]:
    """PyG v2 layout: ``<name>.pt`` = [train, val, test] lists of dicts with
    tensor values (x, edge_index, y, and edge_attr / pos for MNIST/CIFAR10)."""
    candidates = [
        os.path.join(root, "GNNBenchmarkDataset", name, "raw", f"{name}.pt"),
        os.path.join(root, name, "raw", f"{name}.pt"),
        os.path.join(root, f"{name}.pt"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        return None
    inputs = _torch_load(path)
    if not (isinstance(inputs, (list, tuple)) and len(inputs) == 3):
        raise ValueError(f"unexpected GNNBenchmark archive structure in {path}")
    vision = name in ("MNIST", "CIFAR10")
    out: Dict[str, List[Graph]] = {}
    for split, records in zip(("train", "val", "test"), inputs):
        graphs = []
        for rec in records:
            rec = {k: _to_np(v) for k, v in rec.items()}
            x = rec["x"]
            if x.ndim == 1:
                x = x[:, None]
            if vision:
                # reference concat_x_and_pos + float cast
                # (transforms.py:39-52, master_loader.py:266-268)
                x = np.concatenate([x.astype(np.float32),
                                    rec["pos"].astype(np.float32)], axis=1)
            else:
                x = x.astype(np.int64)
            ea = rec.get("edge_attr")
            if ea is not None:
                ea = ea.astype(np.float32)
                if ea.ndim == 1:
                    ea = ea[:, None]
            y = rec["y"]
            y = (y.astype(np.int64).reshape(-1) if not vision
                 else y.astype(np.int64).reshape(1))
            graphs.append(Graph(node_feat=x,
                                edge_index=rec["edge_index"].astype(np.int64),
                                edge_feat=ea, y=y))
        out[split] = graphs
    return out


# ---------------------------------------------------------------------------
# LRGB superpixels (VOC / COCO)
# ---------------------------------------------------------------------------

# Reference coco_superpixels.py:123-138 — original label ids are
# non-contiguous; remap to 0..80.
COCO_ORIGINAL_LABELS = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90]


def read_lrgb_superpixels(root: str, family: str, variant: str,
                          slic_compactness: int
                          ) -> Optional[Dict[str, List[Graph]]]:
    """``<root>/<family>/slic_compactness_<c>/<variant>/raw/{split}.pickle``
    holding (x, edge_attr, edge_index, y) tuples of torch tensors."""
    roots = [
        os.path.join(root, family, f"slic_compactness_{slic_compactness}",
                     variant, "raw"),
        os.path.join(root, f"slic_compactness_{slic_compactness}", variant,
                     "raw"),
        os.path.join(root, family, "raw"),
        os.path.join(root, family),  # legacy flat layout
    ]
    raw = next((r for r in roots
                if all(os.path.exists(os.path.join(r, f"{s}.pickle"))
                       for s in ("train", "val", "test"))), None)
    if raw is None:
        return None
    remap = None
    if family.startswith("COCO"):
        remap = np.full(max(COCO_ORIGINAL_LABELS) + 1, -1, dtype=np.int64)
        for i, key in enumerate(COCO_ORIGINAL_LABELS):
            remap[key] = i
    out: Dict[str, List[Graph]] = {}
    for split in ("train", "val", "test"):
        with open(os.path.join(raw, f"{split}.pickle"), "rb") as f:
            records = pickle.load(f)
        graphs = []
        for rec in records:
            x = _to_np(rec[0]).astype(np.float32)
            ea = _to_np(rec[1]).astype(np.float32)
            if ea.ndim == 1:
                ea = ea[:, None]
            ei = _to_np(rec[2]).astype(np.int64)
            y = _to_np(rec[3]).astype(np.int64).reshape(-1)
            if remap is not None:
                y = remap[y]
            graphs.append(Graph(node_feat=x, edge_index=ei, edge_feat=ea, y=y))
        out[split] = graphs
    return out


# ---------------------------------------------------------------------------
# AQSOL (benchmarking-gnns pickle layout)
# ---------------------------------------------------------------------------

def read_aqsol_raw(root: str) -> Optional[Dict[str, List[Graph]]]:
    """``<root>/AQSOL/raw/{split}.pickle`` of (x, edge_attr, edge_index, y).

    Mirrors the reference's cleanup (aqsol_molecules.py:110-120): skip graphs
    with no edges and graphs whose edge_index implies a different node count.
    """
    raw = os.path.join(root, "AQSOL", "raw")
    if not all(os.path.exists(os.path.join(raw, f"{s}.pickle"))
               for s in ("train", "val", "test")):
        return None
    out: Dict[str, List[Graph]] = {}
    for split in ("train", "val", "test"):
        with open(os.path.join(raw, f"{split}.pickle"), "rb") as f:
            records = pickle.load(f)
        graphs = []
        for rec in records:
            x = _to_np(rec[0]).astype(np.int64).reshape(-1, 1)
            ea = _to_np(rec[1]).astype(np.int64).reshape(-1, 1)
            ei = _to_np(rec[2]).astype(np.int64)
            y = _to_np(rec[3]).astype(np.float32).reshape(1)
            if ei.shape[1] == 0:
                continue  # no bonds
            if int(ei.max()) + 1 != x.shape[0]:
                continue  # node-count discrepancy (~10 graphs upstream)
            graphs.append(Graph(node_feat=x, edge_index=ei, edge_feat=ea, y=y))
        out[split] = graphs
    return out


# ---------------------------------------------------------------------------
# MalNetTiny (edgelist + split-name-list layout)
# ---------------------------------------------------------------------------

MALNET_TYPES = ("addisplay", "adware", "benign", "downloader", "trojan")


def read_malnet_raw(root: str) -> Optional[Tuple[List[Graph], Dict[str, list]]]:
    """``<root>/MalNetTiny/raw/malnet-graphs-tiny/<type>/**/*.edgelist`` plus
    ``split_info_tiny/type/{train,val,test}.txt`` graph-name lists."""
    for base in (os.path.join(root, "MalNetTiny", "raw"),
                 os.path.join(root, "raw"), root):
        if os.path.isdir(os.path.join(base, "malnet-graphs-tiny")):
            break
    else:
        return None
    split_dir = os.path.join(base, "split_info_tiny", "type")
    names = {}
    for split, fname in (("train", "train.txt"), ("val", "val.txt"),
                         ("test", "test.txt")):
        p = os.path.join(split_dir, fname)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            names[split] = {line.rsplit("/", 1)[-1]
                            for line in f.read().splitlines() if line}
    graphs: List[Graph] = []
    split_idx: Dict[str, list] = {"train": [], "val": [], "test": []}
    for y, mtype in enumerate(MALNET_TYPES):
        tdir = os.path.join(base, "malnet-graphs-tiny", mtype)
        if not os.path.isdir(tdir):
            return None
        for fn in sorted(glob.glob(os.path.join(tdir, "**", "*.edgelist"),
                                   recursive=True)):
            with open(fn) as f:
                lines = f.read().splitlines()[5:]  # 5 header lines
            pairs = [ln.split() for ln in lines if ln.strip()]
            if not pairs:
                continue
            ei = np.array(pairs, dtype=np.int64).T
            # compact away isolated nodes (reference malnet_tiny.py:96-99)
            used = np.unique(ei)
            relabel = np.zeros(int(used.max()) + 1, dtype=np.int64)
            relabel[used] = np.arange(used.size)
            ei = relabel[ei]
            n = used.size
            g = Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei,
                      y=np.array([y], dtype=np.int64))
            gid = os.path.splitext(os.path.basename(fn))[0]
            ind = len(graphs)
            graphs.append(g)
            for split in ("train", "val", "test"):
                if gid in names[split]:
                    split_idx[split].append(ind)
                    break
    return graphs, split_idx


# ---------------------------------------------------------------------------
# TUDataset classic text layout
# ---------------------------------------------------------------------------

def read_tudataset_raw(root: str, name: str) -> Optional[List[Graph]]:
    """``<root>/<NAME>/raw/<NAME>_A.txt`` + companions (1-indexed)."""
    for base in (os.path.join(root, name, "raw"),
                 os.path.join(root, "TUDataset", name, "raw"),
                 os.path.join(root, name)):
        if os.path.exists(os.path.join(base, f"{name}_A.txt")):
            break
    else:
        return None

    def _lines(fname, dtype=np.int64, delim=","):
        p = os.path.join(base, f"{name}_{fname}.txt")
        if not os.path.exists(p):
            return None
        return np.loadtxt(p, dtype=dtype, delimiter=delim, ndmin=2)

    A = _lines("A")                             # (E, 2) 1-indexed
    gi = _lines("graph_indicator").ravel()      # (N,) 1-indexed graph ids
    glabels = _lines("graph_labels")
    nlabels = _lines("node_labels")
    nattrs = _lines("node_attributes", np.float32)
    elabels = _lines("edge_labels")

    num_graphs = int(gi.max())
    node_of_graph = gi - 1
    # node id remap: global 1-indexed → per-graph 0-indexed
    first_node = np.zeros(num_graphs, dtype=np.int64)
    counts = np.bincount(node_of_graph, minlength=num_graphs)
    first_node[1:] = np.cumsum(counts)[:-1]

    src = A[:, 0] - 1
    dst = A[:, 1] - 1
    edge_graph = node_of_graph[src]

    if glabels is not None:
        gl = glabels.ravel()
        classes = np.unique(gl)
        gl = np.searchsorted(classes, gl)  # contiguous 0-based classes

    graphs: List[Graph] = []
    for g in range(num_graphs):
        nsel = node_of_graph == g
        esel = edge_graph == g
        off = first_node[g]
        ei = np.stack([src[esel] - off, dst[esel] - off])
        n = int(counts[g])
        cols = []
        if nlabels is not None:
            lab = nlabels[nsel]
            cols.append(lab.astype(np.int64))
        if nattrs is not None:
            cols.append(nattrs[nsel].astype(np.float32))
        if cols:
            x = np.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
        else:
            x = np.zeros((n, 1), np.int64)  # Constant() for IMDB/COLLAB
        ef = elabels[esel].astype(np.int64) if elabels is not None else None
        y = np.array([gl[g]], dtype=np.int64) if glabels is not None else None
        graphs.append(Graph(node_feat=x, edge_index=ei.astype(np.int64),
                            edge_feat=ef, y=y))
    return graphs


# ---------------------------------------------------------------------------
# SMILES-table datasets: LRGB Peptides (functional/structural), PCQM4Mv2 raw
# (reference peptides_functional.py:91-116, peptides_structural.py:101-135 —
# there via rdkit's smiles2graph; here via the pure-Python ``smiles`` module)
# ---------------------------------------------------------------------------

_PEPTIDES_LAYOUT = {
    "functional": ("peptides-functional", "peptide_multi_class_dataset.csv.gz",
                   "splits_random_stratified_peptide.pickle"),
    "structural": ("peptides-structural",
                   "peptide_structure_normalized_dataset.csv.gz",
                   "splits_random_stratified_peptide_structure.pickle"),
}

# the 11 normalized regression targets, in the reference's column order
# (peptides_structural.py:105-108)
PEPTIDES_STRUCT_TARGETS = (
    "Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
    "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
    "length_a", "length_b", "length_c", "Spherocity", "Plane_best_fit")


def _graph_from_smiles(smi: str, y: np.ndarray) -> Graph:
    from .smiles import smiles_to_graph

    g = smiles_to_graph(smi)
    return Graph(node_feat=g["node_feat"], edge_index=g["edge_index"],
                 edge_feat=g["edge_feat"], y=y)


def read_peptides_raw(root: str, kind: str) -> Optional[Dict[str, List[Graph]]]:
    """LRGB Peptides from the genuine upstream raw layout:
    ``<root>/peptides-<kind>/raw/<csv.gz>`` (a SMILES table) plus the
    stratified split pickle next to ``raw/``. Graphs are built by the
    in-repo SMILES parser (OGB featurization, no rdkit needed) and memoized
    to ``processed_graphgps_tpu.npz`` in the dataset folder so the parse
    happens once, like the reference's ``process()``.
    """
    folder, csv_name, split_name = _PEPTIDES_LAYOUT[kind]
    base = os.path.join(root, folder)
    csv_path = os.path.join(base, "raw", csv_name)
    split_path = os.path.join(base, split_name)
    if not (os.path.exists(csv_path) and os.path.exists(split_path)):
        return None

    cache = os.path.join(base, "processed_graphgps_tpu.npz")
    graphs: Optional[List[Graph]] = None
    if os.path.exists(cache) and \
            os.path.getmtime(cache) >= os.path.getmtime(csv_path):
        z = np.load(cache, allow_pickle=True)
        graphs = [Graph(node_feat=r["x"], edge_index=r["edge_index"],
                        edge_feat=r["edge_attr"], y=r["y"])
                  for r in z["graphs"]]
    if graphs is None:
        import ast

        import pandas as pd

        df = pd.read_csv(csv_path)
        if kind == "functional":
            ys = [np.asarray(ast.literal_eval(lab), np.float32)
                  for lab in df["labels"]]
        else:
            ys = list(np.asarray(df[list(PEPTIDES_STRUCT_TARGETS)],
                                 np.float32))
        graphs = [_graph_from_smiles(smi, y)
                  for smi, y in zip(df["smiles"], ys)]
        recs = np.empty(len(graphs), dtype=object)
        for i, g in enumerate(graphs):
            recs[i] = dict(x=g.node_feat, edge_index=g.edge_index,
                           edge_attr=g.edge_feat, y=g.y)
        try:
            np.savez_compressed(cache, graphs=recs)
        except OSError:  # read-only dataset dir: parse again next run
            pass

    with open(split_path, "rb") as f:
        split = pickle.load(f)
    return {out_key: [graphs[i]
                      for i in _to_np(split[in_key]).astype(np.int64).ravel()]
            for out_key, in_key in
            (("train", "train"), ("val", "val"), ("test", "test"))}


def read_pcqm4m_raw_csv(root: str) -> Optional[List[Graph]]:
    """OGB-LSC PCQM4Mv2 ``pcqm4m-v2/raw/data.csv.gz`` (smiles, homolumogap —
    NaN gaps for the held-out test molecules). The full 3.7M-row table takes
    a while in pure Python (~10⁴ mol/s); the ``processed.npz`` cache
    (tools/export_cache.py) is preferred and this is the no-rdkit fallback,
    memoized the same way as the Peptides raw path."""
    csv_path = os.path.join(root, "pcqm4m-v2", "raw", "data.csv.gz")
    if not os.path.exists(csv_path):
        return None
    cache = os.path.join(root, "pcqm4m-v2", "processed_graphgps_tpu.npz")
    if os.path.exists(cache) and \
            os.path.getmtime(cache) >= os.path.getmtime(csv_path):
        z = np.load(cache, allow_pickle=True)
        return [Graph(node_feat=r["x"], edge_index=r["edge_index"],
                      edge_feat=r["edge_attr"], y=r["y"])
                for r in z["graphs"]]
    import pandas as pd

    df = pd.read_csv(csv_path)
    graphs = [_graph_from_smiles(
        smi, np.asarray([gap], np.float32))
        for smi, gap in zip(df["smiles"], df["homolumogap"])]
    recs = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        recs[i] = dict(x=g.node_feat, edge_index=g.edge_index,
                       edge_attr=g.edge_feat, y=g.y)
    try:
        np.savez_compressed(cache, graphs=recs)
    except OSError:
        pass
    return graphs


# ---------------------------------------------------------------------------
# PCQM4Mv2 split dictionary
# ---------------------------------------------------------------------------

def read_pcqm4m_split_dict(root: str) -> Optional[Dict[str, np.ndarray]]:
    """Official ``split_dict.pt`` with train / valid / test-dev /
    test-challenge index arrays."""
    for p in (os.path.join(root, "pcqm4m-v2", "split_dict.pt"),
              os.path.join(root, "pcqm4m-v2", "raw", "split_dict.pt")):
        if os.path.exists(p):
            d = _torch_load(p)
            return {k: _to_np(v).astype(np.int64).ravel() for k, v in d.items()}
    return None


# ---------------------------------------------------------------------------
# Node feature transforms used by MalNetTiny (reference master_loader.py:288-318)
# ---------------------------------------------------------------------------

def one_hot_degree(g: Graph, max_degree: int) -> np.ndarray:
    """PyG T.OneHotDegree semantics: one-hot of (clipped) in-degree."""
    deg = np.zeros(g.num_nodes, dtype=np.int64)
    np.add.at(deg, g.edge_index[1], 1)
    deg = np.minimum(deg, max_degree)
    out = np.zeros((g.num_nodes, max_degree + 1), dtype=np.float32)
    out[np.arange(g.num_nodes), deg] = 1.0
    return out


def read_csl_raw(root: str) -> Optional[List[Graph]]:
    """GNNBenchmark CSL raw layout (PyG GNNBenchmarkDataset, CSL branch):
    ``graphs_Kary_Deterministic_Graphs.pkl`` — a list of scipy sparse
    adjacency matrices — plus ``y_Kary_Deterministic_Graphs.pt`` labels.
    CSL graphs are featureless (task_specific_preprocessing adds the zero
    column; reference master_loader.py:280-282 + task_preprocessing.py:55-63).
    """
    names = ("graphs_Kary_Deterministic_Graphs.pkl",
             "y_Kary_Deterministic_Graphs.pt")
    for base in (os.path.join(root, "CSL", "raw"), os.path.join(root, "CSL"),
                 root):
        if all(os.path.exists(os.path.join(base, n)) for n in names):
            break
    else:
        return None
    with open(os.path.join(base, names[0]), "rb") as f:
        adjs = pickle.load(f)
    ys = _to_np(_torch_load(os.path.join(base, names[1]))).astype(np.int64)
    graphs = []
    for adj, y in zip(adjs, ys):
        coo = adj.tocoo()
        ei = np.stack([coo.row, coo.col]).astype(np.int64)
        n = adj.shape[0]
        graphs.append(Graph(node_feat=np.zeros((n, 1), np.float32),
                            edge_index=ei, y=np.array([y], np.int64)))
    return graphs


def read_geom_gcn_raw(root: str, name: str, split_index: int = 0
                      ) -> Optional[Tuple[Graph, Dict[str, np.ndarray]]]:
    """Transductive node-classification raw layout shared by PyG's WebKB,
    WikipediaNetwork (geom_gcn_preprocess) and Actor datasets:

    - ``out1_graph_edges.txt``: header line + one "src<TAB>dst" edge per line;
    - ``out1_node_feature_label.txt``: header + "id<TAB>feats<TAB>label";
      features are comma-separated values — dense for WebKB/Wikipedia,
      one-hot INDEX lists for Actor (film), detected per row;
    - ``<stem>_split_0.6_0.2_<i>.npz``: boolean train/val/test node masks
      (10 official splits; picked by ``split_index``).

    Returns (graph, {train_mask, val_mask, test_mask}) or None.
    """
    stem = "film" if name.lower() in ("actor", "film", "none") else name
    for base in (os.path.join(root, stem, "raw"),
                 os.path.join(root, name, "raw"), os.path.join(root, stem)):
        if os.path.exists(os.path.join(base, "out1_graph_edges.txt")):
            break
    else:
        return None
    with open(os.path.join(base, "out1_node_feature_label.txt")) as f:
        rows = f.read().splitlines()[1:]
    feats_raw, labels = [], []
    for line in rows:
        if not line.strip():
            continue
        _, feat, lab = line.split("\t")
        feats_raw.append(feat)
        labels.append(int(lab))
    n = len(labels)
    # Actor stores variable-length one-hot index lists; dense otherwise
    is_sparse = len({len(r.split(",")) for r in feats_raw}) > 1
    if is_sparse:
        dim = max(int(i) for r in feats_raw for i in r.split(",")) + 1
        x = np.zeros((n, dim), np.float32)
        for i, r in enumerate(feats_raw):
            x[i, [int(j) for j in r.split(",")]] = 1.0
    else:
        x = np.asarray([[float(v) for v in r.split(",")] for r in feats_raw],
                       np.float32)
    with open(os.path.join(base, "out1_graph_edges.txt")) as f:
        lines = f.read().splitlines()[1:]
    pairs = np.asarray([[int(v) for v in ln.split()] for ln in lines
                        if ln.strip()], np.int64)
    # undirected + dedup like PyG's processing
    both = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
    both = np.unique(both, axis=0)
    g = Graph(node_feat=x, edge_index=both.T.copy(),
              y=np.asarray(labels, np.int64))
    split_path = os.path.join(base, f"{stem}_split_0.6_0.2_{split_index}.npz")
    if not os.path.exists(split_path):
        cands = sorted(glob.glob(os.path.join(base, "*_split_*.npz")))
        if not cands:
            return None
        split_path = cands[min(split_index, len(cands) - 1)]
    z = np.load(split_path)
    masks = {k: np.asarray(z[k], bool)
             for k in ("train_mask", "val_mask", "test_mask")}
    return g, masks


def read_planetoid_raw(root: str, name: str
                       ) -> Optional[Tuple[Graph, Dict[str, np.ndarray]]]:
    """Planetoid (Cora/CiteSeer/PubMed) classic ``ind.<name>.*`` layout:
    pickled scipy matrices x/tx/allx (features), y/ty/ally (one-hot labels),
    ``graph`` (adjacency dict) and ``test.index``. Reconstructs the standard
    transductive split: train = first len(y) nodes, val = the next 500,
    test = test.index (CiteSeer's isolated test nodes are zero-padded, as in
    the standard processing)."""
    lname = name.lower()
    for base in (os.path.join(root, name, "raw"),
                 os.path.join(root, lname, "raw"),
                 os.path.join(root, "Planetoid", name, "raw"),
                 os.path.join(root, "Planetoid", lname, "raw"), root):
        if os.path.exists(os.path.join(base, f"ind.{lname}.x")):
            break
    else:
        return None

    def _load(part):
        with open(os.path.join(base, f"ind.{lname}.{part}"), "rb") as f:
            return pickle.load(f, encoding="latin1")

    allx, tx = _load("allx"), _load("tx")
    ally, ty = np.asarray(_load("ally")), np.asarray(_load("ty"))
    y_train = np.asarray(_load("y"))
    graph = _load("graph")
    with open(os.path.join(base, f"ind.{lname}.test.index")) as f:
        test_idx = np.asarray([int(l) for l in f.read().split()], np.int64)

    n_all = allx.shape[0]
    full_range = np.arange(test_idx.min(), test_idx.max() + 1)
    n = n_all + len(full_range)
    feat_dim = allx.shape[1]
    x = np.zeros((n, feat_dim), np.float32)
    x[:n_all] = np.asarray(allx.todense() if hasattr(allx, "todense") else allx)
    tx_dense = np.asarray(tx.todense() if hasattr(tx, "todense") else tx)
    # CiteSeer: test.index has gaps (isolated nodes stay zero) — scatter each
    # test row to its true node index
    pos = {int(t): i for i, t in enumerate(test_idx)}
    for t, i in pos.items():
        x[t] = tx_dense[i]

    num_classes = ally.shape[1]
    labels = np.zeros((n,), np.int64)
    labels[:n_all] = ally.argmax(1)
    for t, i in pos.items():
        labels[t] = int(ty[i].argmax())

    src, dst = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            if u != v:
                src.append(u)
                dst.append(v)
    both = np.unique(np.concatenate([np.stack([src, dst], 1),
                                     np.stack([dst, src], 1)]), axis=0)
    g = Graph(node_feat=x, edge_index=both.T.copy().astype(np.int64),
              y=labels)
    masks = {"train_mask": np.zeros(n, bool), "val_mask": np.zeros(n, bool),
             "test_mask": np.zeros(n, bool)}
    masks["train_mask"][: y_train.shape[0]] = True
    masks["val_mask"][y_train.shape[0]: y_train.shape[0] + 500] = True
    masks["test_mask"][test_idx] = True
    return g, masks


def read_ogbl_raw(base: str
                  ) -> Optional[Tuple[Graph, Dict[str, Dict[str, np.ndarray]]]]:
    """OGB link-property-prediction raw layout (ogbl-*): ONE graph from
    ``raw/edge.csv.gz`` (+ optional node-feat) and per-split labeled edge sets
    from ``split/<scheme>/{train,valid,test}.pt`` torch pickles holding
    {'edge': (E, 2), optional 'edge_neg': (En, 2)} arrays."""
    raw = os.path.join(base, "raw")
    if not os.path.isdir(raw):
        return None
    edges = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int64)
    if edges is None:
        return None
    nfeat = _read_csv_gz(os.path.join(raw, "node-feat.csv.gz"), np.float32)
    nn = _read_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), np.int64)
    n = int(nn.ravel()[0]) if nn is not None else int(edges.max()) + 1
    x = nfeat if nfeat is not None else np.zeros((n, 1), np.float32)
    ei = np.concatenate([edges, edges[:, ::-1]]).T.astype(np.int64)
    g = Graph(node_feat=np.asarray(x, np.float32), edge_index=ei)

    split_root = os.path.join(base, "split")
    if not os.path.isdir(split_root):
        return None
    schemes = sorted(d for d in os.listdir(split_root)
                     if os.path.isdir(os.path.join(split_root, d)))
    if not schemes:
        return None
    sd = os.path.join(split_root, schemes[0])
    splits: Dict[str, Dict[str, np.ndarray]] = {}
    for split, fname in (("train", "train.pt"), ("val", "valid.pt"),
                         ("test", "test.pt")):
        p = os.path.join(sd, fname)
        if not os.path.exists(p):
            return None
        d = _torch_load(p)
        splits[split] = {k: _to_np(v) for k, v in d.items()}
    return g, splits
