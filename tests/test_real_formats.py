"""Fixture tests for the GENUINE on-disk dataset formats.

Each test fabricates a miniature cache in the exact raw layout the upstream
dataset ships in (the bytes PyG/OGB download), then asserts the loader parses
graphs/splits/labels correctly with ``synthetic_fallback`` DISABLED — a format
mismatch is a loud error, not a silent synthetic substitution.

Formats covered (VERDICT round-1 item 1): benchmarking-gnns ZINC pickles +
subset .index files, OGB raw CSV (mol / ppa / code2 variants), PyG
GNNBenchmarkDataset .pt archives, LRGB superpixel pickles (VOC + COCO remap),
AQSOL pickles, MalNetTiny edgelists, TUDataset text files, PCQM4Mv2 official
split construction.
"""
import gzip
import os
import pickle

import numpy as np
import pytest
import torch


@pytest.fixture
def cfg(base_cfg, tmp_path):
    c = base_cfg.clone()
    c.dataset.dir = str(tmp_path)
    c.dataset.synthetic_fallback = False
    return c


# ---------------------------------------------------------------------------
# ZINC (benchmarking-gnns pickle + index layout)
# ---------------------------------------------------------------------------

def _write_zinc_raw(root, n_mols=8):
    raw = os.path.join(root, "ZINC", "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    for split, count in (("train", n_mols), ("val", 4), ("test", 4)):
        mols = []
        for i in range(count):
            n = int(rng.integers(4, 9))
            bond = np.zeros((n, n), np.int64)
            for v in range(1, n):  # ring-free chain with typed bonds
                t = int(rng.integers(1, 4))
                bond[v - 1, v] = bond[v, v - 1] = t
            mols.append({
                "num_atom": n,
                "atom_type": torch.tensor(rng.integers(0, 28, n)),
                "bond_type": torch.tensor(bond),
                "logP_SA_cycle_normalized": torch.tensor([float(i)]),
            })
        with open(os.path.join(raw, f"{split}.pickle"), "wb") as f:
            pickle.dump(mols, f)
        # subset index: every other molecule, genuine trailing-newline format
        idx = ",".join(str(j) for j in range(0, count, 2))
        with open(os.path.join(raw, f"{split}.index"), "w") as f:
            f.write(idx + "\n")


def test_zinc_pickle_full_and_subset(cfg):
    from graphgps_tpu.data.datasets.real import load_zinc

    _write_zinc_raw(cfg.dataset.dir)
    cfg.dataset.format, cfg.dataset.name = "PyG-ZINC", "full"
    ds = load_zinc(cfg)
    assert [len(ds.train), len(ds.val), len(ds.test)] == [8, 4, 4]
    g = ds.train[3]
    assert g.node_feat.ndim == 2 and g.node_feat.shape[1] == 1
    assert g.edge_feat.min() >= 1  # bond types 1..3, no phantom edges
    # bonds are symmetric: every (s,r) has (r,s)
    pairs = set(map(tuple, g.edge_index.T.tolist()))
    assert all((r, s) in pairs for s, r in pairs)
    assert float(g.y[0]) == 3.0

    cfg.dataset.name = "subset"
    sub = load_zinc(cfg)
    assert [len(sub.train), len(sub.val), len(sub.test)] == [4, 2, 2]
    assert float(sub.train[1].y[0]) == 2.0  # index file selects 0,2,4,6


# ---------------------------------------------------------------------------
# OGB raw CSV layout
# ---------------------------------------------------------------------------

def _csv_gz(path, rows):
    with gzip.open(path, "wt") as f:
        for row in rows:
            f.write(",".join(str(v) for v in np.atleast_1d(row)) + "\n")


def _write_ogb_raw(base, *, node_feat=True, efeat_float=False,
                   string_labels=False, split_scheme="scaffold",
                   extra_node_files=(), num_graphs=6):
    raw = os.path.join(base, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(1)
    nn, ne, edges, nfeat, efeat, labels = [], [], [], [], [], []
    extra = {k: [] for k in extra_node_files}
    for gi in range(num_graphs):
        n = int(rng.integers(4, 8))
        nn.append(n)
        e = n - 1
        ne.append(e)
        for v in range(e):  # single-direction chain; reader mirrors if meta says
            edges.append((v, v + 1))
            efeat.append(np.round(rng.random(2), 3) if efeat_float
                         else rng.integers(0, 3, 3))
        for v in range(n):
            if node_feat:
                nfeat.append(rng.integers(0, 5, 2 if string_labels else 9))
            for k in extra_node_files:
                extra[k].append(v % 2 if "attributed" in k else v)
        labels.append(f"get value {gi}" if string_labels else [gi % 2])
    _csv_gz(os.path.join(raw, "edge.csv.gz"), edges)
    _csv_gz(os.path.join(raw, "num-node-list.csv.gz"), nn)
    _csv_gz(os.path.join(raw, "num-edge-list.csv.gz"), ne)
    if node_feat:
        _csv_gz(os.path.join(raw, "node-feat.csv.gz"), nfeat)
    _csv_gz(os.path.join(raw, "edge-feat.csv.gz"), efeat)
    if string_labels:
        with gzip.open(os.path.join(raw, "graph-label.csv.gz"), "wt") as f:
            f.write("\n".join(labels) + "\n")
    else:
        _csv_gz(os.path.join(raw, "graph-label.csv.gz"), labels)
    for k, vals in extra.items():
        _csv_gz(os.path.join(raw, f"{k}.csv.gz"), vals)
    sd = os.path.join(base, "split", split_scheme)
    os.makedirs(sd)
    idx = np.arange(num_graphs)
    _csv_gz(os.path.join(sd, "train.csv.gz"), idx[:num_graphs - 2])
    _csv_gz(os.path.join(sd, "valid.csv.gz"), idx[num_graphs - 2:num_graphs - 1])
    _csv_gz(os.path.join(sd, "test.csv.gz"), idx[num_graphs - 1:])


def test_ogb_molhiv_raw(cfg):
    from graphgps_tpu.data.datasets.real import load_ogb

    _write_ogb_raw(os.path.join(cfg.dataset.dir, "ogbg_molhiv"))
    cfg.dataset.format, cfg.dataset.name = "OGB", "ogbg-molhiv"
    ds = load_ogb(cfg)
    assert [len(ds.train), len(ds.val), len(ds.test)] == [4, 1, 1]
    g = ds.train[0]
    n, e = g.num_nodes, g.num_edges
    assert e == 2 * (n - 1)  # inverse edges added for mol datasets
    assert g.node_feat.shape == (n, 9) and g.edge_feat.shape == (e, 3)
    # mirrored edges carry identical features
    half = e // 2
    assert np.array_equal(g.edge_index[:, half:], g.edge_index[::-1, :half])
    assert np.array_equal(g.edge_feat[half:], g.edge_feat[:half])
    assert g.y.shape == (1,)


def test_ogb_ppa_raw(cfg):
    from graphgps_tpu.data.datasets.real import load_ogb

    _write_ogb_raw(os.path.join(cfg.dataset.dir, "ogbg_ppa"),
                   node_feat=False, efeat_float=True, split_scheme="species")
    cfg.dataset.format, cfg.dataset.name = "OGB", "ogbg-ppa"
    ds = load_ogb(cfg)
    g = ds.train[0]
    assert np.array_equal(g.node_feat, np.zeros((g.num_nodes, 1)))  # zeros added
    assert g.edge_feat.dtype == np.float32 and g.edge_feat.shape[1] == 2
    assert g.num_edges == g.num_nodes - 1  # NOT mirrored for ppa


def test_ogb_code2_raw_pipeline(cfg):
    from graphgps_tpu.data.datasets.more_real import ogbg_code2

    _write_ogb_raw(os.path.join(cfg.dataset.dir, "ogbg_code2"),
                   string_labels=True, split_scheme="project",
                   extra_node_files=("node_is_attributed", "node_dfs_order",
                                     "node_depth"))
    cfg.dataset.format, cfg.dataset.name = "OGB", "ogbg-code2"
    ds = ogbg_code2(cfg)
    assert "idx2vocab" in ds.meta
    g = ds.train[0]
    # node features: [type, attr, depth]
    assert g.node_feat.shape[1] == 3
    # augment_edge: AST fwd+inv, then next-token over attributed nodes (odd
    # indices) + inverses; edge_attr columns are (type, direction)
    n_ast = g.node_feat.shape[0] - 1
    n_chain = max(0, g.node_feat.shape[0] // 2 - 1)  # odd-index nodes chained
    assert g.num_edges == 2 * n_ast + 2 * n_chain
    assert set(map(tuple, np.unique(g.edge_feat, axis=0).tolist())) <= {
        (0, 0), (0, 1), (1, 0), (1, 1)}
    # next-token edges connect attributed (odd) nodes only
    nt = g.edge_index[:, g.edge_feat[:, 0] == 1]
    assert np.all(nt % 2 == 1)
    # y encoded to fixed length 5 with the train vocab
    assert g.y.shape == (5,)
    eos = len(ds.meta["idx2vocab"]) - 1
    assert g.y[3] == eos  # 3-token target → EOS-padded


# ---------------------------------------------------------------------------
# GNNBenchmarkDataset .pt archives
# ---------------------------------------------------------------------------

def _write_gnnbench_pt(root, name, node_level=True):
    d = os.path.join(root, "GNNBenchmarkDataset", name, "raw")
    os.makedirs(d)
    rng = np.random.default_rng(2)
    splits = []
    for count in (6, 3, 3):
        records = []
        for _ in range(count):
            n = int(rng.integers(5, 10))
            s = np.arange(n - 1)
            ei = np.stack([np.concatenate([s, s + 1]),
                           np.concatenate([s + 1, s])])
            rec = dict(edge_index=torch.tensor(ei))
            if node_level:  # PATTERN/CLUSTER: int types, node labels
                rec["x"] = torch.tensor(rng.integers(0, 3, n))
                rec["y"] = torch.tensor(rng.integers(0, 2, n))
            else:  # MNIST/CIFAR10: pixel features + pos, graph label
                rec["x"] = torch.tensor(rng.random((n, 1)).astype(np.float32))
                rec["pos"] = torch.tensor(rng.random((n, 2)).astype(np.float32))
                rec["edge_attr"] = torch.tensor(
                    rng.random(2 * (n - 1)).astype(np.float32))
                rec["y"] = torch.tensor([int(rng.integers(0, 10))])
            records.append(rec)
        splits.append(records)
    torch.save(splits, os.path.join(d, f"{name}.pt"))


def test_gnnbenchmark_pattern(cfg):
    from graphgps_tpu.data.datasets.real import load_gnn_benchmark

    _write_gnnbench_pt(cfg.dataset.dir, "PATTERN", node_level=True)
    cfg.dataset.format, cfg.dataset.name = "PyG-GNNBenchmarkDataset", "PATTERN"
    ds = load_gnn_benchmark(cfg)
    assert [len(ds.train), len(ds.val), len(ds.test)] == [6, 3, 3]
    g = ds.train[0]
    assert g.node_feat.dtype == np.int64 and g.node_feat.shape[1] == 1
    assert g.y.shape == (g.num_nodes,)  # node-level labels
    assert ds.meta["num_node_types"] == 3


def test_gnnbenchmark_mnist(cfg):
    from graphgps_tpu.data.datasets.more_real import mnist_cifar_superpixels

    _write_gnnbench_pt(cfg.dataset.dir, "MNIST", node_level=False)
    cfg.dataset.format, cfg.dataset.name = "PyG-GNNBenchmarkDataset", "MNIST"
    ds = mnist_cifar_superpixels(cfg)
    g = ds.train[0]
    assert g.node_feat.dtype == np.float32
    assert g.node_feat.shape[1] == 3  # concat(x, pos)
    assert g.edge_feat.shape == (g.num_edges, 1)
    assert g.y.shape == (1,)


# ---------------------------------------------------------------------------
# LRGB superpixels (VOC / COCO)
# ---------------------------------------------------------------------------

def _write_lrgb(root, family, variant="edge_wt_only_coord", compactness=30,
                labels=None):
    raw = os.path.join(root, family, f"slic_compactness_{compactness}",
                       variant, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(3)
    for split, count in (("train", 4), ("val", 2), ("test", 2)):
        records = []
        for _ in range(count):
            n = int(rng.integers(6, 12))
            s = np.arange(n - 1)
            ei = np.stack([np.concatenate([s, s + 1]),
                           np.concatenate([s + 1, s])])
            y = (rng.choice(labels, n) if labels is not None
                 else rng.integers(0, 21, n))
            # genuine tuple order: (x, edge_attr, edge_index, y)
            records.append((torch.tensor(rng.random((n, 14)), dtype=torch.float),
                            torch.tensor(rng.random((ei.shape[1], 2)),
                                         dtype=torch.float),
                            torch.tensor(ei),
                            torch.tensor(np.asarray(y))))
        with open(os.path.join(raw, f"{split}.pickle"), "wb") as f:
            pickle.dump(records, f)


def test_voc_superpixels(cfg):
    from graphgps_tpu.data.datasets.real import load_superpixels

    _write_lrgb(cfg.dataset.dir, "VOCSuperpixels", compactness=30)
    cfg.dataset.format = "PyG-VOCSuperpixels"
    cfg.dataset.name = "edge_wt_only_coord"
    cfg.dataset.slic_compactness = 30
    ds = load_superpixels(cfg)
    g = ds.train[0]
    # tuple order honored: 14-dim float x, 2-dim edge_attr, node labels
    assert g.node_feat.shape[1] == 14 and g.node_feat.dtype == np.float32
    assert g.edge_feat.shape == (g.num_edges, 2)
    assert g.y.shape == (g.num_nodes,) and g.y.max() < 21


def test_coco_label_remap(cfg):
    from graphgps_tpu.data.datasets.io_formats import COCO_ORIGINAL_LABELS
    from graphgps_tpu.data.datasets.real import load_superpixels

    _write_lrgb(cfg.dataset.dir, "COCOSuperpixels",
                labels=np.array(COCO_ORIGINAL_LABELS))
    cfg.dataset.format = "PyG-COCOSuperpixels"
    cfg.dataset.name = "edge_wt_only_coord"
    cfg.dataset.slic_compactness = 30
    ds = load_superpixels(cfg)
    ys = np.concatenate([g.y for g in ds.all_graphs])
    assert ys.min() >= 0 and ys.max() <= 80  # remapped to contiguous 0..80


# ---------------------------------------------------------------------------
# AQSOL pickles
# ---------------------------------------------------------------------------

def test_aqsol_raw(cfg):
    from graphgps_tpu.data.datasets.more_real import aqsol

    raw = os.path.join(cfg.dataset.dir, "AQSOL", "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(4)
    for split, count in (("train", 5), ("val", 2), ("test", 2)):
        records = []
        for i in range(count):
            n = int(rng.integers(4, 9))
            s = np.arange(n - 1)
            ei = np.stack([np.concatenate([s, s + 1]),
                           np.concatenate([s + 1, s])])
            records.append((rng.integers(0, 65, n), rng.integers(0, 5, ei.shape[1]),
                            ei, float(i)))
        if split == "train":  # the two upstream defects the loader must skip
            records.append((np.array([1, 2]), np.array([], np.int64),
                            np.zeros((2, 0), np.int64), 1.0))  # no edges
            records.append((np.array([1, 2, 3, 4]), np.array([0]),
                            np.array([[0], [1]]), 1.0))  # node-count mismatch
        with open(os.path.join(raw, f"{split}.pickle"), "wb") as f:
            pickle.dump(records, f)
    cfg.dataset.format, cfg.dataset.name = "PyG-AQSOL", "none"
    ds = aqsol(cfg)
    assert len(ds.train) == 5  # defective graphs skipped
    g = ds.train[2]
    assert g.node_feat.shape == (g.num_nodes, 1)
    assert g.edge_feat.shape == (g.num_edges, 1)
    assert float(g.y[0]) == 2.0
    assert ds.meta["num_node_types"] == 65


# ---------------------------------------------------------------------------
# MalNetTiny edgelists
# ---------------------------------------------------------------------------

def test_malnet_raw(cfg):
    from graphgps_tpu.data.datasets.io_formats import MALNET_TYPES
    from graphgps_tpu.data.datasets.more_real import malnet_tiny

    base = os.path.join(cfg.dataset.dir, "MalNetTiny", "raw")
    rng = np.random.default_rng(5)
    names = {"train": [], "val": [], "test": []}
    count = 0
    for mtype in MALNET_TYPES:
        d = os.path.join(base, "malnet-graphs-tiny", mtype, "fam0")
        os.makedirs(d)
        for i in range(3):
            gid = f"{mtype}{i}"
            # node ids with gaps — isolated nodes must be compacted away
            n = int(rng.integers(4, 8))
            lines = ["# header"] * 5 + [
                f"{2 * v} {2 * v + 2}" for v in range(n - 1)]
            with open(os.path.join(d, f"{gid}.edgelist"), "w") as f:
                f.write("\n".join(lines) + "\n")
            split = ("train", "val", "test")[count % 3]
            names[split].append(f"{mtype}/fam0/{gid}")
            count += 1
    sd = os.path.join(base, "split_info_tiny", "type")
    os.makedirs(sd)
    for split in ("train", "val", "test"):
        with open(os.path.join(sd, f"{split}.txt"), "w") as f:
            f.write("\n".join(names[split]) + "\n")

    cfg.dataset.format, cfg.dataset.name = "PyG-MalNetTiny", "LocalDegreeProfile"
    ds = malnet_tiny(cfg)
    assert len(ds.train) + len(ds.val) + len(ds.test) == 15
    g = ds.train[0]
    assert g.node_feat.shape[1] == 5  # LDP features
    # gap node-ids were compacted: edges reference 0..n-1 densely
    assert set(np.unique(g.edge_index)) == set(range(g.num_nodes))
    assert 0 <= int(g.y[0]) < 5

    cfg.dataset.name = "OneHotDegree"
    ds2 = malnet_tiny(cfg)
    g2 = ds2.train[0]
    assert np.allclose(g2.node_feat.sum(axis=1), 1.0)  # one-hot rows


# ---------------------------------------------------------------------------
# TUDataset text layout
# ---------------------------------------------------------------------------

def test_tudataset_raw(cfg):
    from graphgps_tpu.data.datasets.more_real import tu_dataset

    d = os.path.join(cfg.dataset.dir, "NCI1", "raw")
    os.makedirs(d)
    # 3 graphs of 3 nodes each, chain edges, 1-indexed global ids
    A, gi, gl, nl = [], [], [], []
    for g in range(3):
        base = 3 * g
        for v in range(2):
            A.append((base + v + 1, base + v + 2))
            A.append((base + v + 2, base + v + 1))
        gi += [g + 1] * 3
        gl.append(7 if g % 2 else 3)  # non-contiguous class labels
        nl += [g % 2, 1, 0]
    with open(os.path.join(d, "NCI1_A.txt"), "w") as f:
        f.write("\n".join(f"{a}, {b}" for a, b in A) + "\n")
    with open(os.path.join(d, "NCI1_graph_indicator.txt"), "w") as f:
        f.write("\n".join(map(str, gi)) + "\n")
    with open(os.path.join(d, "NCI1_graph_labels.txt"), "w") as f:
        f.write("\n".join(map(str, gl)) + "\n")
    with open(os.path.join(d, "NCI1_node_labels.txt"), "w") as f:
        f.write("\n".join(map(str, nl)) + "\n")

    cfg.dataset.format, cfg.dataset.name = "PyG-TUDataset", "NCI1"
    ds = tu_dataset(cfg)
    graphs = ds.all_graphs
    assert len(graphs) == 3
    g1 = graphs[1]
    assert g1.num_nodes == 3 and g1.num_edges == 4
    assert g1.edge_index.max() == 2  # per-graph 0-indexed
    ys = sorted(int(g.y[0]) for g in graphs)
    assert ys == [0, 0, 1]  # classes made contiguous
    assert np.array_equal(graphs[1].node_feat.ravel(), [1, 1, 0])


# ---------------------------------------------------------------------------
# PCQM4Mv2 official split modes
# ---------------------------------------------------------------------------

def _write_pcqm(root, n_train=30, n_valid=6, n_heldout=4):
    d = os.path.join(root, "pcqm4m-v2")
    os.makedirs(d)
    rng = np.random.default_rng(6)
    total = n_train + n_valid + 2 * n_heldout
    graphs = []
    for i in range(total):
        n = int(rng.integers(4, 9))
        s = np.arange(n - 1)
        ei = np.stack([np.concatenate([s, s + 1]), np.concatenate([s + 1, s])])
        labeled = i < n_train + n_valid
        graphs.append(dict(
            x=rng.integers(0, 9, (n, 9)), edge_index=ei,
            edge_attr=rng.integers(0, 3, (ei.shape[1], 3)),
            y=np.array([float(i) if labeled else np.nan], np.float32)))
    split = {
        "train": np.arange(n_train),
        "valid": np.arange(n_train, n_train + n_valid),
        "test-dev": np.arange(n_train + n_valid, n_train + n_valid + n_heldout),
        "test-challenge": np.arange(n_train + n_valid + n_heldout, total),
    }
    np.savez(os.path.join(d, "processed.npz"),
             graphs=np.array(graphs, dtype=object),
             split=np.array({}, dtype=object))  # force split_dict.pt usage
    torch.save({k: torch.tensor(v) for k, v in split.items()},
               os.path.join(d, "split_dict.pt"))
    return split


def test_pcqm4mv2_split_modes(cfg, monkeypatch):
    import graphgps_tpu.data.datasets.real as real

    official = _write_pcqm(cfg.dataset.dir)
    monkeypatch.setattr(real, "PCQM_CUSTOM_VALID", 10)
    monkeypatch.setattr(real, "PCQM_SUBSET_VALID", 5)
    cfg.dataset.format = "OGB"

    cfg.dataset.name = "PCQM4Mv2-full"
    full = real.load_ogb(cfg)
    assert [len(full.train), len(full.val), len(full.test)] == [20, 10, 6]
    # custom valid is carved from official train → labels are train indices
    assert all(int(g.y[0]) < 30 for g in full.val)
    # test = official valid
    assert sorted(int(g.y[0]) for g in full.test) == list(
        official["valid"].tolist())
    # seeded permutation → deterministic across loads
    again = real.load_ogb(cfg)
    assert [float(g.y[0]) for g in again.val] == [float(g.y[0]) for g in full.val]

    cfg.dataset.name = "PCQM4Mv2-subset"
    sub = real.load_ogb(cfg)
    assert [len(sub.train), len(sub.val), len(sub.test)] == [2, 5, 6]
    assert [float(g.y[0]) for g in sub.train] == \
        [float(g.y[0]) for g in full.train[:2]]

    cfg.dataset.name = "PCQM4Mv2-inference"
    inf = real.load_ogb(cfg)
    assert [len(inf.train), len(inf.val), len(inf.test)] == [6, 4, 4]
    assert all(not np.isnan(g.y[0]) for g in inf.train)
    assert all(np.isnan(g.y[0]) for g in inf.val + inf.test)


def test_pcqm4mv2_inference_rejects_labeled_heldout(cfg, monkeypatch):
    import graphgps_tpu.data.datasets.real as real

    _write_pcqm(cfg.dataset.dir)
    # corrupt: give a held-out graph a label → NaN assertion must fire
    d = os.path.join(cfg.dataset.dir, "pcqm4m-v2")
    z = np.load(os.path.join(d, "processed.npz"), allow_pickle=True)
    graphs = list(z["graphs"])
    graphs[-1] = dict(graphs[-1], y=np.array([1.0], np.float32))
    np.savez(os.path.join(d, "processed.npz"),
             graphs=np.array(graphs, dtype=object), split=z["split"])
    monkeypatch.setattr(real, "PCQM_CUSTOM_VALID", 10)
    cfg.dataset.format, cfg.dataset.name = "OGB", "PCQM4Mv2-inference"
    with pytest.raises(AssertionError):
        real.load_ogb(cfg)


# ---------------------------------------------------------------------------
# PCQM4Mv2Contact negative sampling
# ---------------------------------------------------------------------------

def _contact_graph():
    from graphgps_tpu.data.graph import Graph

    n = 8
    s = np.arange(n - 1)
    ei = np.stack([np.concatenate([s, s + 1]), np.concatenate([s + 1, s])])
    g = Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei)
    g.extras["edge_label_index"] = np.array([[0, 2], [5, 7]], np.int64)
    g.extras["edge_label"] = np.ones(2, np.float32)
    return g


def test_contact_structured_neg_sampling():
    from graphgps_tpu.data.datasets.more_real import (
        structured_neg_sampling_transform)

    g = _contact_graph()
    structured_neg_sampling_transform(g, np.random.default_rng(0))
    eli, lab = g.extras["edge_label_index"], g.extras["edge_label"]
    mask = g.extras["edge_label_mask"]
    assert lab[:2].tolist() == [1, 1] and mask[:2].all()
    # fixed-size negative block: 2 per positive head (static shapes)
    assert eli.shape == (2, 2 + 4) and lab.shape == (6,)
    neg = eli[:, lab == 0]
    # negatives share heads with positives; collision pairs are mask-invalid
    assert set(neg[0].tolist()) <= {0, 2}
    pos_pairs = {(0, 5), (2, 7)}
    valid_neg = eli[:, 2:][:, mask[2:]]
    assert all(tuple(p) not in pos_pairs for p in valid_neg.T.tolist())


def test_contact_resample_negative_per_epoch(tmp_path):
    """dataset.resample_negative redraws negatives every epoch with STATIC
    shapes (reference transform-on-access, master_loader.py:486-487)."""
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.driver import create_loaders

    cfg = new_cfg()
    cfg.dataset.format = "OGB"
    cfg.dataset.name = "PCQM4Mv2Contact-shuffle"
    cfg.dataset.synth_num_graphs = 12
    cfg.dataset.resample_negative = True
    cfg.train.batch_size = 4
    splits = load_dataset(cfg)
    loaders = create_loaders(cfg, splits)
    tr = loaders["train"]
    b1 = [hb for hb in tr]
    neg1 = np.asarray(b1[0].extras["edge_label_index"]).copy()
    shape1 = {k: np.asarray(v).shape for k, v in b1[0].extras.items()}
    b2 = [hb for hb in tr]
    neg2 = np.asarray(b2[0].extras["edge_label_index"])
    shape2 = {k: np.asarray(v).shape for k, v in b2[0].extras.items()}
    assert shape1 == shape2            # no recompile across epochs
    assert (neg1 != neg2).any()        # negatives actually redrawn
    # val split keeps fixed negatives (evaluation stability)
    v1 = np.asarray(next(iter(loaders["val"])).extras["edge_label_index"])
    v2 = np.asarray(next(iter(loaders["val"])).extras["edge_label_index"])
    assert (v1 == v2).all()


def test_contact_complete_neg():
    from graphgps_tpu.data.datasets.more_real import complete_neg_transform

    g = _contact_graph()
    complete_neg_transform(g)
    lab = g.extras["edge_label"]
    n = g.num_nodes
    assert lab.shape[0] == n * n - n  # V²−V labeled pairs
    assert int(lab.sum()) == 2


# ---------------------------------------------------------------------------
# End-to-end: pattern-GPS.yaml trains on fixture PATTERN data (no fallback)
# ---------------------------------------------------------------------------

def test_pattern_config_trains_on_fixture(tmp_path):
    import json

    from graphgps_tpu.driver import main

    _write_gnnbench_pt(str(tmp_path), "PATTERN", node_level=True)
    main(["--cfg", "configs/GPS/pattern-GPS.yaml",
          "out_dir", str(tmp_path / "out"),
          "dataset.dir", str(tmp_path),
          "dataset.synthetic_fallback", "False",
          "train.enable_ckpt", "False",
          "train.batch_size", "4",
          "gt.layers", "1", "gt.dim_hidden", "16", "gt.n_heads", "2",
          "gnn.dim_inner", "16", "gnn.layers_post_mp", "1",
          "posenc_LapPE.dim_pe", "4", "posenc_LapPE.eigen.max_freqs", "4",
          "optim.max_epoch", "2", "optim.num_warmup_epochs", "1"])
    stats = tmp_path / "out" / "pattern-GPS" / "0" / "val" / "stats.json"
    rows = [json.loads(l) for l in stats.read_text().splitlines()]
    # weighted CE + SBM accuracy are the PATTERN metrics
    assert "accuracy-SBM" in rows[-1]
    assert np.isfinite(rows[-1]["loss"])


def test_csl_raw(cfg):
    """CSL: pickled scipy adjacency list + torch label tensor (PyG
    GNNBenchmarkDataset CSL branch)."""
    import scipy.sparse as sp

    from graphgps_tpu.data.datasets.real import load_gnn_benchmark

    d = os.path.join(cfg.dataset.dir, "GNNBenchmarkDataset", "CSL", "raw")
    os.makedirs(d)
    rng = np.random.default_rng(7)
    adjs, ys = [], []
    for i in range(10):
        n = 8
        ring = sp.coo_matrix(
            (np.ones(2 * n), (np.r_[np.arange(n), (np.arange(n) + 1) % n],
                              np.r_[(np.arange(n) + 1) % n, np.arange(n)])),
            shape=(n, n))
        adjs.append(ring)
        ys.append(i % 5)
    with open(os.path.join(d, "graphs_Kary_Deterministic_Graphs.pkl"),
              "wb") as f:
        pickle.dump(adjs, f)
    torch.save(torch.tensor(ys), os.path.join(
        d, "y_Kary_Deterministic_Graphs.pt"))

    cfg.dataset.format, cfg.dataset.name = "PyG-GNNBenchmarkDataset", "CSL"
    ds = load_gnn_benchmark(cfg)
    assert len(ds.all_graphs) == 10
    g = ds.train[0]
    assert g.num_nodes == 8 and g.num_edges == 16
    assert g.node_feat.shape == (8, 1)  # featureless zero column
    assert 0 <= int(g.y[0]) < 5


def test_ogbl_raw(cfg):
    """ogbl-* link prediction: one big graph + per-split labeled edge sets
    from torch .pt split files (reference master_loader.py:163-175)."""
    from graphgps_tpu.data.datasets.real import load_ogb

    base = os.path.join(cfg.dataset.dir, "ogbl_collab")
    raw = os.path.join(base, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(9)
    n, e = 30, 80
    edges = rng.integers(0, n, size=(e, 2))
    _csv_gz(os.path.join(raw, "edge.csv.gz"), edges)
    _csv_gz(os.path.join(raw, "num-node-list.csv.gz"), [n])
    _csv_gz(os.path.join(raw, "node-feat.csv.gz"),
            np.round(rng.random((n, 4)), 3))
    sd = os.path.join(base, "split", "time")
    os.makedirs(sd)
    for split, fname, with_neg in (("train", "train.pt", False),
                                   ("valid", "valid.pt", True),
                                   ("test", "test.pt", True)):
        d = {"edge": rng.integers(0, n, size=(12, 2))}
        if with_neg:
            d["edge_neg"] = rng.integers(0, n, size=(12, 2))
        torch.save(d, os.path.join(sd, fname))

    cfg.dataset.format, cfg.dataset.name = "OGB", "ogbl-collab"
    ds = load_ogb(cfg)
    g_tr, g_va = ds.train[0], ds.val[0]
    assert g_tr.num_nodes == n and g_tr.num_edges == 2 * e
    assert g_tr.node_feat.shape == (n, 4)
    # val carries official negatives; labels are INT (reference convert_to_int)
    assert g_va.extras["edge_label"].dtype == np.int64
    assert (g_va.extras["edge_label"][:12] == 1).all()
    assert (g_va.extras["edge_label"][12:] == 0).all()
    # train negatives sampled, int labels, validity mask present
    assert g_tr.extras["edge_label"].dtype == np.int64
    assert "edge_label_mask" in g_tr.extras


# ---------------------------------------------------------------------------
# LRGB Peptides raw SMILES table (reference peptides_functional.py:91-116)
# ---------------------------------------------------------------------------

_PEPTIDE_SMILES = [
    "C[C@H](N)C(=O)O",                       # alanine
    "N[C@@H](Cc1ccccc1)C(=O)O",              # phenylalanine
    "NCC(=O)N[C@@H](CO)C(=O)[O-]",           # gly-ser anion
    "OC(=O)[C@@H]1CCCN1",                    # proline
    "C[C@H](N)C(=O)N[C@@H](Cc1ccccc1)C(=O)O",  # Ala-Phe dipeptide
    "NC(=[NH2+])NCCC[C@H](N)C(=O)O",         # arginine (guanidinium)
]


def _write_peptides_raw(root, kind):
    import gzip as _gz
    folder, csv_name, split_name = {
        "functional": ("peptides-functional",
                       "peptide_multi_class_dataset.csv.gz",
                       "splits_random_stratified_peptide.pickle"),
        "structural": ("peptides-structural",
                       "peptide_structure_normalized_dataset.csv.gz",
                       "splits_random_stratified_peptide_structure.pickle"),
    }[kind]
    base = os.path.join(root, folder)
    os.makedirs(os.path.join(base, "raw"))
    rng = np.random.default_rng(3)
    if kind == "functional":
        header = "smiles,labels,peptide_seq\n"
        rows = [f'"{s}","{[int(v) for v in rng.random(10) > .5]}",SEQ\n'
                for s in _PEPTIDE_SMILES]
    else:
        cols = ["Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
                "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
                "length_a", "length_b", "length_c", "Spherocity",
                "Plane_best_fit"]
        header = "smiles," + ",".join(cols) + "\n"
        rows = [f'"{s}",' + ",".join(f"{v:.4f}" for v in rng.normal(size=11))
                + "\n" for s in _PEPTIDE_SMILES]
    with _gz.open(os.path.join(base, "raw", csv_name), "wt") as f:
        f.write(header)
        f.writelines(rows)
    split = {"train": np.array([0, 1, 2, 3]), "val": np.array([4]),
             "test": np.array([5])}
    with open(os.path.join(base, split_name), "wb") as f:
        pickle.dump(split, f)


@pytest.mark.parametrize("kind,fmt_name,ydim", [
    ("functional", "peptides-functional", 10),
    ("structural", "peptides-structural", 11),
])
def test_peptides_raw_smiles(cfg, kind, fmt_name, ydim):
    from graphgps_tpu.data.datasets.base import load_dataset

    _write_peptides_raw(cfg.dataset.dir, kind)
    cfg.dataset.format, cfg.dataset.name = "OGB", fmt_name
    ds = load_dataset(cfg)
    assert [len(ds.train), len(ds.val), len(ds.test)] == [4, 1, 1]
    g = ds.train[0]                       # alanine: 6 heavy atoms, 5 bonds
    assert g.node_feat.shape == (6, 9) and g.edge_index.shape == (2, 10)
    assert g.edge_feat.shape == (10, 3)
    assert g.y.shape == (ydim,) and g.y.dtype == np.float32
    if kind == "functional":
        assert set(np.unique(g.y)) <= {0.0, 1.0}
    # phenylalanine: aromatic ring present, chiral center tagged
    g2 = ds.train[1]
    assert (g2.node_feat[:, 7] == 1).sum() == 6
    assert (g2.node_feat[:, 1] > 0).sum() == 1
    # parse is memoized next to the raw data like the reference's process()
    assert os.path.exists(os.path.join(
        cfg.dataset.dir, f"peptides-{kind}", "processed_graphgps_tpu.npz"))
    ds2 = load_dataset(cfg)               # second load comes from the cache
    np.testing.assert_array_equal(ds2.train[0].node_feat, g.node_feat)
    np.testing.assert_array_equal(ds2.train[0].y, g.y)


def test_pcqm4mv2_raw_smiles_csv(cfg):
    import gzip as _gz

    from graphgps_tpu.data.datasets.real import _load_pcqm4mv2

    base = os.path.join(cfg.dataset.dir, "pcqm4m-v2")
    os.makedirs(os.path.join(base, "raw"))
    n = 24
    rng = np.random.default_rng(5)
    smis = [_PEPTIDE_SMILES[i % len(_PEPTIDE_SMILES)] for i in range(n)]
    with _gz.open(os.path.join(base, "raw", "data.csv.gz"), "wt") as f:
        f.write("idx,smiles,homolumogap\n")
        for i, s in enumerate(smis):
            gap = "" if i >= n - 4 else f"{rng.random():.4f}"  # held-out NaN
            f.write(f'{i},"{s}",{gap}\n')
    split = {"train": torch.arange(0, 16), "valid": torch.arange(16, 20),
             "test-dev": torch.arange(20, 22),
             "test-challenge": torch.arange(22, 24)}
    torch.save(split, os.path.join(base, "split_dict.pt"))

    import graphgps_tpu.data.datasets.real as real_mod
    old = real_mod.PCQM_CUSTOM_VALID
    real_mod.PCQM_CUSTOM_VALID = 4
    try:
        ds = _load_pcqm4mv2(cfg, "full")
        assert len(ds.train) == 12 and len(ds.val) == 4 and len(ds.test) == 4
        assert all(np.isfinite(g.y).all() for g in ds.train)
        ds_inf = _load_pcqm4mv2(cfg, "inference")
        assert all(np.isnan(g.y[0]) for g in ds_inf.val + ds_inf.test)
    finally:
        real_mod.PCQM_CUSTOM_VALID = old


def test_peptides_func_config_trains_on_raw_smiles(tmp_path):
    """The real peptides-func-GPS recipe (Atom+LapPE encoders, multilabel BCE,
    AP metric) trains end-to-end on graphs built by the pure-Python SMILES
    parser — the full raw→featurize→PE-precompute→train path with no rdkit."""
    import json

    from graphgps_tpu.driver import main

    _write_peptides_raw(str(tmp_path), "functional")
    main(["--cfg", "configs/GPS/peptides-func-GPS.yaml",
          "out_dir", str(tmp_path / "out"),
          "dataset.dir", str(tmp_path),
          "dataset.synthetic_fallback", "False",
          "train.enable_ckpt", "False",
          "train.batch_size", "2",
          "gt.layers", "1", "gt.dim_hidden", "16", "gt.n_heads", "2",
          "gnn.dim_inner", "16", "gnn.layers_post_mp", "1",
          "posenc_LapPE.dim_pe", "4", "posenc_LapPE.eigen.max_freqs", "4",
          "optim.max_epoch", "2", "optim.num_warmup_epochs", "1"])
    stats = tmp_path / "out" / "peptides-func-GPS" / "0" / "val" / "stats.json"
    rows = [json.loads(l) for l in stats.read_text().splitlines()]
    assert "ap" in rows[-1] and np.isfinite(rows[-1]["loss"])
