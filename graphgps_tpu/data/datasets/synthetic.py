"""Deterministic synthetic graph datasets for hermetic (no-egress) runs.

Each generator matches the size/feature statistics of a real benchmark family so
the full pipeline — collation, PE precompute, model, train loop, metrics — runs
end-to-end without network access. Labels are smooth functions of graph structure
so models can actually learn (loss decreases), making these useful for integration
tests and throughput benchmarks.

Statistics mirrored: ZINC subset ≤37 nodes, 28 node / 4 edge types, graph
regression (reference master_loader.py:547-563); molpcba-like multilabel; a
node-classification family shaped like PascalVOC-SP (≤500 nodes, 21 classes,
14-dim float features; reference voc_superpixels.py).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ...registry import register_dataset
from ..graph import Graph
from .base import DatasetSplits


def _random_molecule(rng: np.random.Generator, n_min: int, n_max: int,
                     num_node_types: int, num_edge_types: int) -> Graph:
    n = int(rng.integers(n_min, n_max + 1))
    # random spanning tree + a few extra cycle edges — molecule-like sparsity
    senders, receivers = [], []
    for v in range(1, n):
        u = int(rng.integers(0, v))
        senders += [u, v]
        receivers += [v, u]
    n_extra = int(rng.integers(0, max(1, n // 8) + 1))
    for _ in range(n_extra):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            senders += [int(u), int(v)]
            receivers += [int(v), int(u)]
    ei = np.stack([np.array(senders, dtype=np.int64),
                   np.array(receivers, dtype=np.int64)])
    x = rng.integers(0, num_node_types, size=(n, 1)).astype(np.int64)
    e = rng.integers(0, num_edge_types, size=(ei.shape[1], 1)).astype(np.int64)
    return Graph(node_feat=x, edge_index=ei, edge_feat=e)


def _graph_label(g: Graph, num_node_types: int, rng: np.random.Generator,
                 w: np.ndarray) -> float:
    """Smooth structure+feature-dependent scalar target (learnable, deterministic)."""
    n = g.num_nodes
    deg = np.zeros(n)
    np.add.at(deg, g.edge_index[1], 1)
    type_hist = np.bincount(g.node_feat[:, 0], minlength=num_node_types) / max(n, 1)
    feats = np.concatenate([[n / 40.0, g.num_edges / (2.0 * max(n, 1)),
                             deg.mean() / 4.0, deg.std() / 2.0], type_hist])
    return float(np.tanh(feats @ w[:feats.shape[0]]) * 2.0)


def _split(graphs: List[Graph], frac=(0.8, 0.1, 0.1)) -> DatasetSplits:
    n = len(graphs)
    a = int(n * frac[0])
    b = a + int(n * frac[1])
    return DatasetSplits(train=graphs[:a], val=graphs[a:b], test=graphs[b:])


@register_dataset("synthetic")
@register_dataset("synthetic-zinc-like")
def zinc_like(cfg) -> DatasetSplits:
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    n_types, e_types = d.node_encoder_num_types, d.edge_encoder_num_types
    w = rng.normal(size=(4 + n_types,))
    graphs = []
    for _ in range(d.synth_num_graphs):
        g = _random_molecule(rng, d.synth_min_nodes, d.synth_max_nodes, n_types, e_types)
        if d.task_type == "regression":
            tasks = max(1, d.synth_num_tasks)
            y = np.array([_graph_label(g, n_types, rng, np.roll(w, t))
                          for t in range(tasks)], dtype=np.float32)
            g.y = y if tasks > 1 else y[:1]
        elif d.task_type == "classification_multilabel":
            t = max(1, d.synth_num_tasks)
            scores = np.array([_graph_label(g, n_types, rng, np.roll(w, k))
                               for k in range(t)])
            y = (scores > 0).astype(np.float32)
            # sprinkle NaN targets like ogbg-molpcba
            nan_mask = rng.random(t) < 0.1
            y[nan_mask] = np.nan
            g.y = y
        else:  # classification (graph-level)
            score = _graph_label(g, n_types, rng, w)
            n_classes = max(2, d.synth_num_tasks)
            g.y = np.array([int(abs(score * 7)) % n_classes], dtype=np.int64)
        graphs.append(g)
    meta = dict(num_node_types=n_types, num_edge_types=e_types)
    return _split(graphs, d.split if len(d.split) == 3 else (0.8, 0.1, 0.1))


@register_dataset("synthetic-voc-like")
def voc_like(cfg) -> DatasetSplits:
    """Node-classification graphs shaped like PascalVOC-SP (float features)."""
    d = cfg.dataset
    rng = np.random.default_rng(d.synth_seed)
    num_classes = max(2, d.synth_num_tasks)
    graphs = []
    for _ in range(d.synth_num_graphs):
        n = int(rng.integers(d.synth_min_nodes, d.synth_max_nodes + 1))
        x = rng.normal(size=(n, 14)).astype(np.float32)
        # 8-nn-like ring + random chords
        s = np.arange(n)
        r = (s + 1) % n
        ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
        e = rng.normal(size=(ei.shape[1], 2)).astype(np.float32)
        y = (np.abs(x @ rng.normal(size=(14,))) * 3).astype(np.int64) % num_classes
        graphs.append(Graph(node_feat=x, edge_index=ei, edge_feat=e, y=y))
    return _split(graphs)
