"""In-memory graph transforms.

Capability parity with /root/reference/graphgps/transform/transforms.py:8-81 and
task_preprocessing.py:9-65, operating on host-side numpy ``Graph`` records.
"""
from __future__ import annotations

from typing import List

import numpy as np

from .graph import Graph


def typecast_x(g: Graph, dtype) -> Graph:
    g.node_feat = g.node_feat.astype(dtype)
    return g


def concat_x_and_pos(g: Graph, pos: np.ndarray) -> Graph:
    g.node_feat = np.concatenate([g.node_feat, pos], axis=1)
    return g


def clip_graph_to_size(g: Graph, size_limit: int = 5000) -> Graph:
    """Keep only the first ``size_limit`` nodes and their induced subgraph
    (reference transforms.py:54-81, used for ogbg-code2)."""
    if g.num_nodes <= size_limit:
        return g
    keep = np.zeros(g.num_nodes, dtype=bool)
    keep[:size_limit] = True
    s, r = g.edge_index
    emask = keep[s] & keep[r]
    g.edge_index = g.edge_index[:, emask]
    if g.edge_feat is not None:
        g.edge_feat = g.edge_feat[emask]
    g.node_feat = g.node_feat[:size_limit]
    if g.y is not None and g.y.shape[:1] == (keep.shape[0],):
        g.y = g.y[:size_limit]
    for k in list(g.pe):
        g.pe[k] = g.pe[k][:size_limit]
    return g


def add_self_loops(g: Graph) -> Graph:
    n = g.num_nodes
    loops = np.stack([np.arange(n), np.arange(n)])
    g.edge_index = np.concatenate([g.edge_index, loops], axis=1)
    if g.edge_feat is not None:
        pad = np.zeros((n, *g.edge_feat.shape[1:]), dtype=g.edge_feat.dtype)
        g.edge_feat = np.concatenate([g.edge_feat, pad], axis=0)
    return g


def to_undirected(g: Graph) -> Graph:
    s, r = g.edge_index
    both = np.concatenate([g.edge_index, np.stack([r, s])], axis=1)
    # dedupe
    key = both[0].astype(np.int64) * (both.max() + 1) + both[1]
    _, idx = np.unique(key, return_index=True)
    g.edge_index = both[:, np.sort(idx)]
    if g.edge_feat is not None:
        ef = np.concatenate([g.edge_feat, g.edge_feat], axis=0)
        g.edge_feat = ef[np.sort(idx)]
    return g


def infer_links(g: Graph, label_mode: str = "",
                seed: int = 0) -> Graph:
    """Link-inference probe construction (reference
    task_preprocessing.py:19-42).

    With ``label_mode == 'edge'`` builds the reference's BALANCED pair set:
    every real edge (label 1) plus an equal number of shuffled non-edge pairs
    (label 0), stored as ``complete_edge_index`` with per-pair targets in
    ``g.y``; otherwise the plain all-pairs index."""
    n = g.num_nodes
    a, b = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    if label_mode == "edge":
        adj = np.zeros((n, n), bool)
        adj[g.edge_index[0], g.edge_index[1]] = True
        pos = np.stack(np.nonzero(adj))
        neg_all = np.stack(np.nonzero(~adj))
        rng = np.random.default_rng(seed)
        pick = rng.permutation(neg_all.shape[1])[: pos.shape[1]]
        neg = neg_all[:, pick]
        pairs = np.concatenate([pos, neg], axis=1)
        labels = np.concatenate([np.ones(pos.shape[1], np.int64),
                                 np.zeros(neg.shape[1], np.int64)])
        order = rng.permutation(pairs.shape[1])
        g.extras["complete_edge_index"] = pairs[:, order]
        g.y = labels[order]
        g.edge_feat = None  # reference drops edge_attr for this probe task
    else:
        off = a != b
        g.extras["complete_edge_index"] = np.stack([a[off], b[off]])
    return g


def task_specific_preprocessing(g: Graph, cfg) -> Graph:
    """Reference task_preprocessing.py:9-65: infer-links probe construction
    plus the TRIANGLES / CSL featureless-dataset stubs."""
    if cfg.gnn.head == "infer_links" or \
            cfg.dataset.infer_link_label not in ("none", ""):
        infer_links(g, cfg.dataset.infer_link_label, seed=cfg.seed)
    pe_available = (cfg.posenc_LapPE.enable or cfg.posenc_RWSE.enable
                    or cfg.posenc_GraphormerBias.enable)
    if cfg.dataset.name == "TRIANGLES":
        if not pe_available:
            g.node_feat = np.zeros((g.num_nodes, 1), np.float32)
        if g.y is not None:
            g.y = (np.asarray(g.y) - 1).astype(np.int64)  # 1-based → 0-based
    if cfg.dataset.name == "CSL":
        # featureless: zero column; enabled PEs append to it
        g.node_feat = np.zeros((g.num_nodes, 1), np.float32)
    return g
