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


def infer_links(g: Graph) -> Graph:
    """Build the complete edge index for link-inference probes
    (reference task_preprocessing.py:9-65)."""
    n = g.num_nodes
    a, b = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    off = a != b
    g.extras["complete_edge_index"] = np.stack([a[off], b[off]])
    return g


def task_specific_preprocessing(g: Graph, cfg) -> Graph:
    if cfg.dataset.infer_link_label not in ("none", ""):
        infer_links(g)
    return g
