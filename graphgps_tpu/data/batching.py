"""Host-side collation of ``Graph`` lists into static-shape ``GraphBatch`` pytrees.

Replaces the reference's PyTorch DataLoader + PyG Batch collation (driven from
/root/reference/main.py:142 via GraphGym ``create_loader``). TPU-first differences:
every batch has identical static shapes ``(B, Nmax, Emax)`` chosen per dataset
(bucketed to avoid XLA recompilation storms — SURVEY.md §7.3.1); partial final
batches are padded with empty graphs (``graph_mask`` False); edges are sorted by
receiver for CSR-friendly aggregation kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .graph import Graph, GraphBatch


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


# extras whose axes scale with the graph's node count and must pad to the
# batch node cap (everything else pads to the per-key batch maximum)
# Known node-shaped extras → WHICH axes are node-sized (pad to Nmax). An
# equality heuristic against num_nodes misfires when an unrelated axis (e.g.
# shortest_path_types' hop axis = num_spatial_types, or EigVals' max_freqs)
# happens to equal a graph's node count — explicit axes are unambiguous.
NODE_SIZED_AXES = {
    "spatial_types": (0, 1),          # (N, N)
    "attn_bias": (1, 2),              # (H, N, N)
    "shortest_path_types": (0, 1),    # (N, N, num_spatial_types)
    "split_mask": (0,),               # (N,)
}
NODE_SIZED_EXTRAS = frozenset(NODE_SIZED_AXES)


def extras_pad_shape(key: str, v: "np.ndarray", per_dim_max, Nmax: int):
    """Padded per-graph shape for one extras entry: node-sized axes → Nmax,
    the rest → the batch maximum (``per_dim_max(d)``)."""
    node_axes = NODE_SIZED_AXES.get(key, ())
    return [Nmax if d in node_axes else per_dim_max(d)
            for d in range(v.ndim)]


def choose_caps(graphs: Sequence[Graph], node_multiple: int = 8,
                edge_multiple: int = 32) -> tuple:
    """Pick static (max_nodes, max_edges-per-graph) caps for a dataset.

    Rounds the dataset maxima up to hardware-friendly multiples so all batches
    from this dataset compile once. Large node caps are lane-aligned to 128 so
    the Pallas flash-attention path can engage (requires N % 128 == 0) — this
    policy lives HERE so every loader gets it, not just the driver (round 3:
    the VOC bench silently ran dense XLA attention at N=504).
    """
    max_n = max((g.num_nodes for g in graphs), default=1)
    max_e = max((g.num_edges for g in graphs), default=1)
    n_cap = round_up(max(max_n, 1), node_multiple)
    if n_cap >= 256:
        n_cap = round_up(n_cap, 128)
    return n_cap, round_up(max(max_e, 1), edge_multiple)


@dataclasses.dataclass
class HostBatch:
    """Numpy mirror of GraphBatch (pre device-put)."""

    arrays: Dict[str, np.ndarray]
    pe: Dict[str, np.ndarray]
    extras: Dict[str, np.ndarray]
    num_graphs: int
    max_nodes: int

    def to_graph_batch(self) -> GraphBatch:
        import jax.numpy as jnp

        a = {k: (jnp.asarray(v) if v is not None else None) for k, v in self.arrays.items()}
        return GraphBatch(
            node_feat=a["node_feat"], edge_feat=a.get("edge_feat"),
            senders=a["senders"], receivers=a["receivers"],
            node_mask=a["node_mask"], edge_mask=a["edge_mask"],
            graph_mask=a["graph_mask"], y=a.get("y"),
            pe={k: jnp.asarray(v) for k, v in self.pe.items()},
            extras={k: jnp.asarray(v) for k, v in self.extras.items()},
            num_graphs=self.num_graphs, max_nodes=self.max_nodes,
        )


def collate(graphs: List[Graph], batch_size: int, max_nodes: int, max_edges: int,
            y_graph_level: bool = True) -> HostBatch:
    """Collate ≤batch_size graphs into one fixed-shape HostBatch.

    max_edges is the per-BATCH edge budget (flat edge list across all graphs).
    """
    B, Nmax = batch_size, max_nodes
    assert len(graphs) <= B
    g0 = graphs[0]
    fn_shape = g0.node_feat.shape[1:]
    node_dtype = g0.node_feat.dtype
    node_feat = np.zeros((B * Nmax, *fn_shape), dtype=node_dtype)
    node_mask = np.zeros((B * Nmax,), dtype=bool)
    graph_mask = np.zeros((B,), dtype=bool)
    senders = np.zeros((max_edges,), dtype=np.int32)
    receivers = np.zeros((max_edges,), dtype=np.int32)
    edge_mask = np.zeros((max_edges,), dtype=bool)
    edge_feat = None
    if g0.edge_feat is not None:
        edge_feat = np.zeros((max_edges, *g0.edge_feat.shape[1:]), dtype=g0.edge_feat.dtype)

    # y
    y = None
    if g0.y is not None:
        y_arr0 = np.atleast_1d(np.asarray(g0.y))
        if y_graph_level:
            y = np.zeros((B, *y_arr0.shape), dtype=np.result_type(y_arr0.dtype, np.float32)
                         if np.issubdtype(y_arr0.dtype, np.floating) else y_arr0.dtype)
            y[:] = np.nan if np.issubdtype(y.dtype, np.floating) else 0
        else:
            y = np.zeros((B * Nmax, *y_arr0.shape[1:]), dtype=y_arr0.dtype)

    # PE / extras: discover keys from first graph
    pe_out: Dict[str, np.ndarray] = {}
    for k, v in g0.pe.items():
        pe_out[k] = np.zeros((B * Nmax, *v.shape[1:]), dtype=v.dtype)
    extras_out: Dict[str, np.ndarray] = {}
    for k, v in g0.extras.items():
        shp = extras_pad_shape(
            k, v, lambda d: max(g.extras[k].shape[d] for g in graphs
                                if k in g.extras), Nmax)
        extras_out[k] = np.zeros((B, *shp), dtype=v.dtype)

    e_off = 0
    for i, g in enumerate(graphs):
        n, e = g.num_nodes, g.num_edges
        if n > Nmax:
            raise ValueError(f"graph has {n} nodes > max_nodes {Nmax}")
        if e_off + e > max_edges:
            raise ValueError(f"edge budget exceeded: {e_off + e} > {max_edges}")
        base = i * Nmax
        node_feat[base:base + n] = g.node_feat
        node_mask[base:base + n] = True
        graph_mask[i] = True
        senders[e_off:e_off + e] = g.edge_index[0] + base
        receivers[e_off:e_off + e] = g.edge_index[1] + base
        edge_mask[e_off:e_off + e] = True
        if edge_feat is not None and g.edge_feat is not None:
            edge_feat[e_off:e_off + e] = g.edge_feat
        if y is not None and g.y is not None:
            if y_graph_level:
                y[i] = np.atleast_1d(np.asarray(g.y))
            else:
                y[base:base + n] = np.asarray(g.y)
        for k, v in g.pe.items():
            pe_out[k][base:base + n] = v
        for k, v in g.extras.items():
            sl = tuple(slice(0, s) for s in v.shape)
            extras_out[k][(i, *sl)] = v
            if k == "edge_label":  # validity mask for padded label slots
                if "edge_label_mask" not in extras_out:
                    extras_out["edge_label_mask"] = np.zeros(
                        extras_out[k].shape[:2], dtype=bool)
                extras_out["edge_label_mask"][i, :v.shape[0]] = True
        e_off += e

    # Sort edges by receiver (stable) — padded edges (receiver 0, mask False) sort
    # first but are masked out of every aggregation.
    order = np.argsort(receivers, kind="stable")
    senders, receivers, edge_mask = senders[order], receivers[order], edge_mask[order]
    if edge_feat is not None:
        edge_feat = edge_feat[order]

    arrays = dict(node_feat=node_feat, edge_feat=edge_feat, senders=senders,
                  receivers=receivers, node_mask=node_mask, edge_mask=edge_mask,
                  graph_mask=graph_mask, y=y)
    return HostBatch(arrays=arrays, pe=pe_out, extras=extras_out,
                     num_graphs=B, max_nodes=Nmax)


class BatchLoader:
    """Deterministic epoch iterator yielding fixed-shape HostBatches.

    The analog of the reference's per-split DataLoader; shuffling is seeded
    per-epoch for reproducibility.
    """

    def __init__(self, graphs: Sequence[Graph], batch_size: int,
                 max_nodes: Optional[int] = None, max_edges: Optional[int] = None,
                 shuffle: bool = False, seed: int = 0, y_graph_level: bool = True,
                 drop_last: bool = False, epoch_transform=None):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        n_cap, e_cap = choose_caps(self.graphs)
        self.max_nodes = max_nodes or n_cap
        # default per-batch edge budget: batch_size * per-graph cap
        self.max_edges = max_edges or round_up(batch_size * e_cap, 128)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.y_graph_level = y_graph_level
        self.drop_last = drop_last
        # per-epoch in-place dataset transform (e.g. negative-edge resampling,
        # reference transform-on-access semantics): fn(graphs, epoch)
        self.epoch_transform = epoch_transform

    def __len__(self) -> int:
        n = len(self.graphs)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[HostBatch]:
        if self.epoch_transform is not None:
            self.epoch_transform(self.graphs, self.epoch)
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        self.epoch += 1
        B = self.batch_size
        stop = len(idx) - (len(idx) % B) if self.drop_last else len(idx)
        for s in range(0, stop, B):
            chunk = [self.graphs[j] for j in idx[s:s + B]]
            yield collate(chunk, B, self.max_nodes, self.max_edges,
                          y_graph_level=self.y_graph_level)
