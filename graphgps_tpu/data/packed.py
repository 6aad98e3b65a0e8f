"""Packed dataset arenas + native-collated batch loader.

TPU-native data layout: instead of a Python list of per-graph objects (the
reference's PyG InMemoryDataset keeps exactly such an arena internally), all
graphs of a split are packed ONCE into contiguous numpy arenas (node rows, edge
rows, edge indices, per-node PE rows) with prefix-sum offsets. Batch assembly is
then a single C++ call (graphgps_tpu/native/collate.cpp) that memcpy-packs the
selected graphs into fixed-shape padded buffers and counting-sorts edges by
receiver — the host-side hot path for PCQM4Mv2-scale training.

``PackedLoader`` is a drop-in alternative to ``BatchLoader`` (same HostBatch
output, numpy fallback when the native library is unavailable).
"""
from __future__ import annotations

import ctypes
import logging
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .. import native
from .batching import HostBatch, choose_caps, collate, round_up
from .graph import Graph

log = logging.getLogger("graphgps_tpu")


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class PackedGraphs:
    """Contiguous arena view of a list of Graphs (built once per split)."""

    def __init__(self, graphs: Sequence[Graph]):
        G = len(graphs)
        self.num_graphs = G
        self.node_off = np.zeros(G + 1, dtype=np.int64)
        self.edge_off = np.zeros(G + 1, dtype=np.int64)
        for i, g in enumerate(graphs):
            self.node_off[i + 1] = self.node_off[i] + g.num_nodes
            self.edge_off[i + 1] = self.edge_off[i] + g.num_edges
        g0 = graphs[0]
        self.node_feat = np.ascontiguousarray(
            np.concatenate([g.node_feat for g in graphs], axis=0))
        self.nf_row = self.node_feat.dtype.itemsize * int(
            np.prod(self.node_feat.shape[1:], dtype=np.int64))
        if g0.edge_feat is not None:
            self.edge_feat = np.ascontiguousarray(
                np.concatenate([g.edge_feat for g in graphs], axis=0))
            self.ef_row = self.edge_feat.dtype.itemsize * int(
                np.prod(self.edge_feat.shape[1:], dtype=np.int64))
        else:
            self.edge_feat, self.ef_row = None, 0
        self.senders = np.ascontiguousarray(np.concatenate(
            [g.edge_index[0] for g in graphs]).astype(np.int32))
        self.receivers = np.ascontiguousarray(np.concatenate(
            [g.edge_index[1] for g in graphs]).astype(np.int32))
        # per-node PE arenas
        self.pe: Dict[str, np.ndarray] = {}
        for k in g0.pe:
            self.pe[k] = np.ascontiguousarray(
                np.concatenate([g.pe[k] for g in graphs], axis=0))
        # graph-level targets (kept as object-free padded matrix when uniform)
        self.y = None
        if g0.y is not None:
            ys = [np.atleast_1d(np.asarray(g.y)) for g in graphs]
            if all(y.shape == ys[0].shape for y in ys):
                self.y = np.stack(ys)
        self.y_node = None
        if g0.y is not None and np.asarray(g0.y).shape[:1] == (g0.num_nodes,):
            self.y_node = np.ascontiguousarray(
                np.concatenate([np.asarray(g.y) for g in graphs], axis=0))
        self.graphs = list(graphs)  # for fallback path / extras

    def max_nodes(self) -> int:
        return int((self.node_off[1:] - self.node_off[:-1]).max())

    def max_edges(self) -> int:
        return int((self.edge_off[1:] - self.edge_off[:-1]).max())


def collate_packed(p: PackedGraphs, sel: np.ndarray, batch_size: int,
                   max_nodes: int, max_edges: int,
                   y_graph_level: bool = True) -> HostBatch:
    """Native-collated fixed-shape batch; numpy fallback when lib missing."""
    lib = native.get_lib()
    if lib is None:
        return collate([p.graphs[i] for i in sel], batch_size, max_nodes,
                       max_edges, y_graph_level=y_graph_level)
    B, Nmax, Emax = batch_size, max_nodes, max_edges
    S = B * Nmax
    nf = np.empty((S,) + p.node_feat.shape[1:], dtype=p.node_feat.dtype)
    ef = (np.empty((Emax,) + p.edge_feat.shape[1:], dtype=p.edge_feat.dtype)
          if p.edge_feat is not None else None)
    senders = np.empty(Emax, dtype=np.int32)
    receivers = np.empty(Emax, dtype=np.int32)
    node_mask = np.empty(S, dtype=np.uint8)
    edge_mask = np.empty(Emax, dtype=np.uint8)
    graph_mask = np.empty(B, dtype=np.uint8)
    sel64 = np.ascontiguousarray(sel.astype(np.int64))
    rc = lib.collate_batch(
        _i64(p.node_off), _i64(p.edge_off), _u8(p.node_feat),
        _u8(p.edge_feat) if ef is not None else None,
        _i32(p.senders), _i32(p.receivers), _i64(sel64),
        len(sel64), B, Nmax, Emax, p.nf_row, p.ef_row,
        _u8(nf), _u8(ef) if ef is not None else None,
        _i32(senders), _i32(receivers), _u8(node_mask), _u8(edge_mask),
        _u8(graph_mask))
    if rc == -1:
        raise ValueError(f"graph exceeds max_nodes={Nmax}")
    if rc == -2:
        raise ValueError(f"edge budget exceeded ({Emax})")

    y = None
    if y_graph_level and p.y is not None:
        y = np.full((B,) + p.y.shape[1:],
                    np.nan if np.issubdtype(p.y.dtype, np.floating) else 0,
                    dtype=(p.y.dtype if np.issubdtype(p.y.dtype, np.floating)
                           else p.y.dtype))
        y[:len(sel)] = p.y[sel]
    elif not y_graph_level and p.y_node is not None:
        row = p.y_node.dtype.itemsize * int(
            np.prod(p.y_node.shape[1:], dtype=np.int64))
        y = np.zeros((S,) + p.y_node.shape[1:], dtype=p.y_node.dtype)
        lib.pad_node_rows(_i64(p.node_off), _u8(p.y_node), _i64(sel64),
                          len(sel64), B, Nmax, row, _u8(y))

    pe_out: Dict[str, np.ndarray] = {}
    for k, arena in p.pe.items():
        row = arena.dtype.itemsize * int(np.prod(arena.shape[1:], dtype=np.int64))
        out = np.zeros((S,) + arena.shape[1:], dtype=arena.dtype)
        lib.pad_node_rows(_i64(p.node_off), _u8(arena), _i64(sel64),
                          len(sel64), B, Nmax, row, _u8(out))
        pe_out[k] = out

    extras: Dict[str, np.ndarray] = {}
    if p.graphs and p.graphs[int(sel[0])].extras:
        # extras are rare (attn_bias, eigvals, link labels) — assemble via numpy
        g0 = p.graphs[int(sel[0])]
        from .batching import extras_pad_shape
        for k, v in g0.extras.items():
            shp = extras_pad_shape(
                k, v, lambda d: max(p.graphs[int(gi)].extras[k].shape[d]
                                    for gi in sel), Nmax)
            buf = np.zeros((B, *shp), dtype=v.dtype)
            for i, gi in enumerate(sel):
                vv = p.graphs[int(gi)].extras[k]
                sl = tuple(slice(0, s) for s in vv.shape)
                buf[(i, *sl)] = vv
                if k == "edge_label":
                    if "edge_label_mask" not in extras:
                        extras["edge_label_mask"] = np.zeros(
                            (B, shp[0]), dtype=bool)
                    extras["edge_label_mask"][i, :vv.shape[0]] = True
            extras[k] = buf

    arrays = dict(node_feat=nf, edge_feat=ef, senders=senders,
                  receivers=receivers, node_mask=node_mask.astype(bool),
                  edge_mask=edge_mask.astype(bool),
                  graph_mask=graph_mask.astype(bool), y=y)
    return HostBatch(arrays=arrays, pe=pe_out, extras=extras,
                     num_graphs=B, max_nodes=Nmax)


class PackedLoader:
    """Epoch iterator over a PackedGraphs arena using the native collater."""

    def __init__(self, graphs: Sequence[Graph], batch_size: int,
                 max_nodes: Optional[int] = None,
                 max_edges: Optional[int] = None, shuffle: bool = False,
                 seed: int = 0, y_graph_level: bool = True,
                 drop_last: bool = False):
        self.packed = PackedGraphs(graphs)
        self.batch_size = batch_size
        n_cap = round_up(max(self.packed.max_nodes(), 1), 8)
        e_cap = round_up(max(self.packed.max_edges(), 1), 32)
        self.max_nodes = max_nodes or n_cap
        self.max_edges = max_edges or round_up(batch_size * e_cap, 128)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.y_graph_level = y_graph_level
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = self.packed.num_graphs
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[HostBatch]:
        idx = np.arange(self.packed.num_graphs)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        self.epoch += 1
        B = self.batch_size
        stop = len(idx) - (len(idx) % B) if self.drop_last else len(idx)
        for s in range(0, stop, B):
            yield collate_packed(self.packed, idx[s:s + B], B, self.max_nodes,
                                 self.max_edges, self.y_graph_level)
