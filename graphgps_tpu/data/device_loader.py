"""Device-side batch assembly: upload the dataset arena once, transfer only
graph indices per step.

Host-side collation pays one host→device transfer of every batch array per
step — through this environment's TPU tunnel that is the dominant epoch cost.
TPU-native alternative: the packed arenas (data/packed.py) are uploaded to HBM
ONCE per split; each step ships only the (B,) graph-index vector and a jitted
gather assembles the padded GraphBatch entirely on device:

- node rows:   arena[node_off[sel][:,None] + arange(Nmax)]  (masked gather)
- edges:       per-graph layout (B, Eg) — local ids + slot base; each graph's
  edges are pre-sorted by receiver at pack time, so the flattened batch edge
  list is globally receiver-sorted (slot bases increase with graph position)
  and the CSR segment kernels' sortedness contract holds;
- y / PE rows: same gather pattern.

Falls back to the host PackedLoader when a dataset carries per-graph extras
(attn_bias, link labels) — those stay host-collated.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .batching import round_up
from .graph import Graph, GraphBatch
from .packed import PackedGraphs


def narrow_int(arr: np.ndarray) -> np.ndarray:
    """Losslessly narrow an integer array to the smallest signed dtype that
    holds its value range (int8/int16/int32).

    Feature columns of molecular datasets are tiny categoricals stored as
    int64 by convention (OGB atom/bond tables top out at 119); narrowing the
    device arenas 4-8x is what lets the full 3.37M-graph PCQM4Mv2 train split
    sit in a single chip's HBM for device-side assembly. ``assemble_impl``
    casts gathered values back to int32 before they reach the model, so the
    compaction is invisible downstream. Floats / bools pass through.
    """
    if arr.dtype.kind not in "iu" or arr.size == 0:
        return arr
    lo, hi = int(arr.min()), int(arr.max())
    for dt in (np.int8, np.int16, np.int32):
        info = np.iinfo(dt)
        if lo >= info.min and hi <= info.max:
            return arr.astype(dt)
    return arr


def _restore_int(x: jax.Array) -> jax.Array:
    """Undo narrow_int after the device-side gather (int8/16 → int32)."""
    if jnp.issubdtype(x.dtype, jnp.integer) and x.dtype.itemsize < 4:
        return x.astype(jnp.int32)
    return x


class DeviceArenas:
    """Per-split device-resident arenas with per-graph edge layout."""

    def __init__(self, graphs: Sequence[Graph], y_graph_level: bool = True,
                 edge_cap: Optional[int] = None, compact: bool = True,
                 pe_dtype: Optional[str] = None):
        self.compact = compact
        self.pe_dtype = pe_dtype
        G = len(graphs)
        g0 = graphs[0]
        max_n = max(g.num_nodes for g in graphs)
        max_e = max((g.num_edges for g in graphs), default=1)
        self.max_nodes_raw = max_n
        self.edge_cap = edge_cap or round_up(max(max_e, 1), 8)
        if self.edge_cap < max_e:
            raise ValueError(f"edge_cap {self.edge_cap} < max graph edges {max_e}")

        node_off = np.zeros(G + 1, np.int64)
        for i, g in enumerate(graphs):
            node_off[i + 1] = node_off[i] + g.num_nodes
        node_feat = np.concatenate([g.node_feat for g in graphs], axis=0)

        # per-graph edge arena (G, Ecap) with receiver-sorted local ids
        Ecap = self.edge_cap
        senders = np.zeros((G, Ecap), np.int32)
        receivers = np.zeros((G, Ecap), np.int32)
        e_count = np.zeros((G,), np.int32)
        edge_feat = None
        if g0.edge_feat is not None:
            edge_feat = np.zeros((G, Ecap, *g0.edge_feat.shape[1:]),
                                 g0.edge_feat.dtype)
        for i, g in enumerate(graphs):
            e = g.num_edges
            order = np.argsort(g.edge_index[1], kind="stable")
            senders[i, :e] = g.edge_index[0][order]
            receivers[i, :e] = g.edge_index[1][order]
            # padding receivers: last node of the graph keeps sortedness
            pad_r = g.num_nodes - 1 if g.num_nodes else 0
            receivers[i, e:] = pad_r
            senders[i, e:] = pad_r
            e_count[i] = e
            if edge_feat is not None and g.edge_feat is not None:
                edge_feat[i, :e] = g.edge_feat[order]

        n_count = (node_off[1:] - node_off[:-1]).astype(np.int32)

        _c = narrow_int if compact else (lambda a: a)
        self.node_off = jnp.asarray(node_off)
        self.n_count = jnp.asarray(n_count)
        self.e_count = jnp.asarray(e_count)
        self.node_feat = jnp.asarray(_c(node_feat))
        self.senders = jnp.asarray(_c(senders))
        self.receivers = jnp.asarray(_c(receivers))
        self.edge_feat = (jnp.asarray(_c(edge_feat))
                          if edge_feat is not None else None)

        # PE rows are input features (BatchNorm/Linear follow immediately), so
        # an opt-in bf16 arena halves the dominant float footprint at
        # PCQM4Mv2-full scale; assemble casts back to f32 on gather.
        self.pe = {}
        for k in g0.pe:
            arr = np.concatenate([g.pe[k] for g in graphs], axis=0)
            v = jnp.asarray(arr)
            if pe_dtype and jnp.issubdtype(v.dtype, jnp.floating):
                v = v.astype(pe_dtype)
            self.pe[k] = v

        self.y = None
        self.y_node = None
        self.y_graph_level = y_graph_level
        if g0.y is not None and y_graph_level:
            ys = [np.atleast_1d(np.asarray(g.y)) for g in graphs]
            self.y = jnp.asarray(_c(np.stack(ys)))
        elif g0.y is not None:
            self.y_node = jnp.asarray(
                _c(np.concatenate([np.asarray(g.y).reshape(g.num_nodes, -1)
                                   for g in graphs], axis=0)))

        # per-graph extras arenas: padded to the per-key batch maximum, with
        # node-sized axes padded to the node cap later in assemble's view
        # (they are stored at the global max already). 'edge_label' also gets
        # a validity-mask arena (host-collation convention, batching.py).
        self.extras: Dict[str, jnp.ndarray] = {}
        for k, v0 in g0.extras.items():
            shapes = [g.extras[k].shape for g in graphs]
            shp = tuple(max(s[d] for s in shapes) for d in range(v0.ndim))
            buf = np.zeros((G, *shp), dtype=v0.dtype)
            for i, g in enumerate(graphs):
                vv = g.extras[k]
                buf[(i, *map(lambda s: slice(0, s), vv.shape))] = vv
            self.extras[k] = jnp.asarray(_c(buf))
            if k == "edge_label":
                m = np.zeros((G, shp[0]), dtype=bool)
                for i, g in enumerate(graphs):
                    m[i, :g.extras[k].shape[0]] = True
                self.extras["edge_label_mask"] = jnp.asarray(m)
        self.num_graphs_total = G
        self.has_extras = bool(g0.extras)


def assemble_impl(arenas_tree, sel: jax.Array, max_nodes: int,
                  num_graphs: int):
    """Device-side collation (traceable): (arenas, (B,) int32) → GraphBatch.
    Call this from inside other jitted functions (e.g. fused train steps);
    use ``assemble`` for a standalone jitted call."""
    a = arenas_tree
    B, Nmax = num_graphs, max_nodes
    off = a["node_off"][sel]                       # (B,)
    ncnt = a["n_count"][sel]
    ecnt = a["e_count"][sel]
    gmask = sel >= 0

    j = jnp.arange(Nmax)[None, :]
    node_idx = off[:, None] + jnp.minimum(j, jnp.maximum(ncnt[:, None] - 1, 0))
    node_mask = (j < ncnt[:, None]) & gmask[:, None]
    nf = _restore_int(a["node_feat"][node_idx.reshape(-1)])
    nf = jnp.where(node_mask.reshape(-1)[(...,) + (None,) * (nf.ndim - 1)],
                   nf, 0)

    Ecap = a["senders"].shape[1]
    k = jnp.arange(Ecap)[None, :]
    emask = (k < ecnt[:, None]) & gmask[:, None]
    base = (jnp.arange(B) * Nmax)[:, None]
    snd = (a["senders"][sel] + base).reshape(-1).astype(jnp.int32)
    rcv = (a["receivers"][sel] + base).reshape(-1).astype(jnp.int32)
    ef = None
    if a.get("edge_feat") is not None:
        ef = _restore_int(a["edge_feat"][sel]).reshape(
            B * Ecap, *a["edge_feat"].shape[2:])
        ef = jnp.where(emask.reshape(-1)[(...,) + (None,) * (ef.ndim - 1)],
                       ef, 0)

    pe = {}
    for key, arena in a["pe"].items():
        v = arena[node_idx.reshape(-1)]
        if v.dtype == jnp.bfloat16:
            v = v.astype(jnp.float32)
        # zero padding (host-collation convention): NaN here would poison
        # masked reductions (0·NaN = NaN); LapPE's own NaN semantics live in
        # the arena content, not the padding
        pe[key] = jnp.where(
            node_mask.reshape(-1)[(...,) + (None,) * (v.ndim - 1)], v, 0)

    y = None
    if a.get("y") is not None:
        y = _restore_int(a["y"][sel])
        if jnp.issubdtype(y.dtype, jnp.floating):
            y = jnp.where(gmask[(...,) + (None,) * (y.ndim - 1)], y, jnp.nan)
    elif a.get("y_node") is not None:
        yv = _restore_int(a["y_node"][node_idx.reshape(-1)])
        y = jnp.where(node_mask.reshape(-1)[(...,) + (None,) * (yv.ndim - 1)],
                      yv, 0)
        if yv.shape[-1] == 1:
            y = y[..., 0]

    extras = {}
    for key, arena in a.get("extras", {}).items():
        v = _restore_int(arena[sel])
        if key == "edge_label_mask":
            v = jnp.logical_and(v, gmask[:, None])
        extras[key] = v

    return GraphBatch(
        node_feat=nf, edge_feat=ef, senders=snd, receivers=rcv,
        node_mask=node_mask.reshape(-1), edge_mask=emask.reshape(-1),
        graph_mask=gmask, y=y, pe=pe, extras=extras,
        num_graphs=B, max_nodes=Nmax, edge_block=Ecap)


assemble = functools.partial(jax.jit, static_argnums=(2, 3))(assemble_impl)


class DeviceLoader:
    """Epoch iterator yielding device-assembled GraphBatches.

    API-compatible with BatchLoader/PackedLoader for the training loop; per
    step only the (B,) index vector crosses the host→device boundary.
    """

    def __init__(self, graphs: Sequence[Graph], batch_size: int,
                 max_nodes: Optional[int] = None,
                 max_edges: Optional[int] = None, shuffle: bool = False,
                 seed: int = 0, y_graph_level: bool = True,
                 drop_last: bool = False, compact: bool = True,
                 pe_dtype: Optional[str] = None):
        edge_cap = (-(-max_edges // batch_size)) if max_edges else None
        self.arenas = DeviceArenas(graphs, y_graph_level, edge_cap=edge_cap,
                                   compact=compact, pe_dtype=pe_dtype)
        self.batch_size = batch_size
        if max_nodes:
            self.max_nodes = max_nodes
        else:
            self.max_nodes = round_up(self.arenas.max_nodes_raw, 8)
            if self.max_nodes >= 256:
                # lane-align so the flash-attention path can engage
                # (choose_caps applies the same policy for host loaders)
                self.max_nodes = round_up(self.max_nodes, 128)
        self.max_edges = batch_size * self.arenas.edge_cap
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.y_graph_level = y_graph_level
        self.drop_last = drop_last
        a = self.arenas
        self._tree = dict(node_off=a.node_off, n_count=a.n_count,
                          e_count=a.e_count, node_feat=a.node_feat,
                          senders=a.senders, receivers=a.receivers,
                          edge_feat=a.edge_feat, pe=a.pe, y=a.y,
                          y_node=a.y_node, extras=a.extras)

    @property
    def arenas_tree(self):
        """Public pytree of device-resident arenas (for fused train steps)."""
        return self._tree

    def hbm_bytes(self) -> int:
        """Device-resident arena footprint (after compact-dtype narrowing)."""
        return sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(self._tree))

    def __len__(self) -> int:
        n = self.arenas.num_graphs_total
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        n = self.arenas.num_graphs_total
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        self.epoch += 1
        B = self.batch_size
        stop = n - (n % B) if self.drop_last else n
        for s in range(0, stop, B):
            chunk = idx[s:s + B]
            real = len(chunk)
            if real < B:
                chunk = np.concatenate([chunk, -np.ones(B - real, np.int64)])
            sel = jnp.asarray(chunk.astype(np.int32))
            gb = assemble(self._tree, sel, self.max_nodes, B)
            yield real, gb
