"""Core graph containers.

Design (SURVEY.md §7.1): instead of the reference's mutable PyG ``Batch`` blackboard
threaded through every module (/root/reference/graphgps/layer/gps_layer.py:155-232)
and the per-layer ragged→dense round trip (gps_layer.py:199), we fix ONE canonical
TPU layout at batch construction time:

- Nodes live in a flat padded tensor of ``num_graphs * max_nodes`` slots; graph ``g``
  owns the contiguous slot range ``[g*max_nodes, (g+1)*max_nodes)``. A free reshape to
  ``(num_graphs, max_nodes, d)`` gives the dense view used by global attention; the
  flat view feeds the local MPNN. No scatter/gather round trip per layer.
- Edges are flat index arrays (``senders``/``receivers``) into the flat node space,
  padded to a static ``max_edges`` and sorted by receiver (CSR-friendly for the
  Pallas segment kernels). Padded edges point at slot 0 and MUST be masked: every
  edge message is multiplied by ``edge_mask`` before aggregation.
- All shapes are static per bucket; masking is load-bearing everywhere
  (BatchNorm / pooling / softmax / metrics ignore padding).

``Graph`` is the host-side (numpy) single-graph record produced by dataset loaders,
the analog of a PyG ``Data`` object.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Graph:
    """Host-side single graph (numpy). Produced by dataset loaders / transforms."""

    node_feat: np.ndarray  # (N, Fn) — int codes or float features
    edge_index: np.ndarray  # (2, E) int — [senders; receivers]
    edge_feat: Optional[np.ndarray] = None  # (E, Fe)
    y: Optional[np.ndarray] = None  # graph-level (T,) or node-level (N, ...)
    pe: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    extras: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return int(self.node_feat.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    def clone_with_extras(self, **extras) -> "Graph":
        """Shallow view sharing the array fields but with OWN pe/extras dicts
        (plus the given extra entries) — the transductive one-graph-many-
        splits pattern."""
        g = dataclasses.replace(self, pe=dict(self.pe),
                                extras={**self.extras, **extras})
        return g


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """Device-side padded/bucketed batch of graphs — an immutable pytree.

    Flat node layout: slot ``i`` belongs to graph ``i // max_nodes``. The dense view
    for attention is ``x.reshape(num_graphs, max_nodes, -1)`` (a free reshape).
    """

    # --- array (pytree) fields -------------------------------------------------
    node_feat: jax.Array  # (B*Nmax, Fn)
    edge_feat: Optional[jax.Array]  # (Emax, Fe) or None
    senders: jax.Array  # (Emax,) int32 into flat node space
    receivers: jax.Array  # (Emax,) int32 into flat node space
    node_mask: jax.Array  # (B*Nmax,) bool
    edge_mask: jax.Array  # (Emax,) bool
    graph_mask: jax.Array  # (B,) bool
    y: Optional[jax.Array]  # (B, T) graph-level or (B*Nmax, ...) node-level
    pe: Dict[str, jax.Array]  # positional encodings keyed by type
    extras: Dict[str, jax.Array]  # attn_bias, eigvals, label masks, ...

    # --- static metadata -------------------------------------------------------
    num_graphs: int = dataclasses.field(metadata=dict(static=True))
    max_nodes: int = dataclasses.field(metadata=dict(static=True))
    # Per-graph edge-slot layout (device-assembled batches): edge slot j
    # belongs to graph j // edge_block and its endpoints lie inside that
    # graph's node range. Lets segment ops run as BLOCK-DIAGONAL batched
    # one-hot matmuls on the MXU instead of global scatters (which serialize
    # on TPU and cannot be hidden inside lax.scan). None = flat-packed edges
    # (host collation) — global segment path.
    edge_block: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def num_node_slots(self) -> int:
        return self.num_graphs * self.max_nodes

    @property
    def max_edges(self) -> int:
        return int(self.senders.shape[0])

    @property
    def graph_id(self) -> jax.Array:
        """(B*Nmax,) int32 graph id of every node slot (computed, not stored)."""
        return jnp.arange(self.num_node_slots, dtype=jnp.int32) // self.max_nodes

    @property
    def nodes_per_graph(self) -> jax.Array:
        """(B,) real node counts."""
        return self.node_mask.reshape(self.num_graphs, self.max_nodes).sum(axis=1)

    def dense_view(self, x: jax.Array) -> jax.Array:
        """Reshape flat node tensor (B*Nmax, d) → (B, Nmax, d). Free on TPU."""
        return x.reshape(self.num_graphs, self.max_nodes, *x.shape[1:])

    def flat_view(self, x: jax.Array) -> jax.Array:
        """Inverse of :meth:`dense_view`."""
        return x.reshape(self.num_node_slots, *x.shape[2:])

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)
