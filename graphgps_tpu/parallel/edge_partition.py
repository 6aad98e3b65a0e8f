"""Edge-partitioned aggregation with boundary-node exchange.

Design note (SURVEY.md §2.10 'graph/edge partitioning' row): for GraphGPS
workloads — many independent small/medium graphs — graph-aligned data
parallelism IS the edge partitioning: each chip owns whole graphs, so there are
no cross-chip edges and no boundary exchange at all. That path is
parallel/mesh.py and is the production configuration.

This module covers the remaining case the north star names: a graph whose edge
set is split across chips (giant single graphs). ``edge_partitioned_segment_sum``
runs under ``shard_map`` with edges sharded on the mesh axis while every chip
keeps the full (replicated) node feature tensor: each chip aggregates its local
edge shard's messages into a full-size accumulator, and one ``psum`` over the
axis combines the partial sums — the classic partial-aggregate + all-reduce
schedule, with XLA overlapping the reduction with surrounding compute. The
boundary-node gradient flow is exact because the whole computation is
differentiable through the psum (tests/test_edge_partition.py checks fwd+bwd
against the single-device op).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def edge_partitioned_segment_sum(data: jax.Array, segment_ids: jax.Array,
                                 num_segments: int, mesh: Mesh,
                                 mask: Optional[jax.Array] = None,
                                 axis: str = "data") -> jax.Array:
    """segment_sum with the edge axis sharded over ``axis``.

    data (E, D), segment_ids (E,) — E divisible by the axis size; returns the
    full (num_segments, D) on every chip (replicated), ready for the node
    update that follows.
    """
    from jax.experimental.shard_map import shard_map

    def local(d, ids, m):
        part = jax.ops.segment_sum(
            jnp.where(m[:, None], d, 0) if m is not None else d,
            ids, num_segments=num_segments)
        return jax.lax.psum(part, axis)

    in_specs = (P(axis, None), P(axis),
                P(axis) if mask is not None else None)
    args = (data, segment_ids, mask)
    if mask is None:
        def local2(d, ids):
            part = jax.ops.segment_sum(d, ids, num_segments=num_segments)
            return jax.lax.psum(part, axis)
        return shard_map(local2, mesh=mesh, in_specs=(P(axis, None), P(axis)),
                         out_specs=P(), check_rep=False)(data, segment_ids)
    return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(),
                     check_rep=False)(*args)
