"""Device mesh construction + batch/param sharding for SPMD training.

New capability vs the reference (which is single-device; SURVEY.md §2.10): data
parallelism via ``jax.sharding.NamedSharding`` over a ``('data', 'model')`` mesh.
Graph batches shard on their leading axis along ``data``; because collation packs
each graph's nodes into a contiguous slot range (data/graph.py) and batch_size is
chosen divisible by the data-axis size, node/edge/graph shards align with graph
boundaries and XLA keeps gathers local, inserting only the gradient all-reduce.

Multi-host entry: ``jax.distributed.initialize`` is the process-group bootstrap
(the reference has no equivalent — Slurm-level fan-out only,
/root/reference/run/run_experiments.sh:27-31).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str = "", num_processes: int = 0,
                   process_id: int = -1) -> None:
    """Multi-host process-group bootstrap (SURVEY.md §2.10 'distributed comm
    backend' row): jax.distributed.initialize wires all hosts of a pod slice
    into one SPMD program; collectives then ride ICI/DCN automatically. On
    single-host runs this is a no-op. Args default to the JAX coordinator
    env vars (JAX_COORDINATOR_ADDRESS etc.)."""
    import os

    if num_processes <= 1 and not os.environ.get("JAX_COORDINATOR_ADDRESS") \
            and not coordinator:
        return
    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes > 0:
        kw["num_processes"] = num_processes
    if process_id >= 0:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build a (data, model) mesh from cfg.parallel or all visible devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data_ax = model_ax = 0
    if cfg is not None:
        shape = list(cfg.parallel.mesh_shape or [])
        if len(shape) == 2:
            data_ax, model_ax = shape
        else:
            data_ax = cfg.parallel.data_axis or 0
            model_ax = cfg.parallel.model_axis or 1
    if data_ax <= 0:
        model_ax = max(1, model_ax)
        data_ax = n // model_ax
    arr = np.asarray(devices[: data_ax * model_ax]).reshape(data_ax, model_ax)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> "jax.tree_util.PyTreeDef":
    """Shard every GraphBatch array on its leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a GraphBatch with leading-axis data sharding.

    Dict-valued fields (pe/extras) and None leaves are handled; scalar/0-d leaves
    are replicated.
    """
    data = NamedSharding(mesh, P("data"))
    rep = replicated(mesh)

    def put(x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, data)

    return jax.tree_util.tree_map(put, batch)


def shard_params(tree, mesh: Mesh):
    """Replicate parameters/optimizer state across the mesh (pure DP).

    Tensor-parallel param sharding (model axis) is layered on top by
    parallel/tensor.py for wide models.
    """
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


# ---------------------------------------------------------------------------------
# Ambient mesh registry: model code (e.g. the GPS ring-attention dispatch)
# needs the Mesh object for shard_map but is built from cfg alone. The driver
# publishes the active mesh here; None means single-device execution.

_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def constrain_nodes(x: jax.Array) -> jax.Array:
    """Pin a flat node tensor (B*Nmax, ...) to the canonical data-parallel
    layout P('data', None, ...). No-op without an active mesh.

    Used at layout transitions (e.g. the ring-attention output's flat view,
    whose node axis is jointly sharded over data×model): an explicit
    constraint lets XLA lower the reshard — forward AND transpose — as one
    all-gather over 'model' instead of the SPMD partitioner's last-resort
    full rematerialization (MULTICHIP_r02.json warnings)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
