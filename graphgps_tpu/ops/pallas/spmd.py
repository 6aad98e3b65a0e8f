"""Data-parallel SPMD wrapping for the fused Pallas kernels.

The fused kernels (fused_gps_attn / fused_gatedgcn / fused_tail) are
single-device programs: grid-accumulated weight gradients and blocked
batch layouts have no meaning across chips. Under a PURE data-parallel
mesh they compose cleanly with ``shard_map``: batch-leading arguments
shard over 'data', weights/stat vectors replicate, and shard_map's
transpose psums the replicated inputs' cotangents — exactly DP gradient
semantics. Partial-sum outputs (BatchNorm moment partials) are psum'd
inside the body so they leave the shard_map replicated.

Under tensor/expert/pipeline parallelism (model axis > 1) the kernels stay
OFF and the XLA paths — which the SPMD partitioner handles natively — serve
(fused-kernel eligibility enforces this). Dropout seeds are decorrelated
per shard by folding in ``axis_index('data')`` before the kernel call, so
the backward (which reuses the folded seed) replays the same mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dp_mesh(rows: int):
    """The active mesh, iff it is PURE data-parallel (every non-'data' axis
    has size 1), has ≥2 'data' shards, and ``rows`` divides evenly. None
    otherwise (caller uses the plain single-device call or the XLA path)."""
    from ...parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None:
        return None
    if any(sz > 1 for name, sz in mesh.shape.items() if name != "data"):
        return None
    d = mesh.shape.get("data", 1)
    if d < 2 or rows % d:
        return None
    return mesh


def dp_compatible(rows: int) -> bool:
    """True when fused kernels may run: no mesh, or a DP mesh that divides
    ``rows`` (the batch-leading dimension)."""
    from ...parallel.mesh import current_mesh

    return current_mesh() is None or dp_mesh(rows) is not None


def dp_shard_map(body, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map

    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)


def fold_shard_seed(seed):
    """Decorrelate per-shard dropout streams (inside a shard_map body)."""
    return (jnp.asarray(seed, jnp.int32)
            + jax.lax.axis_index("data").astype(jnp.int32)
            * jnp.int32(1000003))
