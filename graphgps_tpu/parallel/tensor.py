"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

SURVEY.md §2.10: TP is optional for GraphGPS-scale models (≤20M params) but the
framework owns the capability. SPMD formulation: parameters are annotated with
NamedShardings by path-based rules and the SAME jitted training step runs
unchanged — XLA partitions the matmuls along ``model`` and inserts the
all-reduces. The default rules shard the GPS layer's widest matmuls:

- FFN up-projection  (d, 2d): columns (output features) over ``model``;
- FFN down-projection (2d, d): rows (input features) over ``model`` —
  the Megatron column/row pairing, so the pair needs one all-reduce;
- attention QKV projections: output features (head blocks) over ``model``.

Biases stay replicated (small). Anything unmatched is replicated.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    """Choose a PartitionSpec for a kernel by shape/name heuristics."""
    if mesh.shape["model"] == 1:
        return P()
    m = mesh.shape["model"]
    if len(shape) == 3 and "qkv_kernel" in path and shape[2] % m == 0:
        # packed QKV (d, 3, d): shard the head axis (last dim = H·Dh) —
        # Megatron column-parallel attention (gps_layer.py qkv params)
        return P(None, None, "model")
    if len(shape) != 2:
        return P()
    rows, cols = shape
    if cols == 2 * rows and cols % m == 0:      # FFN up-proj (d, 2d)
        return P(None, "model")
    if rows == 2 * cols and rows % m == 0:      # FFN down-proj (2d, d)
        return P("model", None)
    return P()


def tp_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params`` under the TP rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", k)) for k in kp)

    specs = {}
    for kp, leaf in flat:
        p = path_str(kp)
        specs[p] = NamedSharding(mesh, _spec_for(p, np.shape(leaf), mesh))

    def assign(kp, leaf):
        return specs[path_str(kp)]

    return jax.tree_util.tree_map_with_path(assign, params)


def opt_state_shardings(opt_state, params, p_sh, mesh: Mesh):
    """Shardings for an optax state: any subtree that mirrors the param tree
    structure (adam mu/nu, momentum buffers, masked wrappers…) gets the param
    shardings leaf-for-leaf; everything else (step counts, scalars) is
    replicated."""
    rep = NamedSharding(mesh, P())
    pstruct = jax.tree_util.tree_structure(params)

    def is_param_like(sub):
        try:
            return jax.tree_util.tree_structure(sub) == pstruct
        except Exception:
            return False

    def assign(sub):
        if is_param_like(sub):
            return p_sh
        return jax.tree_util.tree_map(lambda _: rep, sub)

    return jax.tree_util.tree_map(assign, opt_state, is_leaf=is_param_like)


def shard_params_tp(state, mesh: Mesh):
    """Device-put a TrainState with TP-sharded params; optimizer moment
    buffers are sharded exactly like their parameters (so TP also shards the
    optimizer memory, Megatron-style); batch_stats replicated."""
    p_sh = tp_shardings(state.params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
    rep = NamedSharding(mesh, P())
    o_sh = opt_state_shardings(state.opt_state, state.params, p_sh, mesh)
    if not any(s is p_sh for s in jax.tree_util.tree_leaves(
            o_sh, is_leaf=lambda x: x is p_sh)):
        import logging
        logging.getLogger("graphgps_tpu").warning(
            "shard_params_tp: opt_state has no param-shaped moment subtree — "
            "optimizer memory will be REPLICATED. If cfg.optim.fused_flat "
            "raveled the moments, set cfg.parallel.model_axis before make_tx "
            "(make_tx auto-disables fused_flat under TP).")
    opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state, o_sh)

    from ..train.loop import TrainState
    return TrainState(
        params=params,
        batch_stats=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                           state.batch_stats),
        opt_state=opt_state,
        step=jax.device_put(state.step, rep))
