"""Edge-tiled long-graph GatedGCN kernel (ops/pallas/fused_edge_gate.py) vs
the blocked-XLA layer path: fwd outputs, grads, batch_stats — at a VOC-like
shape (N=128 wide, ~300 edges/graph, d=96 through the zero-pad path) where
the small-graph fused core is ineligible."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_fused_gatedgcn import _blocked_batch


def _run_layer(batch, x, e, env: dict, seed=2):
    from graphgps_tpu.models.local_gnn import GatedGCNLayer

    layer = GatedGCNLayer(dim=x.shape[-1], dropout=0.0, residual=True,
                          batch_norm=True, act="relu")
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        var = layer.init(jax.random.PRNGKey(seed), batch, x, e, True)

        def loss(params, x, e):
            (xo, eo), upd = layer.apply(
                {"params": params, "batch_stats": var["batch_stats"]},
                batch, x, e, True, mutable=["batch_stats"])
            nm = batch.node_mask[:, None]
            em = batch.edge_mask[:, None]
            return (jnp.sum((xo * nm) ** 2) + jnp.sum((eo * em) ** 2), upd)

        (val, upd), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           has_aux=True)(var["params"], x, e)
        return var, val, upd, g
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize("shape", [
    (16, 128, 1024, 96),    # VOC-ish: wide graphs, d=96 → pad path
    (16, 128, 1024, 128),   # lane-aligned variant
])
def test_edge_gate_matches_xla_layer(shape):
    B, N, E, d = shape
    batch, x, e, nmask, emask = _blocked_batch(B, N, E, d, seed=13)

    # these shapes have NO legal 8-aligned small-core block (per-graph VMEM
    # too large for G=8), so the layer routes to the edge-gate rung
    from graphgps_tpu.ops.pallas.fused_gatedgcn import (
        fused_gatedgcn_eligible)
    from graphgps_tpu.ops.pallas.fused_edge_gate import edge_gate_eligible
    assert not fused_gatedgcn_eligible(batch, x, e, d, False)
    assert edge_gate_eligible(batch, x, e, d, False)

    var_f, val_f, upd_f, g_f = _run_layer(
        batch, x, e, {"GGPS_FUSED_TAIL": "0"})
    var_u, val_u, upd_u, g_u = _run_layer(
        batch, x, e, {"GGPS_FUSED_TAIL": "0", "GGPS_FUSED_GGCN": "0"})

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_f, var_u)
    np.testing.assert_allclose(float(val_f), float(val_u), rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        upd_f, upd_u)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3),
        g_f, g_u)
