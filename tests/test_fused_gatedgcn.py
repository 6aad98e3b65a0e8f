"""Fused GatedGCN Pallas core (ops/pallas/fused_gatedgcn.py) vs the unfused
blocked-XLA layer path: fwd outputs and every grad, through the REAL
GatedGCNLayer module so the Dense_0..4 param pytree and the [A|D|E|B] weight
packing are exercised, not just the raw kernel.

On CPU the kernel runs in Pallas interpret mode (f32 dots) — these tests
guard the formulation everywhere; the TPU-compiled kernel is additionally
exercised by the device A/B in tools/ab_fused_ggcn.py.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphgps_tpu.data.graph import GraphBatch
from graphgps_tpu.models.local_gnn import GatedGCNLayer


def _blocked_batch(B=4, N=8, E=16, d=128, seed=0):
    """Device-arena-style blocked batch: graph g owns node slots
    [g*N, (g+1)*N) and edge slots [g*E, (g+1)*E); padded edges point at a
    real node of their graph (the arena invariant)."""
    rng = np.random.default_rng(seed)
    nreal = rng.integers(2, N + 1, size=B)
    ereal = rng.integers(1, E + 1, size=B)
    senders = np.zeros(B * E, np.int32)
    receivers = np.zeros(B * E, np.int32)
    emask = np.zeros(B * E, np.float32)
    nmask = np.zeros(B * N, np.float32)
    for g in range(B):
        nmask[g * N:g * N + nreal[g]] = 1.0
        for j in range(E):
            if j < ereal[g]:
                s = rng.integers(0, nreal[g])
                r = rng.integers(0, nreal[g])
                emask[g * E + j] = 1.0
            else:
                s = r = 0  # padded edge -> real node 0 of the same graph
            senders[g * E + j] = g * N + s
            receivers[g * E + j] = g * N + r
    x = rng.standard_normal((B * N, d)).astype(np.float32)
    e = rng.standard_normal((B * E, d)).astype(np.float32)
    batch = GraphBatch(
        node_feat=jnp.zeros((B * N, 1)), edge_feat=jnp.zeros((B * E, 1)),
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_mask=jnp.asarray(nmask > 0), edge_mask=jnp.asarray(emask > 0),
        graph_mask=jnp.ones((B,), jnp.float32), y=None, pe={}, extras={},
        num_graphs=B, max_nodes=N, edge_block=E)
    return batch, jnp.asarray(x), jnp.asarray(e), nmask, emask


def _run(batch, x, e, fused: bool, seed=1):
    layer = GatedGCNLayer(dim=x.shape[-1], dropout=0.0, residual=True,
                          batch_norm=False)
    os.environ["GGPS_FUSED_GGCN"] = "1" if fused else "0"
    try:
        var = layer.init(jax.random.PRNGKey(seed), batch, x, e, False)

        def fwd(params, x, e):
            return layer.apply({"params": params}, batch, x, e, False)

        xo, eo = fwd(var["params"], x, e)

        def loss(params, x, e):
            xo, eo = fwd(params, x, e)
            nm = batch.node_mask[:, None]
            em = batch.edge_mask[:, None]
            return jnp.sum((xo * nm) ** 2) + jnp.sum((eo * em) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(var["params"], x, e)
        return var, xo, eo, g
    finally:
        os.environ.pop("GGPS_FUSED_GGCN", None)


@pytest.mark.parametrize("shape", [
    (4, 8, 16, 128),    # small ragged
    (2, 32, 64, 256),   # pcqm-deep block shape
    (2, 16, 32, 96),    # VOC width — exercises the zero-pad wrapper
    (2, 8, 16, 64),     # molhiv/PATTERN width (2× lane padding)
])
def test_fused_matches_xla_layer(shape):
    B, N, E, d = shape
    batch, x, e, nmask, emask = _blocked_batch(B, N, E, d)

    var_f, xo_f, eo_f, g_f = _run(batch, x, e, fused=True)
    var_u, xo_u, eo_u, g_u = _run(batch, x, e, fused=False)

    # identical param pytrees (same names, shapes, AND init values — the
    # probe rows must not consume extra PRNG draws)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_f, var_u)

    nm = nmask > 0
    em = emask > 0
    np.testing.assert_allclose(np.asarray(xo_f)[nm], np.asarray(xo_u)[nm],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(eo_f)[em], np.asarray(eo_u)[em],
                               rtol=2e-4, atol=2e-4)

    # every grad: params (incl. the packed-weight VJP back through concat),
    # node features, edge features
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g_f, g_u)


def test_eligibility_gates():
    from graphgps_tpu.ops.pallas.fused_gatedgcn import fused_gatedgcn_eligible
    from graphgps_tpu.parallel.mesh import set_current_mesh

    set_current_mesh(None)  # isolate from mesh tests in the same worker

    batch, x, e, _, _ = _blocked_batch(2, 8, 16, 128)
    assert fused_gatedgcn_eligible(batch, x, e, 128, False)
    assert not fused_gatedgcn_eligible(batch, x, e, 128, True)   # ES-PE
    assert not fused_gatedgcn_eligible(batch, x, None, 128, False)
    # dim mismatch vs x's width (the layer always passes its own dim; any
    # width ≥64 is lane-eligible via the zero-pad wrapper since round 4)
    assert not fused_gatedgcn_eligible(batch, x, e, 64, False)
    flat = batch.replace(edge_block=None)
    assert not fused_gatedgcn_eligible(flat, x, e, 128, False)
