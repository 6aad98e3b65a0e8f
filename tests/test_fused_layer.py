"""fused_gps_front (ops/pallas/fused_layer.py): the merged GatedGCN-core +
attention kernel must reproduce the unmerged kernel pipeline exactly —
full GPSLayer loss/grads/batch_stats parity with the merged front forced
on vs off (f32 interpret on CPU), identical param pytrees, and clean
fallback outside its envelope."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_fused_gatedgcn import _blocked_batch


def _layer(dropout=0.0, attn_dropout=0.0, act="relu"):
    from graphgps_tpu.models.gps_layer import GPSLayer

    return GPSLayer(dim_h=128, local_gnn_type="CustomGatedGCN",
                    global_model_type="Transformer", num_heads=4,
                    dropout=dropout, attn_dropout=attn_dropout,
                    batch_norm=True, act=act)


def _run(layer, batch, x, e, monkeypatch, front_on, seed=0):
    monkeypatch.setenv("GGPS_FUSED_FRONT", "1" if front_on else "0")
    try:
        var = layer.init(jax.random.PRNGKey(seed), batch, x, e, True)

        def loss(params):
            (xo, eo), upd = layer.apply(
                {"params": params, "batch_stats": var["batch_stats"]},
                batch, x, e, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)})
            return (jnp.sum((xo * batch.node_mask[:, None]) ** 2)
                    + jnp.sum((eo * batch.edge_mask[:, None]) ** 2)), upd

        (val, upd), g = jax.value_and_grad(loss, has_aux=True)(
            var["params"])
        return var, val, upd, g
    finally:
        monkeypatch.delenv("GGPS_FUSED_FRONT", raising=False)


@pytest.mark.parametrize("act", ["relu", "gelu"])
def test_gps_layer_front_parity(monkeypatch, act):
    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=31)
    layer = _layer(act=act)

    var_m, val_m, upd_m, g_m = _run(layer, batch, x, e, monkeypatch, True)
    var_s, val_s, upd_s, g_s = _run(layer, batch, x, e, monkeypatch, False)

    assert (jax.tree_util.tree_structure(var_m["params"])
            == jax.tree_util.tree_structure(var_s["params"]))
    np.testing.assert_allclose(float(val_m), float(val_s), rtol=1e-5)
    # running-stat updates (x/e/attn norms) must match
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        upd_m, upd_s)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        g_m, g_s)


def test_front_dispatches(monkeypatch):
    import graphgps_tpu.ops.pallas.fused_layer as fl

    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=33)
    called = {}
    orig = fl.fused_gps_front_spmd

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fl, "fused_gps_front_spmd", spy)
    monkeypatch.setenv("GGPS_FUSED_FRONT", "1")
    layer = _layer(dropout=0.1, attn_dropout=0.1, act="gelu")
    var = layer.init(jax.random.PRNGKey(2), batch, x, e, True)
    (xo, eo), _ = layer.apply(
        {"params": var["params"], "batch_stats": var["batch_stats"]},
        batch, x, e, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert called.get("yes"), "merged front kernel did not dispatch"
    assert np.isfinite(np.asarray(xo)).all()
    assert np.isfinite(np.asarray(eo)).all()


def test_front_dropout_grads_finite(monkeypatch):
    monkeypatch.setenv("GGPS_FUSED_FRONT", "1")
    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=35)
    layer = _layer(dropout=0.2, attn_dropout=0.3, act="gelu")
    var = layer.init(jax.random.PRNGKey(4), batch, x, e, True)

    def loss(params, x, e):
        (xo, eo), _ = layer.apply(
            {"params": params, "batch_stats": var["batch_stats"]},
            batch, x, e, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(9)})
        return (jnp.sum((xo * batch.node_mask[:, None]) ** 2)
                + jnp.sum((eo * batch.edge_mask[:, None]) ** 2))

    val, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(var["params"], x, e)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_front_falls_back_cleanly(monkeypatch):
    """d=96 (not lane-aligned) is outside the merged envelope — the layer
    must fall back to the unmerged pipeline without error or double param
    creation."""
    from graphgps_tpu.models.gps_layer import GPSLayer

    monkeypatch.setenv("GGPS_FUSED_FRONT", "1")
    batch, x, e, *_ = _blocked_batch(8, 8, 16, 96, seed=37)
    layer = GPSLayer(dim_h=96, local_gnn_type="CustomGatedGCN",
                     global_model_type="Transformer", num_heads=4,
                     dropout=0.1, attn_dropout=0.0, batch_norm=True,
                     act="relu")
    var = layer.init(jax.random.PRNGKey(5), batch, x, e, True)
    (xo, eo), _ = layer.apply(
        {"params": var["params"], "batch_stats": var["batch_stats"]},
        batch, x, e, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(11)})
    assert np.isfinite(np.asarray(xo)).all()
