"""Fused tail kernels (ops/pallas/fused_tail.py) vs the XLA formulations:
fwd and grads in Pallas interpret mode on CPU, plus layer-level parity of
GatedGCNLayer / GPSLayer with the fused tails forced off vs on (dropout 0 —
with dropout the paths draw different bits by design)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("act", ["relu", "gelu", "identity"])
def test_pre_tail_matches_xla(act):
    from graphgps_tpu.models.common import get_act
    from graphgps_tpu.ops.pallas.fused_tail import fused_pre_tail

    rng = np.random.default_rng(0)
    R, d = 64, 128
    x_in, v = _rand(rng, R, d), _rand(rng, R, d)
    mu, beta = _rand(rng, d) * 0.1, _rand(rng, d) * 0.1
    inv = jnp.abs(_rand(rng, d)) + 0.5
    gamma = _rand(rng, d) * 0.5 + 1.0
    seed = jnp.zeros((), jnp.int32)

    def ref(x_in, v, mu, inv, gamma, beta):
        return x_in + get_act(act)((v - mu) * inv * gamma + beta)

    y = fused_pre_tail(x_in, v, mu, inv, gamma, beta, seed, 0.0, act)
    y_ref = ref(x_in, v, mu, inv, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g = jax.grad(loss(lambda *a: fused_pre_tail(*a, seed, 0.0, act)),
                 argnums=tuple(range(6)))(x_in, v, mu, inv, gamma, beta)
    g_ref = jax.grad(loss(ref), argnums=tuple(range(6)))(
        x_in, v, mu, inv, gamma, beta)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_drop_add_mask_replay():
    """The backward regenerates the exact forward keep mask: grad wrt v must
    equal (out - x_in) / v elementwise (0 where dropped, s where kept)."""
    from graphgps_tpu.ops.pallas.fused_tail import fused_drop_add

    rng = np.random.default_rng(1)
    R, d = 64, 128
    x_in = _rand(rng, R, d)
    v = jnp.abs(_rand(rng, R, d)) + 0.5
    seed = jnp.asarray(7, jnp.int32)
    rate = 0.3

    out = fused_drop_add(x_in, v, seed, rate)
    eff = (out - x_in) / v                     # keep * 1/(1-p) pattern
    frac = float((np.asarray(eff) == 0).mean())
    assert 0.15 < frac < 0.45                  # ~rate dropped

    g = jax.grad(lambda v: jnp.sum(fused_drop_add(x_in, v, seed, rate)))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(eff),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "gelu"])
def test_ffn_matches_xla(act):
    from graphgps_tpu.models.common import get_act
    from graphgps_tpu.ops.pallas.fused_tail import fused_ffn

    rng = np.random.default_rng(2)
    R, d = 64, 128
    h = _rand(rng, R, d)
    w1 = _rand(rng, d, 2 * d) / np.sqrt(d)
    b1 = _rand(rng, 2 * d) * 0.1
    w2 = _rand(rng, 2 * d, d) / np.sqrt(2 * d)
    b2 = _rand(rng, d) * 0.1
    seed = jnp.zeros((), jnp.int32)

    def ref(h, w1, b1, w2, b2):
        return h + (get_act(act)(h @ w1 + b1) @ w2 + b2)

    y = fused_ffn(h, w1, b1, w2, b2, seed, 0.0, act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(h, w1, b1, w2, b2)),
                               rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g = jax.grad(loss(lambda *a: fused_ffn(*a, seed, 0.0, act)),
                 argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_gatedgcn_fused_tail_layer_parity():
    """GatedGCNLayer with batch_norm=True: fused tail vs XLA tail, train mode
    (live BN batch stats), dropout 0. Outputs, grads, and the batch_stats
    variable updates must agree; param/variable names identical."""
    from tests.test_fused_gatedgcn import _blocked_batch
    from graphgps_tpu.models.local_gnn import GatedGCNLayer

    batch, x, e, nmask, emask = _blocked_batch(2, 32, 64, 256, seed=3)
    layer = GatedGCNLayer(dim=256, dropout=0.0, residual=True,
                          batch_norm=True, act="gelu")

    def run(off):
        os.environ["GGPS_FUSED_TAIL"] = "0" if off else "1"
        try:
            var = layer.init(jax.random.PRNGKey(0), batch, x, e, True)

            def loss(params, x, e):
                (xo, eo), upd = layer.apply(
                    {"params": params,
                     "batch_stats": var["batch_stats"]},
                    batch, x, e, True, mutable=["batch_stats"])
                nm = batch.node_mask[:, None]
                em = batch.edge_mask[:, None]
                return (jnp.sum((xo * nm) ** 2) + jnp.sum((eo * em) ** 2),
                        upd)

            (val, upd), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                               has_aux=True)(
                var["params"], x, e)
            return var, val, upd, g
        finally:
            os.environ.pop("GGPS_FUSED_TAIL", None)

    var_f, val_f, upd_f, g_f = run(off=False)
    var_u, val_u, upd_u, g_u = run(off=True)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_f, var_u)
    np.testing.assert_allclose(float(val_f), float(val_u), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        upd_f, upd_u)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3),
        g_f, g_u)


def test_gps_layer_ffn_parity():
    """Full GPSLayer (CustomGatedGCN+Transformer, d=256): all fused paths on
    vs all off, dropout 0, train mode. Loss and param grads agree."""
    from tests.test_fused_gatedgcn import _blocked_batch
    from graphgps_tpu.models.gps_layer import GPSLayer

    batch, x, e, nmask, emask = _blocked_batch(2, 32, 64, 256, seed=4)
    layer = GPSLayer(dim_h=256, local_gnn_type="CustomGatedGCN",
                     global_model_type="Transformer", num_heads=8,
                     act="gelu", dropout=0.0, attn_dropout=0.0,
                     batch_norm=True, layer_norm=False)

    def run(off):
        for k in ("GGPS_FUSED_TAIL", "GGPS_FUSED_GGCN"):
            os.environ[k] = "0" if off else "1"
        try:
            var = layer.init(jax.random.PRNGKey(0), batch, x, e, True)

            def loss(params):
                out, _ = layer.apply(
                    {"params": params, "batch_stats": var["batch_stats"]},
                    batch, x, e, True, mutable=["batch_stats"])
                h, _e = out
                return jnp.sum((h * batch.node_mask[:, None]) ** 2)

            val, g = jax.value_and_grad(loss)(var["params"])
            return var, val, g
        finally:
            for k in ("GGPS_FUSED_TAIL", "GGPS_FUSED_GGCN"):
                os.environ.pop(k, None)

    var_f, val_f, g_f = run(off=False)
    var_u, val_u, g_u = run(off=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_f["params"], var_u["params"])
    np.testing.assert_allclose(float(val_f), float(val_u), rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3),
        g_f, g_u)


def test_san_ffn_fused_parity():
    """SANLayer's FFN through the fused kernel (drop2=False) vs the XLA
    path: outputs and grads at d=128, dropout 0."""
    from tests.test_fused_gatedgcn import _blocked_batch
    from graphgps_tpu.models.san import SANLayer

    batch, x, e, nmask, emask = _blocked_batch(2, 16, 32, 128, seed=6)
    layer = SANLayer(dim_h=128, num_heads=4, gamma=0.1, full_graph=True,
                     dropout=0.0, batch_norm=True)

    def run(off):
        os.environ["GGPS_FUSED_TAIL"] = "0" if off else "1"
        try:
            var = layer.init(jax.random.PRNGKey(1), batch, x, e, True)

            def loss(params):
                out, _ = layer.apply(
                    {"params": params, "batch_stats": var["batch_stats"]},
                    batch, x, e, True, mutable=["batch_stats"])
                h, _e = out
                return jnp.sum((h * batch.node_mask[:, None]) ** 2)

            val, g = jax.value_and_grad(loss)(var["params"])
            return var, val, g
        finally:
            os.environ.pop("GGPS_FUSED_TAIL", None)

    var_f, val_f, g_f = run(off=False)
    var_u, val_u, g_u = run(off=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_f["params"], var_u["params"])
    np.testing.assert_allclose(float(val_f), float(val_u), rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3),
        g_f, g_u)
