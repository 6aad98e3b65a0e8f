"""fused_combine_ffn (ops/pallas/fused_combine.py): the GPS branch-combine
+ FFN kernel must match the composition it replaces — fused_pre_tail (local
x-tail) + BN-apply (attention branch) + branch sum + fused_ffn — in values
and gradients (f32 interpret mode on CPU), and the GPSLayer must produce
identical losses/grads with the kernel on vs off."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _inputs(R=64, d=128, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x_in, v_loc, s_attn = f(R, d), f(R, d), f(R, d)
    mu_x, mu_a = f(d) * 0.1, f(d) * 0.1
    inv_x = jnp.abs(f(d)) + 0.5
    inv_a = jnp.abs(f(d)) + 0.5
    ga_x, ga_a = f(d) * 0.2 + 1.0, f(d) * 0.2 + 1.0
    be_x, be_a = f(d) * 0.1, f(d) * 0.1
    w1 = f(d, 2 * d) / np.sqrt(d)
    b1 = f(2 * d) * 0.05
    w2 = f(2 * d, d) / np.sqrt(2 * d)
    b2 = f(d) * 0.05
    return (x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
            ga_a, be_a, w1, b1, w2, b2)


def _reference(args, act):
    """The unfused composition (rate=0)."""
    (x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
     ga_a, be_a, w1, b1, w2, b2) = args
    from graphgps_tpu.models.common import get_act
    a = get_act(act)
    h_local = x_in + a((v_loc - mu_x) * inv_x * ga_x + be_x)
    h_attn = (s_attn - mu_a) * inv_a * ga_a + be_a
    h = h_local + h_attn
    return h + (a(h @ w1 + b1) @ w2 + b2)


@pytest.mark.parametrize("act", ["relu", "gelu"])
def test_combine_ffn_matches_reference(act):
    from graphgps_tpu.ops.pallas.fused_combine import fused_combine_ffn

    args = _inputs()
    seed = jnp.zeros((), jnp.int32)
    y = fused_combine_ffn(*args, seed, 0.0, act)
    ref = _reference(args, act)
    # gelu differs only by the kernel's rational-erf (|err| < 1.5e-7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_combine_ffn_grads_match_reference():
    from graphgps_tpu.ops.pallas.fused_combine import fused_combine_ffn

    args = _inputs(seed=3)
    seed = jnp.zeros((), jnp.int32)

    def loss_fused(*a):
        return jnp.sum(fused_combine_ffn(*a, seed, 0.0, "relu") ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference(a, "relu") ** 2)

    idx = tuple(range(15))
    g_f = jax.grad(loss_fused, argnums=idx)(*args)
    g_r = jax.grad(loss_ref, argnums=idx)(*args)
    for i, (a, b) in enumerate(zip(g_f, g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad arg {i}")


def test_combine_ffn_dropout_replay():
    """With dropout active the backward must replay the exact forward masks:
    for the pure drop-site chain, d(out)/d(b2) = diag mask of drop2."""
    from graphgps_tpu.ops.pallas.fused_combine import fused_combine_ffn

    args = _inputs(seed=5)
    seed = jnp.asarray(11, jnp.int32)
    rate = 0.3

    out = fused_combine_ffn(*args, seed, rate, "relu")
    assert np.isfinite(np.asarray(out)).all()

    b2 = args[14]

    def f(b2):
        a = args[:14] + (b2,)
        return jnp.sum(fused_combine_ffn(*a, seed, rate, "relu"))

    g = np.asarray(jax.grad(f)(b2))
    # d out / d b2 sums the drop2 keep*scale factors over rows: every entry
    # is a multiple of 1/(keep_prob) counts — integer multiples of the scale
    s = 1.0 / (1.0 - min(max(int(round(rate * 256)), 1), 255) / 256.0)
    frac = g / s
    np.testing.assert_allclose(frac, np.round(frac), atol=1e-4)
    # and some but not all entries dropped
    R = args[0].shape[0]
    assert (g.min() < s * R) and (g.max() > 0)


def test_gps_layer_combine_parity(monkeypatch):
    """GPSLayer (CustomGatedGCN+Transformer, batch_norm) with the combine
    kernel on vs off: identical loss and grads at dropout=0 (the kernel is
    exactly the composition it replaces; f32 interpret on CPU)."""
    from graphgps_tpu.models.gps_layer import GPSLayer
    from tests.test_fused_gatedgcn import _blocked_batch

    batch, x, e, nmask, emask = _blocked_batch(8, 8, 16, 128, seed=7)

    def build():
        return GPSLayer(dim_h=128, local_gnn_type="CustomGatedGCN",
                        global_model_type="Transformer", num_heads=4,
                        dropout=0.0, attn_dropout=0.0, batch_norm=True,
                        act="relu")

    def run(combine_on):
        if not combine_on:
            monkeypatch.setenv("GGPS_FUSED_COMBINE", "0")
        else:
            monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        layer = build()
        var = layer.init(jax.random.PRNGKey(0), batch, x, e, True)

        def loss(params):
            (xo, eo), _ = layer.apply(
                {"params": params, "batch_stats": var["batch_stats"]},
                batch, x, e, True, mutable=["batch_stats"])
            return (jnp.sum((xo * batch.node_mask[:, None]) ** 2)
                    + jnp.sum((eo * batch.edge_mask[:, None]) ** 2))

        val, g = jax.value_and_grad(loss)(var["params"])
        monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        return var, val, g

    var_on, val_on, g_on = run(True)
    var_off, val_off, g_off = run(False)

    # same param pytree both ways (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(var_on["params"])
            == jax.tree_util.tree_structure(var_off["params"]))
    np.testing.assert_allclose(float(val_on), float(val_off), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_on, g_off)


def test_gps_layer_combine_dispatches():
    """At an eligible shape the combine path actually runs (the layer must
    not silently fall back)."""
    from graphgps_tpu.models import gps_layer as G
    from tests.test_fused_gatedgcn import _blocked_batch

    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=9)
    called = {}
    import graphgps_tpu.ops.pallas.fused_combine as fc
    orig = fc.fused_combine_ffn_padded

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    fc.fused_combine_ffn_padded = spy
    try:
        layer = G.GPSLayer(dim_h=128, local_gnn_type="CustomGatedGCN",
                           global_model_type="Transformer", num_heads=4,
                           dropout=0.1, attn_dropout=0.1, batch_norm=True,
                           act="gelu")
        var = layer.init(jax.random.PRNGKey(1), batch, x, e, True)
        layer.apply({"params": var["params"],
                     "batch_stats": var["batch_stats"]},
                    batch, x, e, True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
    finally:
        fc.fused_combine_ffn_padded = orig
    assert called.get("yes"), "combine kernel did not dispatch"


def test_bn_ffn_matches_reference():
    """fused_bn_ffn == BN-apply -> FFN (residual on normed tensor,
    drop2=False) at rate 0, values and grads."""
    from graphgps_tpu.models.common import get_act
    from graphgps_tpu.ops.pallas.fused_combine import fused_bn_ffn

    rng = np.random.default_rng(11)
    R, d = 64, 128
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    s, mu = f(R, d), f(d) * 0.1
    inv = jnp.abs(f(d)) + 0.5
    ga, be = f(d) * 0.2 + 1.0, f(d) * 0.1
    w1, b1 = f(d, 2 * d) / np.sqrt(d), f(2 * d) * 0.05
    w2, b2 = f(2 * d, d) / np.sqrt(2 * d), f(d) * 0.05
    seed = jnp.zeros((), jnp.int32)
    a = get_act("relu")

    def ref(s, w1, w2, ga):
        h = (s - mu) * inv * ga + be
        return h + (a(h @ w1 + b1) @ w2 + b2)

    def fused(s, w1, w2, ga):
        return fused_bn_ffn(s, mu, inv, ga, be, w1, b1, w2, b2, seed,
                            0.0, "relu", False)

    np.testing.assert_allclose(np.asarray(fused(s, w1, w2, ga)),
                               np.asarray(ref(s, w1, w2, ga)),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(lambda *A: jnp.sum(fused(*A) ** 2), argnums=(0, 1, 2, 3))(
        s, w1, w2, ga)
    gr = jax.grad(lambda *A: jnp.sum(ref(*A) ** 2), argnums=(0, 1, 2, 3))(
        s, w1, w2, ga)
    for i, (x, y) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {i}")


def test_san_layer_bn_ffn_parity(monkeypatch):
    """SANLayer with the bn_ffn kernel on vs off: identical loss/grads at
    dropout=0; same param pytree."""
    from graphgps_tpu.models.san import SANLayer
    from tests.test_fused_gatedgcn import _blocked_batch

    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=13)

    def run(on):
        if not on:
            monkeypatch.setenv("GGPS_FUSED_COMBINE", "0")
        else:
            monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        layer = SANLayer(dim_h=128, num_heads=4, gamma=0.1, full_graph=True,
                         dropout=0.0, batch_norm=True, residual=True)
        var = layer.init(jax.random.PRNGKey(3), batch, x, e, True)

        def loss(params):
            (xo, _), _ = layer.apply(
                {"params": params, "batch_stats": var["batch_stats"]},
                batch, x, e, True, mutable=["batch_stats"])
            return jnp.sum((xo * batch.node_mask[:, None]) ** 2)

        val, g = jax.value_and_grad(loss)(var["params"])
        monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        return var, val, g

    var_on, val_on, g_on = run(True)
    var_off, val_off, g_off = run(False)
    assert (jax.tree_util.tree_structure(var_on["params"])
            == jax.tree_util.tree_structure(var_off["params"]))
    np.testing.assert_allclose(float(val_on), float(val_off), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=2e-4, atol=2e-4),
        g_on, g_off)


@pytest.mark.parametrize("d", [128, 80])
def test_ln_ffn_matches_reference(d):
    """fused_ln_ffn == LayerNorm -> Dense -> gelu -> Dense -> residual at
    rate 0, values and grads — including NON-lane-aligned width (masked-lane
    LN statistics must keep padding exact)."""
    from graphgps_tpu.ops.pallas.fused_combine import fused_ln_ffn_padded

    rng = np.random.default_rng(17)
    R = 64
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    h0 = f(R, d)
    ga, be = f(d) * 0.2 + 1.0, f(d) * 0.1
    w1, b1 = f(d, d) / np.sqrt(d), f(d) * 0.05
    w2, b2 = f(d, d) / np.sqrt(d), f(d) * 0.05
    seed = jnp.zeros((), jnp.int32)

    def ref(h0, w1, w2, ga):
        mu = h0.mean(axis=1, keepdims=True)
        xc = h0 - mu
        inv = jax.lax.rsqrt((xc * xc).mean(axis=1, keepdims=True) + 1e-6)
        h = xc * inv * ga + be
        z = jax.nn.gelu(h @ w1 + b1, approximate=False)
        return h0 + (z @ w2 + b2)

    def fused(h0, w1, w2, ga):
        return fused_ln_ffn_padded(h0, ga, be, w1, b1, w2, b2, seed,
                                   0.0, 0.0, "gelu")

    np.testing.assert_allclose(np.asarray(fused(h0, w1, w2, ga)),
                               np.asarray(ref(h0, w1, w2, ga)),
                               rtol=3e-5, atol=3e-5)
    gf = jax.grad(lambda *A: jnp.sum(fused(*A) ** 2), argnums=(0, 1, 2, 3))(
        h0, w1, w2, ga)
    gr = jax.grad(lambda *A: jnp.sum(ref(*A) ** 2), argnums=(0, 1, 2, 3))(
        h0, w1, w2, ga)
    for i, (x, y) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad {i} d={d}")


def test_graphormer_layer_ln_ffn_parity(monkeypatch):
    """GraphormerLayer with the ln_ffn kernel on vs off: identical output
    and grads at dropout=0; same param pytree."""
    from graphgps_tpu.models.graphormer import GraphormerLayer
    from tests.test_fused_gatedgcn import _blocked_batch

    batch, x, e, *_ = _blocked_batch(8, 8, 16, 128, seed=19)

    def run(on):
        if not on:
            monkeypatch.setenv("GGPS_FUSED_COMBINE", "0")
        else:
            monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        layer = GraphormerLayer(dim_h=128, num_heads=4, dropout=0.0,
                                attn_dropout=0.0, mlp_dropout=0.0)
        var = layer.init(jax.random.PRNGKey(5), batch, x, e, True)

        def loss(params):
            (xo, _), _ = layer.apply(
                {"params": params}, batch, x, e, True, mutable=[])
            return jnp.sum((xo * batch.node_mask[:, None]) ** 2)

        val, g = jax.value_and_grad(loss)(var["params"])
        monkeypatch.delenv("GGPS_FUSED_COMBINE", raising=False)
        return var, val, g

    var_on, val_on, g_on = run(True)
    var_off, val_off, g_off = run(False)
    assert (jax.tree_util.tree_structure(var_on["params"])
            == jax.tree_util.tree_structure(var_off["params"]))
    np.testing.assert_allclose(float(val_on), float(val_off), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=3e-4, atol=3e-4),
        g_on, g_off)
