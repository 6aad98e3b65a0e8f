"""Fused Pallas kernels under a pure-DP mesh (shard_map wrappers,
ops/pallas/spmd.py): outputs, weight grads (psum'd via the shard_map
transpose), and BatchNorm moment partials must match the single-device
fused path exactly (f32 interpret mode on the 8-device CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphgps_tpu.parallel.mesh import make_mesh, set_current_mesh

from tests.test_fused_gatedgcn import _blocked_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


@pytest.fixture
def dp_mesh_ctx():
    mesh = make_mesh(devices=jax.devices()[:8])   # (8 data, 1 model)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    set_current_mesh(mesh)
    yield mesh
    set_current_mesh(None)


def test_gatedgcn_layer_dp_parity(dp_mesh_ctx):
    """Full GatedGCNLayer (fused core + moments + fused tails) on the mesh
    vs single-device: loss, grads, batch_stats updates identical."""
    from graphgps_tpu.models.local_gnn import GatedGCNLayer

    batch, x, e, nmask, emask = _blocked_batch(8, 8, 16, 128, seed=11)
    layer = GatedGCNLayer(dim=128, dropout=0.0, residual=True,
                          batch_norm=True, act="gelu")

    def run(mesh_on):
        set_current_mesh(dp_mesh_ctx if mesh_on else None)
        try:
            var = layer.init(jax.random.PRNGKey(0), batch, x, e, True)

            def loss(params, x, e):
                (xo, eo), upd = layer.apply(
                    {"params": params, "batch_stats": var["batch_stats"]},
                    batch, x, e, True, mutable=["batch_stats"])
                nm = batch.node_mask[:, None]
                em = batch.edge_mask[:, None]
                return (jnp.sum((xo * nm) ** 2) + jnp.sum((eo * em) ** 2),
                        upd)

            (val, upd), g = jax.value_and_grad(loss, has_aux=True)(
                var["params"], x, e)
            return var, val, upd, g
        finally:
            set_current_mesh(dp_mesh_ctx)

    var_m, val_m, upd_m, g_m = run(mesh_on=True)
    var_s, val_s, upd_s, g_s = run(mesh_on=False)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        var_m, var_s)
    np.testing.assert_allclose(float(val_m), float(val_s), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        upd_m, upd_s)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        g_m, g_s)


def test_attention_spmd_parity(dp_mesh_ctx):
    from graphgps_tpu.ops.pallas.fused_gps_attn import (
        fused_gps_attention, fused_gps_attention_spmd)
    from tests.test_fused_attn import _setup

    B, N, d, H = 8, 16, 128, 4
    x, kmask, wqkv, bqkv, wo, bo = _setup(B, N, d, H, seed=5)
    seed = jnp.zeros((), jnp.int32)

    def loss(fn):
        def f(x, wqkv, wo):
            return jnp.sum((fn(x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0)
                            * kmask[..., None]) ** 2)
        return f

    y_m = fused_gps_attention_spmd(x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0)
    set_current_mesh(None)
    y_s = fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0)
    set_current_mesh(dp_mesh_ctx)

    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)

    g_m = jax.grad(loss(fused_gps_attention_spmd), argnums=(0, 1, 2))(
        x, wqkv, wo)
    set_current_mesh(None)
    g_s = jax.grad(loss(fused_gps_attention), argnums=(0, 1, 2))(x, wqkv, wo)
    set_current_mesh(dp_mesh_ctx)
    for a, b in zip(g_m, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_ffn_spmd_parity(dp_mesh_ctx):
    from graphgps_tpu.ops.pallas.fused_tail import fused_ffn, fused_ffn_spmd

    rng = np.random.default_rng(7)
    R, d = 64, 128
    h = jnp.asarray(rng.standard_normal((R, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, 2 * d)) / np.sqrt(d), jnp.float32)
    b1 = jnp.zeros((2 * d,))
    w2 = jnp.asarray(rng.standard_normal((2 * d, d)) / np.sqrt(2 * d),
                     jnp.float32)
    b2 = jnp.zeros((d,))
    seed = jnp.zeros((), jnp.int32)

    y_m = fused_ffn_spmd(h, w1, b1, w2, b2, seed, 0.0, "gelu")
    set_current_mesh(None)
    y_s = fused_ffn(h, w1, b1, w2, b2, seed, 0.0, "gelu")
    set_current_mesh(dp_mesh_ctx)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda h, w1, w2: jnp.sum(
            fn(h, w1, b1, w2, b2, seed, 0.0, "gelu") ** 2)

    g_m = jax.grad(loss(fused_ffn_spmd), argnums=(0, 1, 2))(h, w1, w2)
    set_current_mesh(None)
    g_s = jax.grad(loss(fused_ffn), argnums=(0, 1, 2))(h, w1, w2)
    set_current_mesh(dp_mesh_ctx)
    for a, b in zip(g_m, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_drop_add_spmd_mask_replay(dp_mesh_ctx):
    """Per-shard dropout streams are decorrelated but the backward still
    replays the exact forward mask: grad == (out - x_in) / v."""
    from graphgps_tpu.ops.pallas.fused_tail import fused_drop_add_spmd

    rng = np.random.default_rng(9)
    R, d = 64, 128
    x_in = jnp.asarray(rng.standard_normal((R, d)), jnp.float32)
    v = jnp.abs(jnp.asarray(rng.standard_normal((R, d)), jnp.float32)) + 0.5
    seed = jnp.asarray(3, jnp.int32)
    rate = 0.3

    out = fused_drop_add_spmd(x_in, v, seed, rate)
    eff = (np.asarray(out) - np.asarray(x_in)) / np.asarray(v)
    frac = float((eff == 0).mean())
    assert 0.15 < frac < 0.45
    # shards draw DIFFERENT masks (decorrelated seeds): the per-shard
    # dropped fractions must not all be identical patterns
    per_shard = (eff == 0).reshape(8, R // 8, d)
    assert not all(np.array_equal(per_shard[0], per_shard[i])
                   for i in range(1, 8))

    g = jax.grad(lambda v: jnp.sum(fused_drop_add_spmd(x_in, v, seed,
                                                       rate)))(v)
    np.testing.assert_allclose(np.asarray(g), eff, rtol=1e-4, atol=1e-5)


def test_wide_attention_spmd_parity(dp_mesh_ctx):
    from graphgps_tpu.ops.pallas.fused_attn_wide import (
        fused_wide_attention, fused_wide_attention_spmd)
    from tests.test_fused_attn_wide import _setup

    B, N, d, H = 8, 256, 128, 8
    x, wqkv3, bqkv2, wo, bo, kmask, counts = _setup(B, N, d, H, seed=21)
    wq = wqkv3.reshape(d, 3 * d)
    bq = bqkv2.reshape(3 * d)
    seed = jnp.zeros((), jnp.int32)
    scale = 1.0 / float(d // H) ** 0.5

    y_m = fused_wide_attention_spmd(x, counts, wq, bq, wo, bo, seed, H,
                                    scale, 0.0)
    set_current_mesh(None)
    y_s = fused_wide_attention(x, counts, wq, bq, wo, bo, seed, H,
                               scale, 0.0)
    set_current_mesh(dp_mesh_ctx)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def f(x, wq, wo):
            return jnp.sum((fn(x, counts, wq, bq, wo, bo, seed, H, scale,
                               0.0) * kmask[..., None]) ** 2)
        return f

    g_m = jax.grad(loss(fused_wide_attention_spmd), argnums=(0, 1, 2))(
        x, wq, wo)
    set_current_mesh(None)
    g_s = jax.grad(loss(fused_wide_attention), argnums=(0, 1, 2))(x, wq, wo)
    set_current_mesh(dp_mesh_ctx)
    for a, b in zip(g_m, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_edge_gate_kernel_spmd_bitexact(dp_mesh_ctx):
    """The strong guarantee at the kernel boundary: fused_edge_gate under
    the 8-way DP shard_map is BIT-IDENTICAL to the single-device call —
    forward outputs (gate, nd) and every input cotangent (dpd, dpeb, dce).
    All operands are batch-leading, so the wrapper has no replicated
    operands and its transpose inserts no psum; any sharding/transpose bug
    would break exact equality here."""
    from graphgps_tpu.ops.pallas.fused_edge_gate import (
        ET, fused_edge_gate, fused_edge_gate_spmd)

    B, N, E, d = 16, 128, 1024, 128
    batch, x, e, nmask, emask = _blocked_batch(B, N, E, d, seed=23)
    rng = np.random.default_rng(0)
    pd = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    peb = jnp.asarray(rng.standard_normal((B, N, 2 * d)), jnp.float32)
    T = E // ET
    ce = jnp.asarray(rng.standard_normal((B, T, ET, d)), jnp.float32)
    base = (np.arange(B) * N)[:, None]
    s2 = jnp.asarray((np.asarray(batch.senders).reshape(B, E) - base)
                     .reshape(B, T, ET), jnp.int32)
    r2 = jnp.asarray((np.asarray(batch.receivers).reshape(B, E) - base)
                     .reshape(B, T, ET), jnp.int32)
    em2 = jnp.asarray(np.asarray(batch.edge_mask).reshape(B, T, ET),
                      jnp.float32)

    def loss(fn, pd, peb, ce):
        gate, nd = fn(pd, peb, ce, s2, r2, em2)
        return jnp.sum(gate ** 2) + jnp.sum(nd ** 2)

    out_m = fused_edge_gate_spmd(pd, peb, ce, s2, r2, em2)
    g_m = jax.grad(loss, argnums=(1, 2, 3))(fused_edge_gate_spmd,
                                            pd, peb, ce)
    set_current_mesh(None)
    out_s = fused_edge_gate(pd, peb, ce, s2, r2, em2)
    g_s = jax.grad(loss, argnums=(1, 2, 3))(fused_edge_gate, pd, peb, ce)
    set_current_mesh(dp_mesh_ctx)

    for a, b in list(zip(out_m, out_s)) + list(zip(g_m, g_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_edge_gate_spmd_parity(dp_mesh_ctx, monkeypatch):
    """Edge-gate rung on the DP mesh, full GatedGCNLayer. The kernel itself
    is bit-exact under the shard_map (test above); the ONLY deviation in the
    layer's weight grads is XLA's reduction over the now-SHARDED cotangent
    arrays when it sums the outside Dense kernel/bias grads — per-shard
    partial sums + combine instead of one contiguous sum. That is exactly
    DP gradient-allreduce semantics (SURVEY §2.10, reference DDP has the
    same property) and is pure f32 reassociation, so a fixed atol on
    near-cancelling bias elements is the wrong assertion (round-4 red test:
    1/128 elements, 4.3e-4 on a grad of 0.028 summed from ~13k O(1) terms;
    unchanged under GGPS_FUSED_DOT_F32=1, i.e. not bf16).

    The right assertion, used here: compare BOTH paths against a float64
    pure-XLA oracle and require the mesh path's error to be the same order
    as the single-device fused path's own f32 noise (measured ratios
    0.60–1.32 across all 14 leaves). A psum-placement bug (dropped or
    double-counted shard) would give errors the size of the grads
    themselves — 1000× over this bound."""
    from graphgps_tpu.models.local_gnn import GatedGCNLayer
    from graphgps_tpu.ops.pallas.fused_edge_gate import edge_gate_eligible

    batch, x, e, nmask, emask = _blocked_batch(16, 128, 1024, 128, seed=23)
    assert edge_gate_eligible(batch, x, e, 128, False)
    layer = GatedGCNLayer(dim=128, dropout=0.0, residual=True,
                          batch_norm=True, act="relu")
    var = layer.init(jax.random.PRNGKey(2), batch, x, e, True)

    def run(mesh_on, f64=False, fused=True):
        if not fused:
            monkeypatch.setenv("GGPS_FUSED_GGCN", "0")
            monkeypatch.setenv("GGPS_FUSED_TAIL", "0")
        try:
            set_current_mesh(dp_mesh_ctx if mesh_on else None)
            dt = jnp.float64 if f64 else jnp.float32
            v = jax.tree_util.tree_map(lambda a: a.astype(dt), var)
            xx, ee = x.astype(dt), e.astype(dt)

            def loss(params):
                (xo, eo), _ = layer.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    batch, xx, ee, True, mutable=["batch_stats"])
                return (jnp.sum((xo * batch.node_mask[:, None]) ** 2)
                        + jnp.sum((eo * batch.edge_mask[:, None]) ** 2))

            return jax.value_and_grad(loss)(v["params"])
        finally:
            set_current_mesh(dp_mesh_ctx)
            monkeypatch.delenv("GGPS_FUSED_GGCN", raising=False)
            monkeypatch.delenv("GGPS_FUSED_TAIL", raising=False)

    val_m, g_m = run(True)
    val_s, g_s = run(False)
    with jax.enable_x64(True):
        val_o, g_o = run(False, f64=True, fused=False)

    np.testing.assert_allclose(float(val_m), float(val_s), rtol=1e-5)
    np.testing.assert_allclose(float(val_m), float(val_o), rtol=1e-5)

    def check(path, a, b, o):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        o = np.asarray(o, np.float64)
        err_m = np.abs(a - o).max()
        err_s = np.abs(b - o).max()
        bound = 4.0 * err_s + 1e-6 * max(1.0, np.abs(o).max())
        assert err_m <= bound, (
            f"{jax.tree_util.keystr(path)}: DP-mesh error vs f64 oracle "
            f"{err_m:.3e} exceeds 4x the single-device f32 noise "
            f"{err_s:.3e} — not reassociation, investigate the shard_map "
            f"transpose")

    paths_m = jax.tree_util.tree_leaves_with_path(g_m)
    for (path, a), b, o in zip(paths_m, jax.tree_util.tree_leaves(g_s),
                               jax.tree_util.tree_leaves(g_o)):
        check(path, a, b, o)
