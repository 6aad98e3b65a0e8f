"""Fused GPS attention kernel (ops/pallas/fused_gps_attn.py) vs the unfused
XLA reference path: fwd and all grads, several recipe shapes.

On CPU the kernel runs in Pallas interpret mode — same math, no Mosaic — so
these tests guard the formulation (head packing, segmented softmax, custom
VJP) everywhere; the TPU-compiled kernel is additionally exercised by the
device A/B in tools/ab_fused_attn.py and the fused-vs-dense loss parity test
below when a TPU is present.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ref_attention(x, kmask, wqkv, bqkv, wo, bo, H):
    """Unfused reference: same math as gps_layer's XLA path."""
    B, N, d = x.shape
    Dh = d // H
    qkv = x @ wqkv + bqkv
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]

    def heads(t):
        return t.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q / np.sqrt(Dh), k)
    logits = jnp.where(kmask[:, None, None, :] > 0, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, d)
    return o @ wo + bo


def _setup(B, N, d, H, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) / np.sqrt(d),
                       jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * d,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.float32)
    bo = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    # ragged masks incl. one very small graph
    nreal = rng.integers(max(1, N // 4), N + 1, size=(B,))
    nreal[0] = max(1, N // 8)
    kmask = jnp.asarray((np.arange(N)[None, :] < nreal[:, None])
                        .astype(np.float32))
    return x, kmask, wqkv, bqkv, wo, bo


@pytest.mark.parametrize("shape", [
    (4, 32, 256, 8),    # pcqm-deep
    (8, 40, 128, 4),    # zinc-ish (lane-aligned d)
    (2, 128, 128, 8),   # envelope max N
    (3, 16, 256, 16),   # many heads
])
def test_fused_matches_reference_fwd_bwd(shape):
    from graphgps_tpu.ops.pallas.fused_gps_attn import fused_gps_attention

    B, N, d, H = shape
    x, kmask, wqkv, bqkv, wo, bo = _setup(B, N, d, H)
    seed = jnp.zeros((), jnp.int32)

    y_ref = _ref_attention(x, kmask, wqkv, bqkv, wo, bo, H)
    y = fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0)
    # compare only real-node rows (padded query rows produce garbage in both
    # paths and are masked downstream by the layer)
    m = np.asarray(kmask) > 0
    np.testing.assert_allclose(np.asarray(y)[m], np.asarray(y_ref)[m],
                               rtol=2e-4, atol=2e-4)

    # grads: scalar loss over masked rows → every input's gradient
    def loss(fn):
        def f(x, wqkv, bqkv, wo, bo):
            out = fn(x, wqkv, bqkv, wo, bo)
            return jnp.sum((out * kmask[..., None]) ** 2)
        return f

    g_ref = jax.grad(loss(lambda *a: _ref_attention(
        a[0], kmask, a[1], a[2], a[3], a[4], H)), argnums=(0, 1, 2, 3, 4))(
        x, wqkv, bqkv, wo, bo)
    g_fus = jax.grad(loss(lambda *a: fused_gps_attention(
        a[0], kmask, a[1], a[2], a[3], a[4], seed, H, 0.0)),
        argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wo, bo)
    names = ["dx", "dwqkv", "dbqkv", "dwo", "dbo"]
    for nm, a, b in zip(names, g_fus, g_ref):
        sc = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-4, atol=3e-4, err_msg=nm)


def test_dropout_train_eval_and_determinism():
    """rate>0: deterministic given seed, ~rate zeros in attention, unbiased
    scale; fwd/bwd keep masks agree (grad finite + repeatable)."""
    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_* has no interpret-mode implementation")
    from graphgps_tpu.ops.pallas.fused_gps_attn import fused_gps_attention

    B, N, d, H = 4, 32, 256, 8
    x, kmask, wqkv, bqkv, wo, bo = _setup(B, N, d, H, seed=3)
    s1 = jnp.asarray(17, jnp.int32)
    y1 = fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, s1, H, 0.5)
    y2 = fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, s1, H, 0.5)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo,
                             jnp.asarray(18, jnp.int32), H, 0.5)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))

    g = jax.grad(lambda xx: jnp.sum(fused_gps_attention(
        xx, kmask, wqkv, bqkv, wo, bo, s1, H, 0.5) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_gps_layer_fused_impl_matches_auto():
    """GPSLayer(attn_impl='fused') == GPSLayer(attn_impl='auto') with the
    same params, eval mode (no dropout), on the flat batch API."""
    if jax.default_backend() != "tpu":
        pytest.skip("fused impl gated to TPU in GPSLayer")
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.models.gps_layer import GPSLayer

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 8
    cfg.dataset.synth_min_nodes = 10
    cfg.dataset.synth_max_nodes = 24
    ds = load_dataset(cfg)
    gb = next(iter(BatchLoader(ds.train, batch_size=8,
                               shuffle=False))).to_graph_batch()
    d = 128
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (gb.num_node_slots, d)), jnp.float32)
    kw = dict(dim_h=d, local_gnn_type="None", global_model_type="Transformer",
              num_heads=8)
    la = GPSLayer(attn_impl="auto", **kw)
    lf = GPSLayer(attn_impl="fused", **kw)
    va = la.init(jax.random.PRNGKey(0), gb, x, None, False)
    ya, _ = la.apply(va, gb, x, None, False)
    yf, _ = lf.apply(va, gb, x, None, False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ya),
                               rtol=2e-4, atol=2e-4)
