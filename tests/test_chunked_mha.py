"""Chunked online-softmax attention (ops/chunked_mha.py): the dropout-capable
flash-memory-class rung of the attention ladder."""
import jax
import jax.numpy as jnp
import numpy as np

from graphgps_tpu.ops.chunked_mha import chunked_mha
from graphgps_tpu.ops.mha import mha_core


def _inputs(rng, B=2, H=2, N=256, Dh=16):
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask_np = np.ones((B, N), bool)
    mask_np[0, 200:] = False
    mask_np[1, 60:110] = False
    return q, k, v, jnp.asarray(mask_np), mask_np


def test_no_dropout_matches_dense(rng):
    q, k, v, mask, mask_np = _inputs(rng)
    dense = np.asarray(mha_core(q, k, v, mask))
    chunked = np.asarray(chunked_mha(q, k, v, mask, chunk=64))
    sel = lambda x: x.transpose(0, 2, 1, 3)[mask_np]
    np.testing.assert_allclose(sel(chunked), sel(dense), rtol=1e-4, atol=1e-5)


def test_bias_matches_dense(rng):
    q, k, v, mask, mask_np = _inputs(rng, N=128)
    bias = jnp.asarray(rng.normal(size=(2, 2, 128, 128)).astype(np.float32))
    dense = np.asarray(mha_core(q, k, v, mask, bias=bias))
    chunked = np.asarray(chunked_mha(q, k, v, mask, bias=bias, chunk=32))
    sel = lambda x: x.transpose(0, 2, 1, 3)[mask_np]
    np.testing.assert_allclose(sel(chunked), sel(dense), rtol=1e-4, atol=1e-5)


def test_gradient_matches_dense(rng):
    q, k, v, mask, _ = _inputs(rng, N=128)

    gd = jax.grad(lambda q: (mha_core(q, k, v, mask) ** 2).sum())(q)
    gc = jax.grad(lambda q: (chunked_mha(q, k, v, mask, chunk=32) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), rtol=1e-3,
                               atol=1e-4)


def test_dropout_statistics_and_determinism(rng):
    q, k, v, mask, mask_np = _inputs(rng)
    key = jax.random.PRNGKey(0)
    o1 = np.asarray(chunked_mha(q, k, v, mask, dropout_rate=0.3,
                                dropout_rng=key, chunk=64))
    o2 = np.asarray(chunked_mha(q, k, v, mask, dropout_rate=0.3,
                                dropout_rng=key, chunk=64))
    np.testing.assert_array_equal(o1, o2)  # deterministic given the rng
    o3 = np.asarray(chunked_mha(q, k, v, mask, dropout_rate=0.3,
                                dropout_rng=jax.random.PRNGKey(1), chunk=64))
    assert np.abs(o1 - o3).max() > 1e-6    # different rng → different mask
    # inverted-dropout scaling keeps the expectation: average over many rngs
    outs = [np.asarray(chunked_mha(q, k, v, mask, dropout_rate=0.3,
                                   dropout_rng=jax.random.PRNGKey(s),
                                   chunk=64)) for s in range(24)]
    base = np.asarray(chunked_mha(q, k, v, mask, chunk=64))
    sel = lambda x: x.transpose(0, 2, 1, 3)[mask_np]
    err = np.abs(sel(np.mean(outs, 0)) - sel(base)).mean()
    assert err < 0.05, err


def test_dropout_gradients_finite_and_nonzero(rng):
    q, k, v, mask, _ = _inputs(rng, N=128)
    key = jax.random.PRNGKey(2)

    g = jax.grad(lambda q: (chunked_mha(
        q, k, v, mask, dropout_rate=0.5, dropout_rng=key, chunk=32) ** 2
    ).sum())(q)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_dispatch_uses_chunked_for_dropout_at_scale(monkeypatch):
    import graphgps_tpu.ops.chunked_mha as cm
    import graphgps_tpu.ops.pallas.flash_mha as fm

    calls = []
    real = cm.chunked_mha
    monkeypatch.setattr(cm, "chunked_mha",
                        lambda *a, **k: calls.append("chunked") or real(*a, **k))
    monkeypatch.setattr(fm, "flash_available", lambda n, d: n >= 256)
    rng = np.random.default_rng(0)
    n = fm._DENSE_MAX_N * 2  # above the measured dense ceiling
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    mask = jnp.ones((1, n), bool)
    fm.mha(q, q, q, mask, dropout_rate=0.5,
           dropout_rng=jax.random.PRNGKey(0))
    assert calls == ["chunked"]
