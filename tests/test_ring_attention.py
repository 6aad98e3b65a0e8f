"""Ring attention parity vs dense masked MHA on the simulated 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from graphgps_tpu.ops.mha import mha_core
from graphgps_tpu.parallel.ring_attention import ring_mha


def _mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))


def test_ring_matches_dense(rng):
    B, H, N, Dh = 2, 2, 64, 8   # N = 64 → 8 per device
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask_np = np.ones((B, N), bool)
    mask_np[0, 50:] = False
    mask_np[1, 10:30] = False
    mask = jnp.asarray(mask_np)

    dense = np.asarray(mha_core(q, k, v, mask))
    ring = np.asarray(ring_mha(q, k, v, mask, _mesh()))
    sel = lambda x: x.transpose(0, 2, 1, 3)[mask_np]
    np.testing.assert_allclose(sel(ring), sel(dense), rtol=1e-4, atol=1e-5)


def test_ring_grad_matches_dense(rng):
    B, H, N, Dh = 1, 1, 32, 4
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    mesh = _mesh()

    gd = jax.grad(lambda q: (mha_core(q, q, q, mask) ** 2).sum())(q)
    gr = jax.grad(lambda q: (ring_mha(q, q, q, mask, mesh) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), rtol=1e-3,
                               atol=1e-4)


def test_ring_under_jit(rng):
    B, H, N, Dh = 2, 2, 64, 8
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    mesh = _mesh()
    out = jax.jit(lambda q: ring_mha(q, q, q, mask, mesh))(q)
    ref = mha_core(q, q, q, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
