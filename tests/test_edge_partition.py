"""Edge-partitioned segment-sum: fwd+bwd parity vs single-device on the
simulated 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from graphgps_tpu.parallel.edge_partition import edge_partitioned_segment_sum


def _mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))


def test_forward_parity(rng):
    E, S, D = 64, 20, 4
    ids = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    mask = jnp.asarray(rng.random(E) > 0.3)
    ref = jax.ops.segment_sum(jnp.where(mask[:, None], data, 0), ids,
                              num_segments=S)
    out = edge_partitioned_segment_sum(data, ids, S, _mesh(), mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_gradient_parity(rng):
    """Boundary-node gradients must match: a node receiving messages from edge
    shards on several chips accumulates all of them."""
    E, S, D = 32, 6, 4   # few segments → every chip touches every node
    ids = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    mesh = _mesh()

    g_ref = jax.grad(lambda d: (jax.ops.segment_sum(
        d, ids, num_segments=S) ** 2).sum())(data)
    g_ep = jax.grad(lambda d: (edge_partitioned_segment_sum(
        d, ids, S, mesh) ** 2).sum())(data)
    np.testing.assert_allclose(np.asarray(g_ep), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


def test_under_jit(rng):
    E, S, D = 64, 12, 8
    ids = jnp.asarray(np.sort(rng.integers(0, S, E)).astype(np.int32))
    data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    mesh = _mesh()
    out = jax.jit(lambda d: edge_partitioned_segment_sum(d, ids, S, mesh))(data)
    ref = jax.ops.segment_sum(data, ids, num_segments=S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
