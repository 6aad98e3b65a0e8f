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


# ---------------------------------------------------------------------------
# North-star partitioning: node shards + boundary all-to-all
# (edge_partitioned_aggregate; VERDICT round-1 item 5)
# ---------------------------------------------------------------------------

from graphgps_tpu.parallel.edge_partition import (  # noqa: E402
    edge_partitioned_aggregate, plan_edge_partition)


def _random_graph(rng, V=100, E=400):
    s = rng.integers(0, V, E).astype(np.int64)
    r = rng.integers(0, V, E).astype(np.int64)
    return np.stack([s, r])


def _dense_ref(x, ei, efeat, msg_fn, V):
    s, r = ei
    msgs = msg_fn(x[s], x[r], efeat[s * 0 + np.arange(len(s))] if efeat
                  is not None else None)
    return jax.ops.segment_sum(msgs, jnp.asarray(r), num_segments=V)


def test_plan_covers_every_edge(rng):
    ei = _random_graph(rng)
    plan = plan_edge_partition(ei, 100, 8)
    n_real = int(plan.int_mask.sum() + plan.bnd_mask.sum())
    assert n_real == ei.shape[1]
    # every real boundary edge's sender reference lands in a sent slot
    sent = plan.send_mask.transpose(1, 0, 2).reshape(plan.num_devices, -1)
    for dev in range(plan.num_devices):
        refs = plan.bnd_send[dev][plan.bnd_mask[dev]]
        # inbox slot src*K+k is filled iff src actually sent slot k to this dev
        assert plan.send_mask[dev].reshape(-1)[refs].all()


def test_aggregate_forward_parity(rng):
    V, E, D = 100, 400, 8
    ei = _random_graph(rng, V, E)
    plan = plan_edge_partition(ei, V, 8)
    Vp = plan.padded_nodes
    x = np.zeros((Vp, D), np.float32)
    x[:V] = rng.normal(size=(V, D))
    mesh = _mesh()

    out = edge_partitioned_aggregate(jnp.asarray(x), None, plan, mesh)
    ref = jax.ops.segment_sum(jnp.asarray(x[ei[0]]), jnp.asarray(ei[1]),
                              num_segments=Vp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_aggregate_gated_message_with_edge_feats(rng):
    """GatedGCN-style gated message σ(e)·x_s with per-edge features and a
    receiver term — exercises sender gather, receiver gather, and edge-id
    indexing together."""
    V, E, D = 60, 240, 4
    ei = _random_graph(rng, V, E)
    efeat = rng.normal(size=(E, D)).astype(np.float32)
    plan = plan_edge_partition(ei, V, 8)
    Vp = plan.padded_nodes
    x = np.zeros((Vp, D), np.float32)
    x[:V] = rng.normal(size=(V, D))
    mesh = _mesh()

    def msg(x_s, x_r, e):
        return jax.nn.sigmoid(e) * x_s + 0.25 * x_r

    out = edge_partitioned_aggregate(jnp.asarray(x), jnp.asarray(efeat), plan,
                                     mesh, msg_fn=msg)
    s, r = ei
    ref_msgs = jax.nn.sigmoid(jnp.asarray(efeat)) * jnp.asarray(x[s]) \
        + 0.25 * jnp.asarray(x[r])
    ref = jax.ops.segment_sum(ref_msgs, jnp.asarray(r), num_segments=Vp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_aggregate_cut_edge_gradients_exact(rng):
    """d loss/d x must accumulate contributions from edges owned by OTHER
    devices (the all_to_all transpose scatter-adds into the sender shard)."""
    V, E, D = 64, 256, 4
    ei = _random_graph(rng, V, E)
    plan = plan_edge_partition(ei, V, 8)
    Vp = plan.padded_nodes
    x = np.zeros((Vp, D), np.float32)
    x[:V] = rng.normal(size=(V, D))
    mesh = _mesh()

    def loss_ep(xx):
        return (edge_partitioned_aggregate(xx, None, plan, mesh) ** 2).sum()

    def loss_ref(xx):
        agg = jax.ops.segment_sum(xx[ei[0]], jnp.asarray(ei[1]),
                                  num_segments=Vp)
        return (agg ** 2).sum()

    g_ep = jax.grad(loss_ep)(jnp.asarray(x))
    g_ref = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_ep), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-4)


def test_aggregate_under_jit_with_sharded_nodes(rng):
    """The aggregate composes with jit + NamedSharding node shards (the
    production giant-graph configuration)."""
    from jax.sharding import NamedSharding, PartitionSpec

    V, E, D = 80, 320, 4
    ei = _random_graph(rng, V, E)
    plan = plan_edge_partition(ei, V, 8)
    Vp = plan.padded_nodes
    x = np.zeros((Vp, D), np.float32)
    x[:V] = rng.normal(size=(V, D))
    mesh = _mesh()
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, PartitionSpec("data", None)))

    @jax.jit
    def step(xx):
        agg = edge_partitioned_aggregate(xx, None, plan, mesh)
        return agg * 2.0

    out = step(xs)
    ref = jax.ops.segment_sum(jnp.asarray(x[ei[0]]), jnp.asarray(ei[1]),
                              num_segments=Vp) * 2.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Config entry point: cfg.parallel.edge_partition routes ops.segment.segment_sum
# through the partitioned rung (driver.py sets set_edge_partition)
# ---------------------------------------------------------------------------

def test_config_knob_routes_model_training(rng):
    """With the knob on and a model-axis mesh ambient, a full GINE+Transformer
    train step matches the unpartitioned step (same batch, same rng)."""
    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.ops.segment import set_edge_partition
    from graphgps_tpu.parallel.mesh import set_current_mesh

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.train.batch_size = 8
    cfg.parallel.donate = False       # state reused across both step calls
    ds = load_dataset(cfg)
    loader = BatchLoader(ds.train, batch_size=8, shuffle=False,
                         y_graph_level=True)
    gb = next(iter(loader)).to_graph_batch()
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    step = L.make_steps(cfg, model, tx)[0]
    key = jax.random.PRNGKey(0)

    s_ref, loss_ref, *_ = step(state, gb, key)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    set_current_mesh(mesh)
    set_edge_partition(True)
    try:
        step_ep = L.make_steps(cfg, model, tx)[0]
        s_ep, loss_ep, *_ = step_ep(state, gb, key)
    finally:
        set_edge_partition(False)
        set_current_mesh(None)

    np.testing.assert_allclose(float(loss_ep), float(loss_ref), rtol=2e-5)

    # Gradient parity is the exactness claim. Post-Adam params are NOT a
    # sound comparison surface: Adam normalizes by sqrt(v), so an f32
    # reduction-order difference on a near-zero gradient component flips its
    # sign and produces a full lr-sized update delta. Compare raw grads.
    import jax.numpy as jnp

    def loss_fn(params):
        (pred, true), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, gb, True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        m = gb.graph_mask
        return (jnp.abs(pred[:, 0] - true[:, 0]) * m).sum() / m.sum()

    g_ref = jax.jit(jax.grad(loss_fn))(state.params)
    set_current_mesh(mesh)
    set_edge_partition(True)
    try:
        g_ep = jax.jit(jax.grad(loss_fn))(state.params)
    finally:
        set_edge_partition(False)
        set_current_mesh(None)
    for a, b in zip(jax.tree_util.tree_leaves(g_ep),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)
