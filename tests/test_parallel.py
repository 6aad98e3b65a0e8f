"""Distributed tests on the simulated 8-device CPU mesh — the multi-host harness
the reference lacks (SURVEY.md §4.4, §2.10)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.driver import create_loaders, infer_dims
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.optim.optimizers import make_tx
from graphgps_tpu.parallel.mesh import make_mesh, shard_batch, shard_params


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def _setup(batch_size=8, optimizer="adamW"):
    cfg = new_cfg()
    cfg.mixed_precision = False    # parity tests check sharding math in f32
    cfg.optim.optimizer = optimizer
    cfg.dataset.synth_num_graphs = 32
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = batch_size
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gt.batch_norm = False      # BN stats differ across replicas; use LN for
    cfg.gt.layer_norm = True       # exact DP-equality testing
    ds = load_dataset(cfg)
    dim_out = infer_dims(cfg, ds)
    gb = collate(ds.train[:batch_size], batch_size, 16, 512).to_graph_batch()
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    return cfg, model, tx, state, gb


def test_dp_forward_matches_single_device():
    cfg, model, tx, state, gb = _setup()
    _, _, _, eval_step = L.make_steps(cfg, model, tx)
    loss_1, pred_1, _, _ = eval_step(state, gb)

    mesh = make_mesh(devices=jax.devices())
    state_r = shard_params(state, mesh)
    gb_s = shard_batch(gb, mesh)
    loss_8, pred_8, _, _ = eval_step(state_r, gb_s)
    np.testing.assert_allclose(np.asarray(loss_1), np.asarray(loss_8),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_1), np.asarray(pred_8),
                               rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device():
    # SGD: the update is linear in the gradient, so cross-device reduction-order
    # noise stays at float epsilon (adam divides by √v and amplifies it for
    # near-zero grads).
    cfg, model, tx, state, gb = _setup(optimizer="sgd")
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    rngk = jax.random.PRNGKey(3)
    s1, loss1, _, _, _ = train_step(state, gb, rngk)

    cfg2, model2, tx2, state2, gb2 = _setup(optimizer="sgd")
    mesh = make_mesh(devices=jax.devices())
    train_step2, _, _, _ = L.make_steps(cfg2, model2, tx2)
    s8, loss8, _, _, _ = train_step2(shard_params(state2, mesh),
                                     shard_batch(gb2, mesh), rngk)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss8),
                               rtol=1e-5, atol=1e-6)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_mesh_shapes():
    m = make_mesh(devices=jax.devices())
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    cfg = new_cfg()
    cfg.parallel.mesh_shape = [4, 2]
    m2 = make_mesh(cfg)
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2


def test_batch_sharding_layout():
    mesh = make_mesh(devices=jax.devices())
    cfg, model, tx, state, gb = _setup()
    gb_s = shard_batch(gb, mesh)
    shard_map = {s.device.id: s.index for s in gb_s.node_feat.addressable_shards}
    assert len(shard_map) == 8
    # each device owns a contiguous slice of the node axis
    sl = shard_map[0][0]
    assert sl.start == 0 and sl.stop == gb.num_node_slots // 8


def test_dp_with_device_assembled_batch(rng):
    """Device-assembled batches reshard cleanly onto the data mesh and give
    the same results as unsharded execution."""
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.data.datasets.base import load_dataset

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 32
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gt.batch_norm = False
    cfg.gt.layer_norm = True
    ds = load_dataset(cfg)
    dl = DeviceLoader(ds.train, batch_size=8, max_nodes=16, shuffle=False)
    real, gb = next(iter(dl))
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    _, _, _, eval_step = L.make_steps(cfg, model, tx)
    loss_1, pred_1, _, _ = eval_step(state, gb)

    mesh = make_mesh(devices=jax.devices())
    gb_s = shard_batch(gb, mesh)
    state_r = shard_params(state, mesh)
    loss_8, pred_8, _, _ = eval_step(state_r, gb_s)
    np.testing.assert_allclose(np.asarray(loss_1), np.asarray(loss_8),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_1), np.asarray(pred_8),
                               rtol=1e-4, atol=1e-5)


def test_dp_train_step_with_batchnorm_matches_single_device():
    """Sync-BN by construction (models/common.py MaskedBatchNorm docstring):
    statistics are computed inside the global-view jitted graph, so the DP
    train step — including the mutated running stats — matches single-device
    execution bit-for-bit up to reduction-order noise."""
    def bn_setup():
        cfg = new_cfg()
        cfg.mixed_precision = False  # exact-parity test → f32
        cfg.optim.optimizer = "sgd"
        cfg.dataset.synth_num_graphs = 32
        cfg.dataset.synth_max_nodes = 12
        cfg.train.batch_size = 8
        cfg.gt.layers = 1
        cfg.gt.dim_hidden = 16
        cfg.gt.n_heads = 2
        cfg.gt.batch_norm = True
        cfg.gt.layer_norm = False
        ds = load_dataset(cfg)
        dim_out = infer_dims(cfg, ds)
        gb = collate(ds.train[:8], 8, 16, 512).to_graph_batch()
        model = build_model(cfg, dim_out)
        tx = make_tx(cfg)
        state = L.init_state(cfg, model, gb, 0, tx)
        return cfg, model, tx, state, gb

    cfg, model, tx, state, gb = bn_setup()
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    rngk = jax.random.PRNGKey(3)
    s1, loss1, _, _, _ = train_step(state, gb, rngk)
    bs1 = jax.device_get(s1.batch_stats)

    cfg2, model2, tx2, state2, gb2 = bn_setup()
    mesh = make_mesh(devices=jax.devices())
    train_step2, _, _, _ = L.make_steps(cfg2, model2, tx2)
    s8, loss8, _, _, _ = train_step2(shard_params(state2, mesh),
                                     shard_batch(gb2, mesh), rngk)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss8),
                               rtol=1e-5, atol=1e-6)
    bs8 = jax.device_get(s8.batch_stats)
    flat1 = jax.tree_util.tree_leaves(bs1)
    flat8 = jax.tree_util.tree_leaves(bs8)
    assert flat1  # BatchNorm stats exist
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
