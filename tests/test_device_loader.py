"""Device-side batch assembly vs host collation parity."""
import jax
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.data.device_loader import DeviceLoader
from graphgps_tpu.data.graph import Graph

from conftest import make_chain_graph


def _graphs(rng, n=10):
    out = []
    for i in range(n):
        g = make_chain_graph(int(rng.integers(3, 9)))
        g.pe["pestat_RWSE"] = rng.normal(size=(g.num_nodes, 4)).astype(np.float32)
        out.append(g)
    return out


def test_device_matches_host_collate(rng):
    gs = _graphs(rng)
    dl = DeviceLoader(gs, batch_size=4, max_nodes=16, shuffle=False)
    real, gb = next(iter(dl))
    hb = collate(gs[:4], 4, 16, dl.max_edges).to_graph_batch()
    assert real == 4
    np.testing.assert_array_equal(np.asarray(gb.node_feat),
                                  np.asarray(hb.node_feat))
    np.testing.assert_array_equal(np.asarray(gb.node_mask),
                                  np.asarray(hb.node_mask))
    np.testing.assert_array_equal(np.asarray(gb.graph_mask),
                                  np.asarray(hb.graph_mask))
    # same real-edge multiset; both receiver-sorted overall
    em_d, em_h = np.asarray(gb.edge_mask), np.asarray(hb.edge_mask)
    set_d = set(zip(np.asarray(gb.senders)[em_d].tolist(),
                    np.asarray(gb.receivers)[em_d].tolist()))
    set_h = set(zip(np.asarray(hb.senders)[em_h].tolist(),
                    np.asarray(hb.receivers)[em_h].tolist()))
    assert set_d == set_h
    r = np.asarray(gb.receivers)
    assert (np.diff(r) >= 0).all()
    # PE parity on real nodes
    nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(gb.pe["pestat_RWSE"])[nm],
                               np.asarray(hb.pe["pestat_RWSE"])[nm])
    np.testing.assert_allclose(np.nan_to_num(np.asarray(gb.y)),
                               np.nan_to_num(np.asarray(hb.y)))


def test_device_partial_batch(rng):
    gs = _graphs(rng, 6)
    dl = DeviceLoader(gs, batch_size=4, shuffle=False)
    batches = list(dl)
    assert len(batches) == 2
    real2, gb2 = batches[1]
    assert real2 == 2
    gm = np.asarray(gb2.graph_mask)
    assert gm.tolist() == [True, True, False, False]
    assert not np.asarray(gb2.node_mask).reshape(4, -1)[2:].any()
    assert np.isnan(np.asarray(gb2.y)[2:]).all()


def test_device_loader_trains(tmp_path):
    import graphgps_tpu.train.loop  # noqa: F401
    from graphgps_tpu.driver import run_single

    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 40
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 3
    cfg.optim.base_lr = 3e-3
    cfg.train.enable_ckpt = False
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    hist = run_single(cfg, str(tmp_path / "run"))
    losses = [h["loss"] for h in hist["train"]]
    assert losses[-1] < losses[0]


def test_fused_steps_match_two_dispatch(tmp_path):
    """make_fused_steps (assembly fused into the jitted step) matches the
    assemble-then-step path exactly."""
    import jax
    import jax.numpy as jnp
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.data.device_loader import assemble
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.data.datasets.base import load_dataset

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    ds = load_dataset(cfg)
    dl = DeviceLoader(ds.train, batch_size=4, shuffle=False)
    _, gb = next(iter(dl))
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    sel = jnp.arange(4, dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)

    cfg.parallel.donate = False
    step2, _, _, eval2 = L.make_steps(cfg, model, tx)
    fused_train, fused_eval = L.make_fused_steps(cfg, model, tx, dl)
    b = assemble(dl._tree, sel, dl.max_nodes, 4)
    _, loss_a, *_ = step2(state, b, rng)
    _, loss_b, *_ = fused_train(state, sel, rng)
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                               rtol=1e-6)
    la, *_ = eval2(state, b)
    lb, *_ = fused_eval(state, sel)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)
