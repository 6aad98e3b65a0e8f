"""Device-side assembly for node-level targets and link-label extras."""
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.device_loader import DeviceLoader
from graphgps_tpu.data.graph import Graph
from graphgps_tpu.driver import run_single

from conftest import make_chain_graph


def test_node_level_y_roundtrip(rng):
    gs = []
    for i in range(6):
        g = make_chain_graph(int(rng.integers(3, 8)))
        g.y = np.arange(g.num_nodes, dtype=np.int64)
        gs.append(g)
    dl = DeviceLoader(gs, batch_size=3, max_nodes=8, shuffle=False,
                      y_graph_level=False)
    real, gb = next(iter(dl))
    y = np.asarray(gb.y).reshape(3, 8)
    for i in range(3):
        n = gs[i].num_nodes
        np.testing.assert_array_equal(y[i, :n], np.arange(n))
        assert (y[i, n:] == 0).all()


def test_edge_label_extras_roundtrip(rng):
    gs = []
    for i in range(4):
        g = make_chain_graph(6)
        P = int(rng.integers(2, 5))
        g.extras["edge_label_index"] = rng.integers(0, 6, (2, P)).astype(np.int64)
        g.extras["edge_label"] = (rng.random(P) > 0.5).astype(np.float32)
        gs.append(g)
    dl = DeviceLoader(gs, batch_size=4, max_nodes=8, shuffle=False)
    real, gb = next(iter(dl))
    lab = np.asarray(gb.extras["edge_label"])
    lmask = np.asarray(gb.extras["edge_label_mask"])
    for i, g in enumerate(gs):
        P = g.extras["edge_label"].shape[0]
        np.testing.assert_array_equal(lab[i, :P], g.extras["edge_label"])
        assert lmask[i, :P].all() and not lmask[i, P:].any()


def test_link_task_trains_with_device_loader(tmp_path):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.format = "OGB"
    cfg.dataset.name = "PCQM4Mv2Contact"
    cfg.dataset.task = "edge"
    cfg.dataset.task_type = "classification_binary"
    cfg.dataset.node_encoder_name = "Atom"
    cfg.dataset.edge_encoder_name = "Bond"
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.max_nodes = 48
    cfg.model.loss_fun = "cross_entropy"
    cfg.gnn.head = "inductive_edge"
    cfg.metric_best = "auc"
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 2
    cfg.train.enable_ckpt = False
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "mrr" in hist["val"][-1]
