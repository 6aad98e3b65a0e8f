"""End-to-end training smoke over every task family the reference covers:
graph regression/classification, multilabel, subtoken prediction, node
classification, and link prediction (reference tests/configs/graph/*.yaml
smoke matrix, SURVEY.md §4.2)."""
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import run_single


def _cfg(tmp_path, **over):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 32
    cfg.dataset.synth_max_nodes = 14
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 2
    cfg.train.enable_ckpt = False
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def test_multilabel_peptides_like(tmp_path):
    cfg = _cfg(tmp_path, **{
        "dataset.format": "OGB", "dataset.name": "peptides-functional",
        "dataset.task_type": "classification_multilabel",
        "dataset.node_encoder_name": "Atom",
        "dataset.edge_encoder_name": "Bond",
        "model.loss_fun": "cross_entropy", "gnn.head": "default",
        "model.graph_pooling": "mean", "metric_best": "ap",
        "dataset.synth_max_nodes": 40})
    cfg.dataset.max_nodes = 160
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "ap" in hist["val"][-1] and "auc" in hist["val"][-1]


def test_subtoken_code2_like(tmp_path):
    cfg = _cfg(tmp_path, **{
        "dataset.format": "OGB", "dataset.name": "ogbg-code2",
        "dataset.task_type": "subtoken_prediction",
        "dataset.node_encoder_name": "ASTNode",
        "dataset.edge_encoder_name": "ASTEdge",
        "model.loss_fun": "subtoken_cross_entropy",
        "gnn.head": "ogb_code_graph", "model.graph_pooling": "mean",
        "metric_best": "f1"})
    cfg.dataset.max_nodes = 128
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "f1" in hist["val"][-1]


def test_link_prediction_contact_like(tmp_path):
    cfg = _cfg(tmp_path, **{
        "dataset.format": "OGB", "dataset.name": "PCQM4Mv2Contact",
        "dataset.task": "edge",
        "dataset.task_type": "classification_binary",
        "dataset.node_encoder_name": "Atom",
        "dataset.edge_encoder_name": "Bond",
        "model.loss_fun": "cross_entropy",
        "gnn.head": "inductive_edge", "metric_best": "auc"})
    cfg.dataset.max_nodes = 48
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "auc" in hist["val"][-1]


def test_malnet_like_classification(tmp_path):
    cfg = _cfg(tmp_path, **{
        "dataset.format": "PyG-MalNetTiny", "dataset.name": "LocalDegreeProfile",
        "dataset.task_type": "classification",
        "dataset.node_encoder_name": "LinearNode",
        "dataset.edge_encoder": False,
        "model.loss_fun": "cross_entropy", "gnn.head": "default",
        "model.graph_pooling": "mean", "metric_best": "accuracy"})
    cfg.dataset.max_nodes = 384
    cfg.dataset.max_edges = 8192
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "accuracy" in hist["val"][-1]


def test_infer_links_edge_mode_balanced():
    """infer_link_label='edge' builds a balanced shuffled pos/neg pair set
    with per-pair labels (reference task_preprocessing.py:19-42)."""
    import numpy as np

    from graphgps_tpu.data.graph import Graph
    from graphgps_tpu.data.transforms import infer_links

    n = 6
    s = np.arange(n - 1)
    ei = np.stack([np.concatenate([s, s + 1]), np.concatenate([s + 1, s])])
    g = Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei,
              edge_feat=np.zeros((ei.shape[1], 1), np.int64))
    infer_links(g, "edge", seed=0)
    pairs = g.extras["complete_edge_index"]
    assert pairs.shape == (2, 2 * ei.shape[1])
    assert float(np.mean(g.y)) == 0.5            # balanced, like the ref assert
    adj = set(map(tuple, ei.T.tolist()))
    for (a, b), y in zip(pairs.T.tolist(), g.y.tolist()):
        assert ((a, b) in adj) == bool(y)
    assert g.edge_feat is None                   # edge_attr dropped


def test_triangles_csl_stubs():
    import numpy as np

    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.graph import Graph
    from graphgps_tpu.data.transforms import task_specific_preprocessing

    cfg = new_cfg()
    cfg.dataset.name = "TRIANGLES"
    g = Graph(node_feat=np.ones((4, 3), np.float32),
              edge_index=np.array([[0, 1], [1, 0]]),
              y=np.array([3], np.int64))
    task_specific_preprocessing(g, cfg)
    assert g.node_feat.shape == (4, 1)           # featureless stub
    assert int(g.y[0]) == 2                      # 1-based → 0-based

    cfg.dataset.name = "CSL"
    cfg.posenc_LapPE.enable = True
    g2 = Graph(node_feat=np.ones((5, 3), np.float32),
               edge_index=np.array([[0, 1], [1, 0]]))
    task_specific_preprocessing(g2, cfg)
    assert g2.node_feat.shape == (5, 1)
