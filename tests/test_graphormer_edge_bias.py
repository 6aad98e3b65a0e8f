"""Graphormer edge-encodings-along-shortest-paths bias term.

Reference: graphormer_pre_processing fills shortest_path_types with the edge
types along each shortest path (graphormer_encoder.py:66-93); BiasEncoder
embeds them per hop, mixes each hop distance with its own H×H matrix, sums
and divides by the clamped path length (:156-175).
"""
import jax
import jax.numpy as jnp
import numpy as np

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.graph import Graph
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.pe.host import compute_posenc, graphormer_bias


def _chain(types=(1, 2, 3)):
    n = len(types) + 1
    s = np.arange(n - 1)
    ei = np.stack([np.concatenate([s, s + 1]), np.concatenate([s + 1, s])])
    ef = np.concatenate([np.asarray(types), np.asarray(types)])[:, None]
    return Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei,
                 edge_feat=ef.astype(np.int64),
                 y=np.array([1.0], np.float32))


def test_shortest_path_types_on_chain():
    g = _chain((1, 2, 3))  # 0-1-2-3 with bond types 1,2,3
    stats = graphormer_bias(g, num_spatial_types=5, with_edge_paths=True)
    spt = stats["shortest_path_types"]
    assert spt.shape == (4, 4, 5)
    # path 0→3 crosses edges (0,1)=1, (1,2)=2, (2,3)=3
    assert spt[0, 3, :3].tolist() == [1, 2, 3]
    assert spt[0, 3, 3:].tolist() == [0, 0]
    # path 3→1 crosses (3,2)=3, (2,1)=2
    assert spt[3, 1, :2].tolist() == [3, 2]
    assert stats["spatial_types"][0, 3] == 3  # 3 hops < distance → exact


def test_path_truncation_matches_reference():
    """Paths longer than `distance` are truncated to `distance` NODES, i.e.
    distance−1 recorded hops (reference path[:distance], :81-93)."""
    g = _chain((1, 1, 1, 2, 3))  # 6-node chain
    stats = graphormer_bias(g, num_spatial_types=3, with_edge_paths=True)
    spt = stats["shortest_path_types"]
    # 0→5 has 5 hops, truncated to 3 nodes → 2 recorded hops
    assert spt[0, 5].tolist() == [1, 1, 0]


def _model_setup(edge_types):
    cfg = new_cfg()
    cfg.model.type = "Graphormer"
    # ≥2 layers: with one layer the token readout only sees the token's own
    # attention row, which carries the learned token bias, not the node-row
    # spatial/edge biases
    cfg.graphormer.num_layers = 2
    cfg.graphormer.embed_dim = 16
    cfg.graphormer.num_heads = 2
    cfg.graphormer.use_graph_token = True
    cfg.posenc_GraphormerBias.enable = True
    cfg.posenc_GraphormerBias.has_edge_attr = True
    cfg.dataset.node_encoder_name = "TypeDictNode+GraphormerBias"
    cfg.dataset.edge_encoder = False
    cfg.gnn.head = "graphormer_graph"
    cfg.model.graph_pooling = "graph_token"
    g = _chain(edge_types)
    compute_posenc([g], cfg)
    gb = collate([g], 1, 8, 64, y_graph_level=True).to_graph_batch()
    model = build_model(cfg, 1)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, gb, True)
    return model, variables, gb


def test_edge_types_change_prediction():
    model, variables, gb1 = _model_setup((1, 2, 3))
    p1, _ = model.apply(variables, gb1, False, mutable=False)

    # (3,2,1) would be graph-isomorphic to (1,2,3) under node reversal —
    # use a genuinely different type assignment
    _, _, gb2 = _model_setup((1, 3, 3))
    p2, _ = model.apply(variables, gb2, False, mutable=False)
    assert abs(float(p1[0, 0]) - float(p2[0, 0])) > 1e-7

    # the per-distance mixing matrices exist and receive gradient
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in flat]
    assert any("edge_dis_encoder" in n for n in names)

    def loss(v):
        p, _ = model.apply(v, gb1, False, mutable=False)
        return (p ** 2).sum()

    grads = jax.grad(loss)(variables)
    gflat = jax.tree_util.tree_leaves_with_path(grads["params"])
    gmap = {"/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in gflat}
    gw = next(v for n, v in gmap.items() if "edge_dis_encoder" in n)
    assert float(jnp.abs(gw).max()) > 0
