"""Graphormer graph token ([CLS]) semantics.

Reference: graphormer_encoder.py:128-183 (bias padding with learned token
row/col), :186-253 (token injection + input dropout), pooling/graph_token.py.
The TPU design keeps the token in ``batch.extras['graph_token_state']`` and
prepends it to the dense sequence inside every layer — these tests pin down
that the token is learned, attends to nodes, is attended by nodes, and drives
the graph_token pooling.
"""
import jax
import jax.numpy as jnp
import numpy as np

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.models.networks import build_model

from test_models import small_cfg


def _graphormer_cfg(use_token=True):
    cfg = small_cfg(**{"model.type": "Graphormer"})
    cfg.graphormer.num_layers = 2
    cfg.graphormer.embed_dim = 16
    cfg.graphormer.num_heads = 2
    cfg.graphormer.use_graph_token = use_token
    cfg.posenc_GraphormerBias.enable = True
    cfg.dataset.node_encoder_name = "TypeDictNode+GraphormerBias"
    cfg.gnn.head = "graphormer_graph"
    cfg.model.graph_pooling = "graph_token"
    return cfg


def _setup(use_token=True):
    cfg = _graphormer_cfg(use_token)
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256, y_graph_level=True).to_graph_batch()
    model = build_model(cfg, 1)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, gb, True)
    return cfg, gb, model, variables


def _find_param(tree, name):
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif name in path[-1:]:
            out.append((path, node))

    walk(tree, ())
    return out


def test_token_params_exist_and_are_learned():
    _, gb, model, variables = _setup()
    toks = _find_param(jax.tree.map(np.asarray, variables["params"]),
                       "graph_token")
    biases = _find_param(jax.tree.map(np.asarray, variables["params"]),
                         "graph_token_bias")
    assert len(toks) == 1 and toks[0][1].shape == (16,)
    assert len(biases) == 1 and biases[0][1].shape == (2,)

    # the token is load-bearing: d loss / d token != 0
    def loss(v):
        pred, _ = model.apply(v, gb, False, mutable=False)
        return jnp.sum(pred ** 2)

    grads = jax.grad(loss)(variables)
    gtok = _find_param(jax.tree.map(np.asarray, grads["params"]),
                       "graph_token")[0][1]
    gbias = _find_param(jax.tree.map(np.asarray, grads["params"]),
                        "graph_token_bias")[0][1]
    assert np.abs(gtok).max() > 0
    assert np.abs(gbias).max() > 0


def test_token_attends_to_nodes():
    """Perturbing one node's type changes the token-pooled prediction."""
    cfg, gb, model, variables = _setup()
    p1, _ = model.apply(variables, gb, False, mutable=False)
    nf = np.asarray(gb.node_feat).copy()
    nf[0] = (nf[0] + 1) % cfg.dataset.node_encoder_num_types
    gb2 = gb.replace(node_feat=jnp.asarray(nf))
    p2, _ = model.apply(variables, gb2, False, mutable=False)
    assert abs(float(p1[0, 0]) - float(p2[0, 0])) > 1e-7


def test_nodes_attend_to_token():
    """Perturbing the token embedding changes NODE-level states (the token is
    a real attention target, not just a readout)."""
    cfg = _graphormer_cfg()
    cfg.gnn.head = "inductive_node"  # read node states instead of the token
    cfg.dataset.task = "node"
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256, y_graph_level=False).to_graph_batch()
    model = build_model(cfg, 1)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, gb, True)
    p1, _ = model.apply(variables, gb, False, mutable=False)

    def bump(path, x):
        if path[-1].key == "graph_token":
            return x + 1.0
        return x

    v2 = {"params": jax.tree_util.tree_map_with_path(
        bump, variables["params"])}
    p2, _ = model.apply(v2, gb, False, mutable=False)
    changed = np.abs(np.asarray(p1) - np.asarray(p2)).max()
    assert changed > 1e-6


def test_use_graph_token_false_falls_back():
    _, gb, model, variables = _setup(use_token=False)
    params = jax.tree.map(np.asarray, variables["params"])
    assert not _find_param(params, "graph_token")
    pred, _ = model.apply(variables, gb, False, mutable=False)
    assert np.isfinite(np.asarray(pred)).all()


def test_zinc_graphormer_recipe_trains(tmp_path):
    """The zinc-Graphormer recipe trains through the token end-to-end."""
    import json

    from graphgps_tpu.driver import main

    main(["--cfg", "configs/Graphormer/zinc-Graphormer.yaml",
          "out_dir", str(tmp_path / "out"),
          "dataset.format", "synthetic",
          "dataset.synth_num_graphs", "32",
          "dataset.synth_max_nodes", "12",
          "train.enable_ckpt", "False", "train.batch_size", "8",
          "graphormer.num_layers", "1", "graphormer.embed_dim", "16",
          "graphormer.num_heads", "2", "gnn.dim_inner", "16",
          "optim.max_epoch", "2", "optim.num_warmup_epochs", "1"])
    stats = tmp_path / "out" / "zinc-Graphormer" / "0" / "val" / "stats.json"
    rows = [json.loads(l) for l in stats.read_text().splitlines()]
    assert np.isfinite(rows[-1]["mae"])
