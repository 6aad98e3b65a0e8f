"""Forward-pass shape/finite checks for the full model zoo: every local MPNN,
every global attention flavor, every network, every head (reference coverage:
tests/configs/graph/*.yaml smoke matrix, SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.models.networks import build_model

from conftest import make_chain_graph


def small_cfg(**over):
    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 14
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.train.batch_size = 4
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def batch_for(cfg):
    ds = load_dataset(cfg)
    return collate(ds.train[:4], 4, 16, 256,
                   y_graph_level=cfg.dataset.task == "graph").to_graph_batch()


def run_fwd(cfg, dim_out=1):
    gb = batch_for(cfg)
    model = build_model(cfg, dim_out)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, gb, True)
    pred, true = model.apply(variables, gb, False, mutable=False)
    assert np.isfinite(np.asarray(pred)).all()
    return pred, true


@pytest.mark.parametrize("local", ["GCN", "GIN", "GINE", "GatedGCN_like", "GAT",
                                   "GENConv", "PNA"])
def test_local_gnn_zoo(local):
    name = "CustomGatedGCN" if local == "GatedGCN_like" else local
    cfg = small_cfg(**{"gt.layer_type": f"{name}+Transformer"})
    if name == "PNA":
        cfg.gt.pna_degrees = [1, 2, 3, 4]
    pred, _ = run_fwd(cfg)
    assert pred.shape == (4, 1)


@pytest.mark.parametrize("glob", ["Transformer", "Performer", "BigBird", "None"])
def test_global_attention_zoo(glob):
    cfg = small_cfg(**{"gt.layer_type": f"GINE+{glob}"})
    pred, _ = run_fwd(cfg)
    assert pred.shape == (4, 1)


def test_biased_transformer_with_graphormer_bias():
    cfg = small_cfg(**{"gt.layer_type": "GINE+BiasedTransformer"})
    # the bias is built per graphormer.num_heads — must match gt.n_heads
    # (same coupling as the reference configs)
    cfg.graphormer.num_heads = cfg.gt.n_heads
    cfg.posenc_GraphormerBias.enable = True
    cfg.dataset.node_encoder_name = "TypeDictNode+GraphormerBias"
    pred, _ = run_fwd(cfg)
    assert pred.shape == (4, 1)


@pytest.mark.parametrize("pe,encoder", [
    ("RWSE", "TypeDictNode+RWSE"),
    ("LapPE", "TypeDictNode+LapPE"),
    ("SignNet", "TypeDictNode+SignNet"),
    ("HKdiagSE", "TypeDictNode+HKdiagSE"),
    ("ElstaticSE", "TypeDictNode+ElstaticSE"),
])
def test_pe_encoders(pe, encoder):
    cfg = small_cfg()
    p = cfg[f"posenc_{pe}"]
    p.enable = True
    p.dim_pe = 4
    if pe in ("RWSE", "HKdiagSE"):
        p.kernel.times = [1, 2, 3]
        p.raw_norm_type = "BatchNorm"
    if pe in ("LapPE", "SignNet"):
        p.eigen.max_freqs = 4
        p.model = "DeepSet"
        p.layers = 2
    cfg.dataset.node_encoder_name = encoder
    pred, _ = run_fwd(cfg)
    assert pred.shape == (4, 1)


def test_lappe_transformer_model():
    cfg = small_cfg()
    cfg.posenc_LapPE.enable = True
    cfg.posenc_LapPE.dim_pe = 4
    cfg.posenc_LapPE.model = "Transformer"
    cfg.posenc_LapPE.n_heads = 2
    cfg.posenc_LapPE.eigen.max_freqs = 4
    cfg.dataset.node_encoder_name = "TypeDictNode+LapPE"
    run_fwd(cfg)


@pytest.mark.parametrize("net", ["SANTransformer", "Graphormer", "Performer",
                                 "BigBird", "custom_gnn"])
def test_network_zoo(net):
    cfg = small_cfg(**{"model.type": net})
    if net == "SANTransformer":
        cfg.gt.layer_type = "SAN"
        cfg.gnn.head = "san_graph"
    if net == "Graphormer":
        cfg.graphormer.num_layers = 1
        cfg.graphormer.embed_dim = 16
        cfg.graphormer.num_heads = 2
        cfg.posenc_GraphormerBias.enable = True
        cfg.dataset.node_encoder_name = "TypeDictNode+GraphormerBias"
        cfg.gnn.head = "graphormer_graph"
        cfg.model.graph_pooling = "graph_token"
    pred, _ = run_fwd(cfg)
    assert pred.shape == (4, 1)


def test_node_task_head():
    cfg = small_cfg(**{"dataset.format": "synthetic-voc-like",
                       "dataset.task": "node",
                       "dataset.task_type": "classification",
                       "dataset.node_encoder_name": "LinearNode",
                       "dataset.edge_encoder_name": "LinearEdge",
                       "gnn.head": "inductive_node",
                       "dataset.synth_num_tasks": 5})
    pred, true = run_fwd(cfg, dim_out=5)
    assert pred.shape[0] == 4 * 16 and pred.shape[1] == 5


def test_padding_invariance():
    """A graph's prediction must not depend on how much padding surrounds it."""
    cfg = small_cfg()
    ds = load_dataset(cfg)
    g = ds.train[0]
    model = build_model(cfg, 1)
    rng = jax.random.PRNGKey(0)
    gb_small = collate([g], 1, 16, 64).to_graph_batch()
    gb_big = collate([g], 4, 32, 256).to_graph_batch()
    v = model.init({"params": rng, "dropout": rng}, gb_small, True)
    p1, _ = model.apply(v, gb_small, False, mutable=False)
    p2, _ = model.apply(v, gb_big, False, mutable=False)
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p2[0]), rtol=1e-4,
                               atol=1e-5)


def test_scatter_free_embed_grad_parity():
    """models.common.Embed's matmul VJP == the plain gather/scatter gradient,
    for 1-D and 2-D id tensors and for the big-vocab fallback path."""
    from graphgps_tpu.models.common import Embed

    rng = np.random.default_rng(0)
    for num, shape in [(28, (96,)), (34, (4, 9, 9)), (5002, (64,))]:
        emb0 = jnp.asarray(rng.normal(size=(num, 8)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, num, size=shape), jnp.int32)

        def loss_custom(e):
            m = Embed(num_embeddings=num, features=8)
            out = m.apply({"params": {"embedding": e}}, ids)
            return (out * out).sum(), out

        def loss_plain(e):
            out = jnp.take(e, ids, axis=0)
            return (out * out).sum(), out

        (l1, o1), g1 = jax.value_and_grad(loss_custom, has_aux=True)(emb0)
        (l2, o2), g2 = jax.value_and_grad(loss_plain, has_aux=True)(emb0)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)
