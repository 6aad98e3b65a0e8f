"""MaskedGINDeepSigns (SignNet DeepSet ρ over VARIABLE per-graph k).

Reference: signnet_pos_encoder.py:134-173 — eigenvector channel k of a graph
with n nodes is masked when k ≥ n, channels are sum-pooled (DeepSet), then the
ρ-MLP maps to dim_pe. Oracle properties pinned here: per-graph channel
masking, sign invariance, and the fixed-k MLP variant differing.
"""
import jax
import jax.numpy as jnp
import numpy as np

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.models.networks import build_model


def _setup(model="DeepSet"):
    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_min_nodes = 4
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.posenc_SignNet.enable = True
    cfg.posenc_SignNet.dim_pe = 4
    cfg.posenc_SignNet.model = model
    cfg.posenc_SignNet.eigen.max_freqs = 8
    cfg.posenc_SignNet.post_layers = 2
    cfg.dataset.node_encoder_name = "TypeDictNode+SignNet"
    # linear readout (mean pool + 1-layer MLP): the san_graph ReLU chain can
    # go dead at init on the raw PE magnitudes, hiding sensitivity
    cfg.gnn.head = "default"
    cfg.model.graph_pooling = "mean"
    cfg.gnn.layers_post_mp = 1
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256, y_graph_level=True).to_graph_batch()
    mdl = build_model(cfg, 1)
    rng = jax.random.PRNGKey(0)
    variables = mdl.init({"params": rng, "dropout": rng}, gb, True)

    # warm the BatchNorm running stats with one train-mode forward on the
    # clean batch: at init the unwarmed stats leave the raw PE magnitudes
    # un-normalized (dead-ReLU head), and in train mode the batch statistics
    # would couple masked channels into the normalization (as upstream's BN
    # does too) — warmed-eval makes BN a FIXED affine map, so the masking
    # property is exactly testable
    _, mut = mdl.apply(variables, gb, True, rngs={"dropout": rng},
                       mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}

    def fwd(batch):
        pred, _ = mdl.apply(variables, batch, False, mutable=False)
        return np.asarray(pred)

    return cfg, gb, mdl, variables, fwd


def test_deepset_masks_channels_beyond_graph_size():
    cfg, gb, mdl, variables, fwd = _setup("DeepSet")
    p1 = fwd(gb)

    # graph 0 has n0 nodes → channels k >= n0 are masked; perturbing them must
    # not change ANY prediction
    n0 = int(np.asarray(gb.nodes_per_graph)[0])
    assert n0 < 8  # must actually exercise the mask
    ev = np.asarray(gb.pe["eigvecs_sn"]).copy()
    ev[:16, n0:] = 123.0  # poison graph 0's out-of-range channels
    gb2 = gb.replace(pe={**gb.pe, "eigvecs_sn": jnp.asarray(ev)})
    p2 = fwd(gb2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)

    # ...while an IN-range channel does change the output
    ev3 = np.asarray(gb.pe["eigvecs_sn"]).copy()
    ev3[:n0, : max(1, n0 - 1)] += 0.5
    gb3 = gb.replace(pe={**gb.pe, "eigvecs_sn": jnp.asarray(ev3)})
    p3 = fwd(gb3)
    assert np.abs(p1 - p3).max() > 1e-6


def test_deepset_sign_invariance():
    cfg, gb, mdl, variables, fwd = _setup("DeepSet")
    p1 = fwd(gb)
    gb2 = gb.replace(pe={**gb.pe,
                         "eigvecs_sn": -gb.pe["eigvecs_sn"]})
    p2 = fwd(gb2)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_mlp_variant_unchanged_and_different():
    """The fixed-k GINDeepSigns path still works and is a different function
    (channel concat vs masked sum)."""
    _, gb, mdl_m, var_m, fwd = _setup("MLP")
    pred = fwd(gb)
    assert np.isfinite(pred).all()
