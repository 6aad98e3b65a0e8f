#!/usr/bin/env python3
"""Generate the benchmark recipe suite under configs/.

Each recipe mirrors the hyperparameters of the corresponding published
GraphGPS recipe (cited in the emitted header) expressed in THIS framework's
config schema. Run from the repo root:

    python tools/gen_configs.py

Idempotent: rewrites every generated file; hand-maintained recipes listed in
KEEP are never touched.
"""
from __future__ import annotations

import os

import yaml

KEEP = {
    "GPS/zinc-GPS+RWSE.yaml", "GPS/ogbg-molpcba-GPS+RWSE.yaml",
    "GPS/pattern-GPS.yaml", "GPS/pcqm4m-GPSmedium+RWSE.yaml",
    "GPS/peptides-func-GPS.yaml", "GPS/vocsuperpixels-GPS.yaml",
    "SAN/zinc-SAN.yaml", "Graphormer/zinc-Graphormer.yaml",
}


def lap_pe(max_freqs=10, dim_pe=16, layers=2, norm="none", model="DeepSet",
           n_heads=4):
    return {"enable": True,
            "eigen": {"laplacian_norm": norm, "eigvec_norm": "L2",
                      "max_freqs": max_freqs},
            "model": model, "dim_pe": dim_pe, "layers": layers,
            "n_heads": n_heads}


def rwse(dim_pe=16, k=17):
    return {"enable": True, "kernel": {"times_func": f"range(1,{k})"},
            "model": "Linear", "dim_pe": dim_pe, "raw_norm_type": "BatchNorm"}


def signnet(max_freqs, dim_pe, model="DeepSet", post=3, phi_out=64):
    return {"enable": True, "model": model, "dim_pe": dim_pe,
            "layers": 8, "post_layers": post,
            "phi_hidden_dim": 64, "phi_out_dim": phi_out,
            "eigen": {"laplacian_norm": "none", "eigvec_norm": "L2",
                      "max_freqs": max_freqs}}


def eslap(max_freqs=8):
    return {"enable": True,
            "eigen": {"laplacian_norm": "none", "eigvec_norm": "L2",
                      "max_freqs": max_freqs}}


def graphormer_bias(num_spatial_types=20, degrees=64):
    return {"enable": True, "node_degrees_only": False,
            "num_spatial_types": num_spatial_types,
            "num_in_degrees": degrees, "num_out_degrees": degrees}


def gps_gt(layer_type, layers, heads, dim, dropout=0.0, attn_dropout=0.5):
    return {"layer_type": layer_type, "layers": layers, "n_heads": heads,
            "dim_hidden": dim, "dropout": dropout,
            "attn_dropout": attn_dropout, "layer_norm": False,
            "batch_norm": True}


def gnn(head, dim, post=3, act="relu", **kw):
    return dict({"head": head, "layers_pre_mp": 0, "layers_post_mp": post,
                 "dim_inner": dim, "batchnorm": True, "act": act,
                 "dropout": 0.0}, **kw)


def adamw_cosine(lr, epochs, warmup, wd=1e-5, clip=True, **kw):
    return dict({"clip_grad_norm": clip, "optimizer": "adamW",
                 "weight_decay": wd, "base_lr": lr, "max_epoch": epochs,
                 "scheduler": "cosine_with_warmup",
                 "num_warmup_epochs": warmup}, **kw)


def plateau(lr, epochs, patience, optimizer="adamW", wd=0.0, factor=0.5,
            min_lr=1e-5, **kw):
    return dict({"optimizer": optimizer, "weight_decay": wd, "base_lr": lr,
                 "max_epoch": epochs, "scheduler": "reduce_on_plateau",
                 "reduce_factor": factor, "schedule_patience": patience,
                 "min_lr": min_lr}, **kw)


def zinc_ds(node_enc):
    return {"format": "PyG-ZINC", "name": "subset", "task": "graph",
            "task_type": "regression", "node_encoder": True,
            "node_encoder_name": node_enc, "node_encoder_num_types": 28,
            "edge_encoder": True, "edge_encoder_name": "TypeDictEdge",
            "edge_encoder_num_types": 4}


def mol_ds(name, node_enc, task_type, edge_enc="Bond"):
    return {"format": "OGB", "name": name, "task": "graph",
            "task_type": task_type, "node_encoder": True,
            "node_encoder_name": node_enc, "edge_encoder": True,
            "edge_encoder_name": edge_enc}


def bench_ds(name, node_enc="LapPE", edge_enc="DummyEdge",
             task="graph", task_type="classification"):
    return {"format": "PyG-GNNBenchmarkDataset", "name": name, "task": task,
            "task_type": task_type, "node_encoder": True,
            "node_encoder_name": node_enc, "edge_encoder": True,
            "edge_encoder_name": edge_enc}


def superpix_ds(which, node_enc, edge_enc="VOCEdge"):
    """VOC/COCO superpixels dataset stanza (reference task 'graph' is our
    'node': inductive node classification over superpixel graphs)."""
    return {"format": f"PyG-{which}Superpixels",
            "name": "edge_wt_region_boundary", "slic_compactness": 30,
            "task": "node", "task_type": "classification",
            "node_encoder": True, "node_encoder_name": node_enc,
            "edge_encoder": True, "edge_encoder_name": edge_enc}


def contact_ds(node_enc):
    return {"format": "OGB", "name": "PCQM4Mv2Contact-shuffle",
            "task": "graph", "task_type": "classification",
            "node_encoder": True, "node_encoder_name": node_enc,
            "edge_encoder": True, "edge_encoder_name": "Bond",
            "resample_negative": True}


def san_gt(layers, heads, dim, gamma, dropout=0.0):
    return {"layers": layers, "n_heads": heads, "dim_hidden": dim,
            "full_graph": True, "gamma": gamma, "dropout": dropout,
            "layer_norm": False, "batch_norm": True, "residual": True}


def custom_gnn_stack(layer_type, layers_mp, dim, head, post=1):
    return {"head": head, "layers_pre_mp": 0, "layers_mp": layers_mp,
            "layers_post_mp": post, "dim_inner": dim,
            "layer_type": layer_type, "act": "relu", "residual": True,
            "batchnorm": True, "dropout": 0.0}


# recipe name -> (reference file, config dict)
RECIPES = {
    # ----------------------------------------------------------- GPS / ZINC
    "GPS/zinc-GPS.yaml": ("configs/GPS/zinc-GPS.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": zinc_ds("TypeDictNode+LapPE"),
        "posenc_LapPE": lap_pe(max_freqs=8, dim_pe=8),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "add"},
        "gt": gps_gt("GINE+Transformer", 10, 4, 64),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.001, 2000, 50),
    }),
    "GPS/zinc-GPS+SNDS.yaml": ("configs/GPS/zinc-GPS+SNDS.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": zinc_ds("TypeDictNode+SignNet"),
        "posenc_SignNet": {"enable": True, "model": "DeepSet", "dim_pe": 28,
                           "layers": 8, "post_layers": 3,
                           "phi_hidden_dim": 64, "phi_out_dim": 64,
                           "eigen": {"laplacian_norm": "none",
                                     "eigvec_norm": "L2", "max_freqs": 37}},
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "add"},
        "gt": gps_gt("GINE+Transformer", 10, 4, 64),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.001, 2000, 50),
    }),
    "GPS/zinc-GPS+SNMLP.yaml": ("configs/GPS/zinc-GPS+SNMLP.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": zinc_ds("TypeDictNode+SignNet"),
        "posenc_SignNet": {"enable": True, "model": "MLP", "dim_pe": 28,
                           "layers": 8, "post_layers": 3,
                           "phi_hidden_dim": 64, "phi_out_dim": 4,
                           "eigen": {"laplacian_norm": "none",
                                     "eigvec_norm": "L2", "max_freqs": 37}},
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "add"},
        "gt": gps_gt("GINE+Transformer", 10, 4, 64),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.001, 2000, 50),
    }),
    "GPS/zinc-GPS-ESLapPE.yaml": ("configs/GPS/zinc-GPS-ESLapPE.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": zinc_ds("TypeDictNode+EquivStableLapPE"),
        "posenc_EquivStableLapPE": {
            "enable": True,
            "eigen": {"laplacian_norm": "none", "eigvec_norm": "L2",
                      "max_freqs": 8}},
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "add"},
        "gt": gps_gt("GINE+Transformer", 10, 4, 64),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.001, 2000, 50),
    }),
    "GPS/zinc-GPS-LapPE+RWSE.yaml": ("configs/GPS/zinc-GPS-LapPE+RWSE.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": zinc_ds("TypeDictNode+LapPE+RWSE"),
        "posenc_LapPE": lap_pe(max_freqs=8, dim_pe=8),
        "posenc_RWSE": rwse(dim_pe=20, k=17),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "add"},
        "gt": gps_gt("GINE+Transformer", 10, 4, 64),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.001, 2000, 50),
    }),
    "GPS/zinc-GPS+RWSE-ckptbest.yaml": (
        "configs/GPS/zinc-GPS+RWSE-ckptbest.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": zinc_ds("TypeDictNode+RWSE"),
            "posenc_RWSE": {"enable": True,
                            "kernel": {"times_func": "range(1,21)"},
                            "model": "Linear", "dim_pe": 28,
                            "raw_norm_type": "BatchNorm"},
            "train": {"batch_size": 32, "ckpt_best": True,
                      "ckpt_clean": True},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "add"},
            "gt": gps_gt("GINE+Transformer", 10, 4, 64),
            "gnn": gnn("san_graph", 64),
            "optim": adamw_cosine(0.001, 2000, 50),
        }),
    "GPS/zinc-GPS+RWSE-inference.yaml": (
        "configs/GPS/zinc-GPS+RWSE-inference.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": zinc_ds("TypeDictNode+RWSE"),
            "posenc_RWSE": {"enable": True,
                            "kernel": {"times_func": "range(1,21)"},
                            "model": "Linear", "dim_pe": 28,
                            "raw_norm_type": "BatchNorm"},
            "train": {"batch_size": 32, "mode": "inference-only"},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "add"},
            "gt": gps_gt("GINE+Transformer", 10, 4, 64),
            "gnn": gnn("san_graph", 64),
            "pretrained": {"dir": "pretrained/zinc-GPS+RWSE",
                           "reset_prediction_head": False},
        }),
    # ------------------------------------------------------------ GPS / OGB
    "GPS/ogbg-molhiv-GPS+RWSE.yaml": ("configs/GPS/ogbg-molhiv-GPS+RWSE.yaml", {
        "metric_best": "auc",
        "dataset": mol_ds("ogbg-molhiv", "Atom+RWSE",
                          "classification_binary"),
        "posenc_RWSE": rwse(dim_pe=16, k=17),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 10, 4, 64, dropout=0.05),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.0001, 100, 5),
    }),
    "GPS/ogbg-ppa-GPS.yaml": ("configs/GPS/ogbg-ppa-GPS.yaml", {
        "metric_best": "accuracy",
        "dataset": mol_ds("ogbg-ppa", "PPANode", "classification", "PPAEdge"),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Performer", 3, 8, 256, dropout=0.1),
        "gnn": gnn("default", 256, post=2),
        "optim": adamw_cosine(0.0003, 200, 10),
    }),
    "GPS/ogbg-code2-GPS.yaml": ("configs/GPS/ogbg-code2-GPS.yaml", {
        "metric_best": "f1",
        "dataset": mol_ds("ogbg-code2", "ASTNode", "subtoken_prediction",
                          "ASTEdge"),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "subtoken_cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Performer", 4, 4, 256, dropout=0.2),
        "gnn": gnn("ogb_code_graph", 256, post=1),
        "optim": adamw_cosine(0.0001, 30, 2),
    }),
    # -------------------------------------------------------- GPS / PCQM4Mv2
    "GPS/pcqm4m-GPS+RWSE.yaml": ("configs/GPS/pcqm4m-GPS+RWSE.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": mol_ds("PCQM4Mv2-full", "Atom+RWSE", "regression"),
        "posenc_RWSE": rwse(dim_pe=20, k=17),
        "train": {"batch_size": 256, "ckpt_best": True},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 304),
        "gnn": gnn("san_graph", 304),
        "optim": adamw_cosine(0.0005, 100, 5, wd=0.0),
    }),
    "GPS/pcqm4m-GPSdeep+RWSE.yaml": ("configs/GPS/pcqm4m-GPSdeep+RWSE.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": mol_ds("PCQM4Mv2-full", "Atom+RWSE", "regression"),
        "posenc_RWSE": rwse(dim_pe=20, k=17),
        "train": {"batch_size": 256, "ckpt_best": True},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 16, 8, 256, dropout=0.1,
                     attn_dropout=0.1),
        "gnn": gnn("san_graph", 256, act="gelu"),
        "optim": dict(adamw_cosine(0.0002, 150, 10, wd=0.0),
                      scheduler="linear_with_warmup"),
        # scan+remat: 16 deep layers compile once and fit HBM comfortably
        "parallel": {"scan_layers": True, "remat": True},
    }),
    "GPS/pcqm4m-GPSdeep-inference.yaml": (
        "configs/GPS/pcqm4m-GPSdeep-inference.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": mol_ds("PCQM4Mv2-inference", "Atom+RWSE", "regression"),
            "posenc_RWSE": rwse(dim_pe=20, k=17),
            "train": {"batch_size": 256, "mode": "PCQM4Mv2-inference"},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 16, 8, 256,
                         dropout=0.1, attn_dropout=0.1),
            "gnn": gnn("san_graph", 256, act="gelu"),
            "pretrained": {"dir": "pretrained/pcqm4m-GPSdeep",
                           "reset_prediction_head": False},
        }),
    "GPS/pcqm-contact-GPS.yaml": ("configs/GPS/pcqm-contact-GPS.yaml", {
        "metric_best": "mrr",
        "dataset": dict(mol_ds("PCQM4Mv2Contact-shuffle", "Atom+LapPE",
                               "classification"),
                        resample_negative=True),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 256},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "edge_decoding": "dot"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 4, 4, 96),
        "gnn": gnn("inductive_edge", 96, post=1),
        "optim": adamw_cosine(0.0003, 200, 10, wd=0.0),
    }),
    # ------------------------------------------------------------ GPS / LRGB
    "GPS/peptides-struct-GPS.yaml": ("configs/GPS/peptides-struct-GPS.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": mol_ds("peptides-structural", "Atom+LapPE", "regression"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 128},
        "model": {"type": "GPSModel", "loss_fun": "l1",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 4, 4, 96),
        "gnn": gnn("default", 96, post=1),
        "optim": adamw_cosine(0.0003, 200, 10, wd=0.0),
    }),
    "GPS/cocosuperpixels-GPS.yaml": ("configs/GPS/cocosuperpixels-GPS.yaml", {
        "metric_best": "f1",
        "dataset": {"format": "PyG-COCOSuperpixels",
                    "name": "edge_wt_region_boundary", "slic_compactness": 30,
                    "task": "node", "task_type": "classification",
                    "node_encoder": True,
                    "node_encoder_name": "COCONode+LapPE",
                    "edge_encoder": True, "edge_encoder_name": "VOCEdge"},
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "weighted_cross_entropy"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 4, 8, 96),
        "gnn": gnn("inductive_node", 96),
        "optim": adamw_cosine(0.0005, 300, 10, wd=0.0),
    }),
    # ------------------------------------------------- GPS / GNNBenchmark
    "GPS/mnist-GPS.yaml": ("configs/GPS/mnist-GPS.yaml", {
        "metric_best": "accuracy",
        "dataset": bench_ds("MNIST", node_enc="LinearNode+LapPE",
                            edge_enc="LinearEdge"),
        "posenc_LapPE": lap_pe(max_freqs=8, dim_pe=8),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
        "gnn": dict(gnn("default", 52), batchnorm=False),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    "GPS/cifar10-GPS.yaml": ("configs/GPS/cifar10-GPS.yaml", {
        "metric_best": "accuracy",
        "dataset": bench_ds("CIFAR10", node_enc="LinearNode+LapPE",
                            edge_enc="LinearEdge"),
        "posenc_LapPE": lap_pe(max_freqs=8, dim_pe=8),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
        "gnn": dict(gnn("default", 52, post=2), batchnorm=False),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    "GPS/cluster-GPS.yaml": ("configs/GPS/cluster-GPS.yaml", {
        "metric_best": "accuracy-SBM",
        "dataset": bench_ds("CLUSTER", task="node"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "weighted_cross_entropy"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 16, 8, 48, dropout=0.1),
        "gnn": gnn("inductive_node", 48),
        "optim": adamw_cosine(0.0005, 100, 5),
    }),
    # --------------------------------------------------------- GPS / MalNet
    "GPS/malnettiny-GPS.yaml": ("configs/GPS/malnettiny-GPS.yaml", {
        "metric_best": "accuracy",
        "dataset": {"format": "PyG-MalNetTiny",
                    "name": "LocalDegreeProfile", "task": "graph",
                    "task_type": "classification", "node_encoder": True,
                    "node_encoder_name": "LapPE", "edge_encoder": True,
                    "edge_encoder_name": "DummyEdge"},
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "max"},
        "gt": gps_gt("CustomGatedGCN+Performer", 5, 4, 64),
        "gnn": gnn("default", 64),
        "optim": adamw_cosine(0.0005, 150, 10),
    }),
    "GPS/malnettiny-GPS+RWSE.yaml": ("configs/GPS/malnettiny-GPS+RWSE.yaml", {
        "metric_best": "accuracy",
        "dataset": {"format": "PyG-MalNetTiny",
                    "name": "LocalDegreeProfile", "task": "graph",
                    "task_type": "classification", "node_encoder": True,
                    "node_encoder_name": "RWSE", "edge_encoder": True,
                    "edge_encoder_name": "DummyEdge"},
        "posenc_RWSE": rwse(dim_pe=20, k=17),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "max"},
        "gt": gps_gt("CustomGatedGCN+Performer", 5, 4, 64),
        "gnn": gnn("default", 64),
        "optim": adamw_cosine(0.0005, 150, 10),
    }),
    # ----------------------------------------------- transductive node tasks
    **{
        f"GPS/{tag}-GPS.yaml": (f"configs/GPS/{tag}-GPS.yaml", {
            "metric_best": "accuracy",
            "dataset": {"format": fmt, "name": nm, "task": "node",
                        "task_type": "classification", "transductive": True,
                        "node_encoder": True, "node_encoder_name": "LapPE",
                        "edge_encoder": False},
            "posenc_LapPE": lap_pe(max_freqs=4, dim_pe=4),
            "train": {"eval_period": 5, "enable_ckpt": False},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy"},
            "gt": {"layer_type": "GCN+Transformer", "layers": layers,
                   "n_heads": 4, "dim_hidden": dim, "dropout": 0.2,
                   "attn_dropout": ad, "layer_norm": False,
                   "batch_norm": False},
            "gnn": dict(gnn("node", dim, post=1, act="gelu"), dropout=0.2),
            "optim": adamw_cosine(0.0005, 200, 10),
        })
        for tag, fmt, nm, layers, dim, ad in (
            ("actor", "PyG-Actor", "none", 2, 64, 0.0),
            ("webkb-cor", "PyG-WebKB", "cornell", 2, 64, 0.0),
            ("webkb-tex", "PyG-WebKB", "texas", 2, 64, 0.0),
            ("webkb-wis", "PyG-WebKB", "wisconsin", 2, 64, 0.0),
            ("wn-chameleon", "PyG-WikipediaNetwork", "chameleon", 3, 96, 0.5),
            ("wn-squirrel", "PyG-WikipediaNetwork", "squirrel", 3, 96, 0.5),
        )
    },
    # ------------------------------------------- GPS PE-ablation variants
    # (reference publishes one recipe per PE choice; mirrored here so every
    # configs/GPS/* entry in the reference has a same-named analog)
    "GPS/cifar10-GPS+RWSE.yaml": ("configs/GPS/cifar10-GPS+RWSE.yaml", {
        "metric_best": "accuracy",
        "dataset": bench_ds("CIFAR10", node_enc="LinearNode+RWSE",
                            edge_enc="LinearEdge"),
        "posenc_RWSE": rwse(dim_pe=16, k=17),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
        "gnn": dict(gnn("default", 52, post=2), batchnorm=False),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    **{
        f"GPS/cifar10-GPS+{tag}.yaml": (f"configs/GPS/cifar10-GPS+{tag}.yaml", {
            "metric_best": "accuracy",
            "dataset": bench_ds("CIFAR10", node_enc="LinearNode+SignNet",
                                edge_enc="LinearEdge"),
            "posenc_SignNet": sn,
            "train": {"batch_size": 16},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
            "gnn": dict(gnn("default", 52, post=2), batchnorm=False),
            "optim": adamw_cosine(0.001, 100, 5),
        })
        for tag, sn in (("SNDS", signnet(16, 16)),
                        ("SNMLP", signnet(8, 8, "MLP", post=2, phi_out=4)))
    },
    "GPS/cifar10-GPS-ESLapPE.yaml": ("configs/GPS/cifar10-GPS-ESLapPE.yaml", {
        "metric_best": "accuracy",
        "dataset": bench_ds("CIFAR10", node_enc="LinearNode+EquivStableLapPE",
                            edge_enc="LinearEdge"),
        "posenc_EquivStableLapPE": eslap(8),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
        "gnn": dict(gnn("default", 52, post=2), batchnorm=False),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    "GPS/mnist-GPS-ESLapPE.yaml": ("configs/GPS/mnist-GPS-ESLapPE.yaml", {
        "metric_best": "accuracy",
        "dataset": bench_ds("MNIST", node_enc="LinearNode+EquivStableLapPE",
                            edge_enc="LinearEdge"),
        "posenc_EquivStableLapPE": eslap(8),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 3, 4, 52),
        "gnn": dict(gnn("default", 52), batchnorm=False),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    "GPS/cluster-GPS-ESLapPE.yaml": ("configs/GPS/cluster-GPS-ESLapPE.yaml", {
        "metric_best": "accuracy-SBM",
        "dataset": bench_ds("CLUSTER", task="node",
                            node_enc="LinearNode+EquivStableLapPE"),
        "posenc_EquivStableLapPE": eslap(10),
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "weighted_cross_entropy"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 16, 8, 48, dropout=0.01),
        "gnn": gnn("inductive_node", 48),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    "GPS/pattern-GPS-ESLapPE.yaml": ("configs/GPS/pattern-GPS-ESLapPE.yaml", {
        "metric_best": "accuracy-SBM",
        "dataset": bench_ds("PATTERN", task="node",
                            node_enc="LinearNode+EquivStableLapPE"),
        "posenc_EquivStableLapPE": eslap(10),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "weighted_cross_entropy"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 6, 4, 64),
        "gnn": gnn("inductive_node", 64),
        "optim": adamw_cosine(0.001, 100, 5),
    }),
    # --------------------------------------------- MalNet feature ablations
    "GPS/malnettiny-GPS-noPE.yaml": ("configs/GPS/malnettiny-GPS-noPE.yaml", {
        "metric_best": "accuracy",
        "dataset": {"format": "PyG-MalNetTiny",
                    "name": "LocalDegreeProfile", "task": "graph",
                    "task_type": "classification", "node_encoder": False,
                    "edge_encoder": True, "edge_encoder_name": "DummyEdge"},
        "train": {"batch_size": 16},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "max"},
        "gt": gps_gt("CustomGatedGCN+Performer", 5, 4, 64),
        "gnn": gnn("default", 64, layers_pre_mp=1),
        "optim": adamw_cosine(0.0005, 150, 10),
    }),
    **{
        f"GPS/malnettiny-GPS{tag}.yaml": (
            f"configs/GPS/malnettiny-GPS{tag}.yaml", {
                "metric_best": "accuracy",
                "dataset": {"format": "PyG-MalNetTiny",
                            "name": "LocalDegreeProfile", "task": "graph",
                            "task_type": "classification",
                            "node_encoder": True, "node_encoder_name": enc,
                            "edge_encoder": True,
                            "edge_encoder_name": "DummyEdge"},
                pe_key: pe,
                "train": {"batch_size": 16},
                "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                          "graph_pooling": "max"},
                "gt": gps_gt("CustomGatedGCN+Performer", 5, 4, 64),
                "gnn": gnn("default", 64),
                "optim": adamw_cosine(0.0005, 150, 10),
            })
        for tag, enc, pe_key, pe in (
            ("+SNDS", "SignNet", "posenc_SignNet", signnet(32, 32)),
            ("+SNMLP", "SignNet", "posenc_SignNet",
             signnet(10, 10, "MLP", post=2, phi_out=4)),
            ("-ESLapPE", "LinearNode+EquivStableLapPE",
             "posenc_EquivStableLapPE", eslap(10)),
        )
    },
    # ------------------------------------------------ OGB-mol PE ablations
    "GPS/ogbg-molhiv-GPS.yaml": ("configs/GPS/ogbg-molhiv-GPS.yaml", {
        "metric_best": "auc",
        "dataset": mol_ds("ogbg-molhiv", "Atom+LapPE",
                          "classification_binary"),
        "posenc_LapPE": lap_pe(max_freqs=8, dim_pe=8),
        "train": {"batch_size": 32},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 10, 4, 64, dropout=0.05),
        "gnn": gnn("san_graph", 64),
        "optim": adamw_cosine(0.0001, 100, 5),
    }),
    "GPS/ogbg-molhiv-GPS-ESLapPE.yaml": (
        "configs/GPS/ogbg-molhiv-GPS-ESLapPE.yaml", {
            "metric_best": "auc",
            "dataset": mol_ds("ogbg-molhiv", "Atom+EquivStableLapPE",
                              "classification_binary"),
            "posenc_EquivStableLapPE": eslap(8),
            "train": {"batch_size": 32},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 10, 4, 64,
                         dropout=0.05),
            "gnn": gnn("san_graph", 64),
            "optim": adamw_cosine(0.0001, 100, 5),
        }),
    "GPS/ogbg-molhiv-GPS+RWSEdev.yaml": (
        "configs/GPS/ogbg-molhiv-GPS+RWSEdev.yaml", {
            "metric_best": "auc",
            "dataset": mol_ds("ogbg-molhiv", "Atom+RWSE",
                              "classification_binary"),
            "posenc_RWSE": rwse(dim_pe=16, k=17),
            "train": {"batch_size": 128},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 2, 4, 72, dropout=0.3),
            "gnn": dict(gnn("default", 72, post=1), dropout=0.3),
            "optim": adamw_cosine(0.0001, 100, 5),
        }),
    "GPS/ogbg-molpcba-GPS.yaml": ("configs/GPS/ogbg-molpcba-GPS.yaml", {
        "metric_best": "ap",
        "dataset": mol_ds("ogbg-molpcba", "Atom+LapPE",
                          "classification_multilabel"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16),
        "train": {"batch_size": 512},
        "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 384, dropout=0.2),
        "gnn": gnn("default", 384, post=1),
        "optim": adamw_cosine(0.0005, 100, 5),
    }),
    "GPS/ogbg-molpcba-GPS+SNDS.yaml": (
        "configs/GPS/ogbg-molpcba-GPS+SNDS.yaml", {
            "metric_best": "ap",
            "dataset": mol_ds("ogbg-molpcba", "Atom+SignNet",
                              "classification_multilabel"),
            "posenc_SignNet": signnet(37, 37),
            "train": {"batch_size": 512},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 384,
                         dropout=0.2),
            "gnn": gnn("default", 384, post=1),
            "optim": adamw_cosine(0.0005, 100, 5),
        }),
    "GPS/ogbg-molpcba-GPS-LapPE+RWSE.yaml": (
        "configs/GPS/ogbg-molpcba-GPS-LapPE+RWSE.yaml", {
            "metric_best": "ap",
            "dataset": mol_ds("ogbg-molpcba", "Atom+LapPE+RWSE",
                              "classification_multilabel"),
            "posenc_LapPE": lap_pe(max_freqs=1, dim_pe=4),
            "posenc_RWSE": rwse(dim_pe=20, k=17),
            "train": {"batch_size": 512},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 384,
                         dropout=0.2),
            "gnn": gnn("default", 384, post=1),
            "optim": adamw_cosine(0.0005, 100, 5),
        }),
    "GPS/ogbg-molpcba-GPS-SNDS+RWSE.yaml": (
        "configs/GPS/ogbg-molpcba-GPS-SNDS+RWSE.yaml", {
            "metric_best": "ap",
            "dataset": mol_ds("ogbg-molpcba", "Atom+SignNet+RWSE",
                              "classification_multilabel"),
            "posenc_SignNet": signnet(37, 32),
            "posenc_RWSE": rwse(dim_pe=20, k=17),
            "train": {"batch_size": 256},
            "model": {"type": "GPSModel", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 384,
                         dropout=0.2),
            "gnn": gnn("default", 384, post=1),
            "optim": adamw_cosine(0.0005, 100, 5, batch_accumulation=2),
        }),
    # ---------------------------------------------- PCQM4Mv2 PE ablations
    **{
        f"GPS/pcqm4m-GPS{tag}.yaml": (f"configs/GPS/pcqm4m-GPS{tag}.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": mol_ds("PCQM4Mv2-full", f"Atom+{enc}", "regression"),
            pe_key: pe,
            "train": {"batch_size": 256, "ckpt_period": 100},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "mean"},
            "gt": gps_gt("CustomGatedGCN+Transformer", 5, 4, 304),
            "gnn": gnn("san_graph", 304),
            "optim": adamw_cosine(0.0005, 100, 5, wd=0.0),
        })
        for tag, enc, pe_key, pe in (
            ("", "LapPE", "posenc_LapPE", lap_pe(max_freqs=8, dim_pe=8)),
            ("+SNDS", "SignNet", "posenc_SignNet", signnet(21, 21)),
            ("+SNMLP", "SignNet", "posenc_SignNet",
             signnet(8, 8, "MLP", post=2, phi_out=4)),
            ("-ESLapPE", "EquivStableLapPE", "posenc_EquivStableLapPE",
             eslap(8)),
        )
    },
    # --------------------------- GPS with Graphormer bias attention (+VN)
    "GPS/zinc-GPSwGraphormer.yaml": (
        "configs/GPS/zinc-GPSwGraphormer.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": zinc_ds("TypeDictNode+GraphormerBias+RWSE"),
            "posenc_GraphormerBias": graphormer_bias(),
            "posenc_RWSE": {"enable": True,
                            "kernel": {"times_func": "range(1,21)"},
                            "model": "Linear", "dim_pe": 28,
                            "raw_norm_type": "BatchNorm"},
            "graphormer": {"use_graph_token": False},
            "train": {"batch_size": 32},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "add"},
            "gt": gps_gt("GINE+BiasedTransformer", 10, 4, 64),
            "gnn": gnn("san_graph", 64),
            "optim": adamw_cosine(0.001, 2000, 50),
        }),
    "GPS/zinc-GPSwGraphormer+VN.yaml": (
        "configs/GPS/zinc-GPSwGraphormer+VN.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": zinc_ds("TypeDictNode+GraphormerBias"),
            "posenc_GraphormerBias": graphormer_bias(),
            "graphormer": {"use_graph_token": True},
            "train": {"batch_size": 32},
            "model": {"type": "GPSModel", "loss_fun": "l1",
                      "graph_pooling": "graph_token"},
            "gt": gps_gt("GINE+BiasedTransformer", 10, 4, 64),
            "gnn": gnn("san_graph", 64),
            "optim": adamw_cosine(0.001, 2000, 50),
        }),
    # ---------------------------------------------------------------- SAN
    "SAN/peptides-func-SAN.yaml": ("configs/SAN/peptides-func-SAN.yaml", {
        "metric_best": "ap",
        "dataset": mol_ds("peptides-functional", "Atom+LapPE",
                          "classification_multilabel"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer"),
        "train": {"batch_size": 32},
        "model": {"type": "SANTransformer", "loss_fun": "cross_entropy",
                  "graph_pooling": "mean"},
        "gt": {"layers": 4, "n_heads": 4, "dim_hidden": 84,
               "full_graph": True, "gamma": 1e-6, "dropout": 0.0,
               "layer_norm": False, "batch_norm": True, "residual": True},
        "gnn": gnn("default", 84, post=1),
        "optim": plateau(0.0003, 500, 20, batch_accumulation=4),
    }),
    "SAN/pattern-SAN.yaml": ("configs/SAN/pattern-SAN.yaml", {
        "metric_best": "accuracy-SBM",
        "dataset": bench_ds("PATTERN", task="node"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=3),
        "train": {"batch_size": 16},
        "model": {"type": "SANTransformer",
                  "loss_fun": "weighted_cross_entropy"},
        "gt": {"layers": 4, "n_heads": 10, "dim_hidden": 80,
               "full_graph": True, "gamma": 1e-2, "dropout": 0.0,
               "layer_norm": False, "batch_norm": True, "residual": True},
        "gnn": gnn("inductive_node", 80),
        "optim": plateau(0.0005, 1000, 10, optimizer="adam", min_lr=1e-6),
    }),
    # ------------------------------------------------------- GatedGCN / GINE
    "GatedGCN/peptides-func-GatedGCN.yaml": (
        "configs/GatedGCN/peptides-func-GatedGCN.yaml", {
            "metric_best": "ap",
            "dataset": mol_ds("peptides-functional", "Atom",
                              "classification_multilabel"),
            "train": {"batch_size": 128},
            "model": {"type": "custom_gnn", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gnn": {"head": "default", "layers_pre_mp": 0, "layers_mp": 5,
                    "layers_post_mp": 1, "dim_inner": 138,
                    "layer_type": "gatedgcnconv", "act": "relu",
                    "residual": True, "dropout": 0.0},
            "optim": plateau(0.001, 500, 20),
        }),
    "GatedGCN/peptides-struct-GatedGCN.yaml": (
        "configs/GatedGCN/peptides-struct-GatedGCN.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": mol_ds("peptides-structural", "Atom", "regression"),
            "train": {"batch_size": 128},
            "model": {"type": "custom_gnn", "loss_fun": "l1",
                      "graph_pooling": "mean"},
            "gnn": {"head": "default", "layers_pre_mp": 0, "layers_mp": 5,
                    "layers_post_mp": 1, "dim_inner": 138,
                    "layer_type": "gatedgcnconv", "act": "relu",
                    "residual": True, "dropout": 0.0},
            "optim": plateau(0.001, 500, 20),
        }),
    "GatedGCN/vocsuperpixels-GatedGCN.yaml": (
        "configs/GatedGCN/vocsuperpixels-GatedGCN.yaml", {
            "metric_best": "f1",
            "dataset": {"format": "PyG-VOCSuperpixels",
                        "name": "edge_wt_region_boundary",
                        "slic_compactness": 30, "task": "node",
                        "task_type": "classification", "node_encoder": True,
                        "node_encoder_name": "VOCNode", "edge_encoder": True,
                        "edge_encoder_name": "VOCEdge"},
            "train": {"batch_size": 32},
            "model": {"type": "custom_gnn",
                      "loss_fun": "weighted_cross_entropy"},
            "gnn": {"head": "inductive_node", "layers_pre_mp": 0,
                    "layers_mp": 8, "layers_post_mp": 3, "dim_inner": 108,
                    "layer_type": "gatedgcnconv", "act": "relu",
                    "residual": True, "dropout": 0.0},
            "optim": plateau(0.0005, 500, 10, optimizer="adam"),
        }),
    "GINE/peptides-func-GINE.yaml": (
        "configs/GINE/peptides-func-GINE.yaml", {
            "metric_best": "ap",
            "dataset": mol_ds("peptides-functional", "Atom",
                              "classification_multilabel"),
            "train": {"batch_size": 128},
            "model": {"type": "custom_gnn", "loss_fun": "cross_entropy",
                      "graph_pooling": "mean"},
            "gnn": {"head": "default", "layers_pre_mp": 0, "layers_mp": 5,
                    "layers_post_mp": 1, "dim_inner": 208,
                    "layer_type": "gineconv", "act": "relu",
                    "residual": True, "dropout": 0.0},
            "optim": plateau(0.001, 500, 20),
        }),
    "GINE/peptides-struct-GINE.yaml": (
        "configs/GINE/peptides-struct-GINE.yaml", {
            "metric_best": "mae", "metric_agg": "argmin",
            "dataset": mol_ds("peptides-structural", "Atom", "regression"),
            "train": {"batch_size": 128},
            "model": {"type": "custom_gnn", "loss_fun": "l1",
                      "graph_pooling": "mean"},
            "gnn": {"head": "default", "layers_pre_mp": 0, "layers_mp": 5,
                    "layers_post_mp": 1, "dim_inner": 208,
                    "layer_type": "gineconv", "act": "relu",
                    "residual": True, "dropout": 0.0},
            "optim": plateau(0.001, 500, 20),
        }),
    # ------------------------------------------ SAN benchmark suite (rest)
    "SAN/cluster-SAN.yaml": ("configs/SAN/cluster-SAN.yaml", {
        "metric_best": "accuracy-SBM",
        "dataset": bench_ds("CLUSTER", task="node"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=1),
        "train": {"batch_size": 16},
        "model": {"type": "SANTransformer",
                  "loss_fun": "weighted_cross_entropy"},
        "gt": san_gt(16, 8, 48, 1e-1),
        "gnn": gnn("inductive_node", 48),
        "optim": plateau(0.0005, 1000, 10, optimizer="adam"),
    }),
    **{
        f"SAN/{tag}superpixels-SAN.yaml": (
            f"configs/SAN/{tag}superpixels-SAN.yaml", {
                "metric_best": "f1",
                "dataset": superpix_ds(which, "VOCNode+LapPE"),
                "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                                       model="Transformer", layers=2),
                "train": {"batch_size": 8},
                "model": {"type": "SANTransformer",
                          "loss_fun": "weighted_cross_entropy"},
                "gt": san_gt(4, 8, 88, 1e-1),
                "gnn": gnn("inductive_node", 88),
                "optim": plateau(0.0005, epochs, pat, optimizer="adam",
                                 batch_accumulation=4),
            })
        for tag, which, epochs, pat in (("voc", "VOC", 500, 20),
                                        ("coco", "COCO", 100, 5))
    },
    "SAN/ogbg-molhiv-SAN.yaml": ("configs/SAN/ogbg-molhiv-SAN.yaml", {
        "metric_best": "auc",
        "dataset": mol_ds("ogbg-molhiv", "Atom+LapPE",
                          "classification_binary"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=3),
        "train": {"batch_size": 64},
        "model": {"type": "SANTransformer", "loss_fun": "cross_entropy",
                  "graph_pooling": "add"},
        "gt": san_gt(10, 4, 64, 1e-6, dropout=0.01),
        "gnn": gnn("san_graph", 64),
        "optim": plateau(0.0001, 1000, 20, optimizer="adam"),
    }),
    "SAN/ogbg-molpcba-SAN.yaml": ("configs/SAN/ogbg-molpcba-SAN.yaml", {
        "metric_best": "ap",
        "dataset": mol_ds("ogbg-molpcba", "Atom+LapPE",
                          "classification_multilabel"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=3),
        "train": {"batch_size": 512},
        "model": {"type": "SANTransformer", "loss_fun": "cross_entropy",
                  "graph_pooling": "add"},
        "gt": san_gt(5, 4, 304, 1e-6, dropout=0.2),
        "gnn": gnn("san_graph", 304),
        "optim": plateau(0.0003, 1000, 20, optimizer="adam",
                         batch_accumulation=2),
    }),
    "SAN/pcqm-contact-SAN.yaml": ("configs/SAN/pcqm-contact-SAN.yaml", {
        "metric_best": "mrr",
        "dataset": contact_ds("Atom+LapPE"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=2),
        "train": {"batch_size": 256},
        "model": {"type": "SANTransformer", "loss_fun": "cross_entropy",
                  "edge_decoding": "dot"},
        "gt": san_gt(4, 4, 84, 1e-5),
        "gnn": gnn("inductive_edge", 84, post=1),
        "optim": plateau(0.0003, 200, 10),
    }),
    "SAN/peptides-struct-SAN.yaml": ("configs/SAN/peptides-struct-SAN.yaml", {
        "metric_best": "mae", "metric_agg": "argmin",
        "dataset": mol_ds("peptides-structural", "Atom+LapPE", "regression"),
        "posenc_LapPE": lap_pe(max_freqs=10, dim_pe=16, norm="sym",
                               model="Transformer", layers=2),
        "train": {"batch_size": 32},
        "model": {"type": "SANTransformer", "loss_fun": "l1",
                  "graph_pooling": "mean"},
        "gt": san_gt(4, 4, 84, 1e-6),
        "gnn": gnn("default", 84, post=1),
        "optim": plateau(0.0003, 500, 20, batch_accumulation=4),
    }),
    # --------------------------------------- GatedGCN / GINE suite (rest)
    "GatedGCN/cocosuperpixels-GatedGCN.yaml": (
        "configs/GatedGCN/cocosuperpixels-GatedGCN.yaml", {
            "metric_best": "f1",
            "dataset": superpix_ds("COCO", "VOCNode"),
            "train": {"batch_size": 32},
            "model": {"type": "custom_gnn",
                      "loss_fun": "weighted_cross_entropy"},
            "gnn": custom_gnn_stack("gatedgcnconv", 8, 108,
                                    "inductive_node", post=3),
            "optim": plateau(0.0005, 500, 10, optimizer="adam"),
        }),
    "GatedGCN/pcqm-contact-GatedGCN.yaml": (
        "configs/GatedGCN/pcqm-contact-GatedGCN.yaml", {
            "metric_best": "mrr",
            "dataset": contact_ds("Atom"),
            "train": {"batch_size": 256},
            "model": {"type": "custom_gnn", "loss_fun": "cross_entropy",
                      "edge_decoding": "dot"},
            "gnn": custom_gnn_stack("gatedgcnconv", 5, 138,
                                    "inductive_edge"),
            "optim": plateau(0.001, 200, 10),
        }),
    **{
        f"GINE/{tag}superpixels-GINE.yaml": (
            f"configs/GINE/{tag}superpixels-GINE.yaml", {
                "metric_best": "f1",
                "dataset": superpix_ds(which, "VOCNode"),
                "train": {"batch_size": 32},
                "model": {"type": "custom_gnn",
                          "loss_fun": "weighted_cross_entropy"},
                "gnn": custom_gnn_stack("gineconv", 8, 166,
                                        "inductive_node", post=3),
                "optim": plateau(0.0005, epochs, 10, optimizer="adam"),
            })
        for tag, which, epochs in (("voc", "VOC", 1000), ("coco", "COCO", 500))
    },
    "GINE/pcqm-contact-GINE.yaml": (
        "configs/GINE/pcqm-contact-GINE.yaml", {
            "metric_best": "mrr",
            "dataset": contact_ds("Atom"),
            "train": {"batch_size": 256},
            "model": {"type": "custom_gnn", "loss_fun": "cross_entropy",
                      "edge_decoding": "dot"},
            "gnn": custom_gnn_stack("gineconv", 5, 208, "inductive_edge"),
            "optim": plateau(0.001, 200, 10),
        }),
    # ------------------------------- Graphormer transductive node suite
    **{
        f"Graphormer/{tag}-Graphormer.yaml": (
            f"configs/Graphormer/{tag}-Graphormer.yaml", {
                "metric_best": "accuracy",
                "dataset": {"format": fmt, "name": nm, "task": "node",
                            "task_type": "classification",
                            "transductive": True, "node_encoder": True,
                            "node_encoder_name": "LinearNode+GraphormerBias",
                            "edge_encoder": False},
                "posenc_GraphormerBias": graphormer_bias(
                    num_spatial_types=20, degrees=0) | {
                        "num_in_degrees": din, "num_out_degrees": dout},
                "train": {"eval_period": 5, "enable_ckpt": False},
                "model": {"type": "Graphormer", "loss_fun": "cross_entropy"},
                "graphormer": {"use_graph_token": False, "num_layers": 2,
                               "num_heads": 4, "embed_dim": 64,
                               "dropout": 0.2, "attention_dropout": 0.0,
                               "mlp_dropout": 0.2, "input_dropout": 0.0},
                "gnn": dict(gnn("node", 64, post=1, act="gelu"),
                            dropout=0.2),
                "optim": adamw_cosine(0.0005, 200, 10,
                                      clip_grad_norm_value=5.0),
            })
        for tag, fmt, nm, din, dout in (
            ("actor", "PyG-Actor", "none", 1297, 74),
            ("webkb-cor", "PyG-WebKB", "cornell", 9, 94),
            ("webkb-tex", "PyG-WebKB", "texas", 13, 105),
            ("webkb-wis", "PyG-WebKB", "wisconsin", 12, 123),
            ("wn-chameleon", "PyG-WikipediaNetwork", "chameleon", 729, 89),
            ("wn-squirrel", "PyG-WikipediaNetwork", "squirrel", 1885, 265),
        )
    },
}


def main():
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    for rel, (ref, conf) in sorted(RECIPES.items()):
        if rel in KEEP:
            continue
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        conf = {"out_dir": "results", **conf}
        header = (f"# Recipe mirroring the published hyperparameters of the "
                  f"reference\n# /root/reference/{ref} in this framework's "
                  f"schema.\n# Generated by tools/gen_configs.py — edit there."
                  f"\n")
        with open(path, "w") as f:
            f.write(header + yaml.safe_dump(conf, sort_keys=False))
        print("wrote", rel)


if __name__ == "__main__":
    main()
