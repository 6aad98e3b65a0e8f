#!/usr/bin/env python
"""Benchmark: ZINC-recipe GPS training throughput (fwd+bwd+update) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges/sec/chip through the full training step on the flagship GPS model
(GINE+Transformer, RWSE, 10 layers, dim 64 — the reference's ZINC recipe,
/root/reference/configs/GPS/zinc-GPS+RWSE.yaml). Baseline proxy: the reference's
single-A100 ZINC setup processes ~1.0M edges/sec through its training step
(batch 32 × ~50 edges/graph × ~600 it/s upper bound); vs_baseline reports our
edges/sec against that 1.0M reference mark.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    # ZINC-shape workload: ≤36 nodes, 28/4 types, batch 32, 10 layers, dim 64
    cfg.dataset.synth_num_graphs = 512
    cfg.dataset.synth_min_nodes = 18
    cfg.dataset.synth_max_nodes = 36
    cfg.dataset.node_encoder_name = "TypeDictNode+RWSE"
    cfg.posenc_RWSE.enable = True
    cfg.posenc_RWSE.kernel.times = list(range(1, 21))
    cfg.posenc_RWSE.dim_pe = 28
    cfg.posenc_RWSE.raw_norm_type = "BatchNorm"
    cfg.gt.layers = 10
    cfg.gt.dim_hidden = 64
    cfg.gt.n_heads = 4
    cfg.gt.attn_dropout = 0.5
    cfg.gnn.dim_inner = 64
    cfg.train.batch_size = 32
    cfg.optim.clip_grad_norm = True

    ds = load_dataset(cfg)
    loader = BatchLoader(ds.train, batch_size=32, shuffle=False)
    hb = next(iter(loader))
    gb = hb.to_graph_batch()
    real_edges = int(np.asarray(hb.arrays["edge_mask"]).sum())

    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    rng = jax.random.PRNGKey(0)

    # warmup/compile
    state, loss, _, _ = train_step(state, gb, rng)
    jax.block_until_ready(loss)

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        rng, sub = jax.random.split(rng)
        state, loss, _, _ = train_step(state, gb, sub)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_sec = real_edges * iters / dt
    baseline = 1.0e6  # reference A100 proxy (see module docstring)
    print(json.dumps({
        "metric": "train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
