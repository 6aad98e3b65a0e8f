#!/usr/bin/env python
"""Benchmark: ZINC-recipe GPS training throughput (fwd+bwd+update) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges/sec/chip through the full jitted training step on the flagship GPS
model (GINE+Transformer, RWSE-20, 10 layers, dim 64 — the reference's ZINC recipe,
/root/reference/configs/GPS/zinc-GPS+RWSE.yaml) at the recipe's batch size 32.

Methodology: after one compile/warmup step, time 5 windows of 300 steps and take
the MIN window: the axon TPU tunnel exhibits occasional multi-ms latency spikes
unrelated to device time, so the fastest window is the best estimator of device
capability (bench_scaling.py reports the median instead; both are recorded in
docs/RESULTS.md with this caveat).

Baseline: the reference is PyTorch+PyG on one A100. The repo publishes no
throughput numbers (SURVEY.md §6); from the reference's own wall-clock evidence
(custom training loop with per-iteration host sync; PyG scatter kernels; tiny
bs-32 graphs leaving the GPU latency-bound) a ~10s ZINC epoch is a favorable
estimate → 312 steps × ~2.1k edges / 10s ≈ 67k edges/s. We set baseline =
100_000 edges/s (round, generous to the reference) and report vs_baseline
against it.
"""
import json
import time

import numpy as np


def main():
    import jax

    from graphgps_tpu.utils import enable_compile_cache
    enable_compile_cache()

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
    state, loss, _, _, _ = train_step(state, gb, rng)
    jax.block_until_ready(loss)

    windows = []
    for _ in range(5):
        iters = 300   # long windows dilute the tunnel's multi-ms latency spikes
        t0 = time.perf_counter()
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            state, loss, _, _, _ = train_step(state, gb, sub)
        jax.block_until_ready(loss)
        windows.append((time.perf_counter() - t0) / iters)
    step_s = min(windows)  # min-window = device capability; spikes are
    # environmental (tunnel), not workload — see docs/RESULTS.md caveats

    edges_per_sec = real_edges / step_s
    baseline = 1.0e5  # A100 reference estimate; derivation in module docstring
    print(json.dumps({
        "metric": "train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
