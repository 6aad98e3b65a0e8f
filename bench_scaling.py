#!/usr/bin/env python
"""DP scaling-efficiency benchmark: per-chip throughput at 1..N devices.

On a multi-chip host this measures real ICI scaling (BASELINE.md target:
≥0.8 efficiency 1→2 hosts); with one chip it reports the single-device line
only. Prints one JSON line per device count.
"""
import json
import time

import numpy as np


def main():
    import jax
    from jax.sharding import Mesh

    from graphgps_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.parallel.mesh import shard_batch, shard_params

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16) if c <= len(devices)]

    base = None
    for n in counts:
        cfg = new_cfg()
        cfg.dataset.synth_num_graphs = 256
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
        cfg.gt.attn_dropout = 0.5         # keep the bench.py flagship recipe
        cfg.gnn.dim_inner = 64
        cfg.optim.clip_grad_norm = True
        bs = 32 * n                       # weak scaling: fixed per-chip batch
        cfg.train.batch_size = bs

        ds = load_dataset(cfg)
        graphs = (ds.train * ((bs // len(ds.train)) + 1))[:bs]
        loader = BatchLoader(graphs, batch_size=bs, shuffle=False)
        hb = next(iter(loader))
        gb = hb.to_graph_batch()
        real_edges = int(np.asarray(hb.arrays["edge_mask"]).sum())

        model = build_model(cfg, 1)
        tx = make_tx(cfg)
        state = L.init_state(cfg, model, gb, 0, tx)
        train_step, _, _, _ = L.make_steps(cfg, model, tx)

        mesh = Mesh(np.asarray(devices[:n]).reshape(n, 1), ("data", "model"))
        state = shard_params(state, mesh)
        gb = shard_batch(gb, mesh)

        rng = jax.random.PRNGKey(0)
        state, loss, *_ = train_step(state, gb, rng)
        # hard drain — block_until_ready can return early through the axon
        # tunnel (see bench.py module docstring)
        np.asarray(jax.device_get(loss)).ravel()[:1]
        windows = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(50):
                rng, sub = jax.random.split(rng)
                state, loss, *_ = train_step(state, gb, sub)
            np.asarray(jax.device_get(loss)).ravel()[:1]
            windows.append((time.perf_counter() - t0) / 50)
        step_s = sorted(windows)[len(windows) // 2]
        eps_chip = real_edges / step_s / n
        if base is None:
            base = eps_chip
        print(json.dumps({
            "metric": "dp_scaling", "devices": n,
            "edges_per_sec_per_chip": round(eps_chip, 1),
            "efficiency_vs_1chip": round(eps_chip / base, 3),
            "unit": "edges/s/chip",
        }))


if __name__ == "__main__":
    main()
