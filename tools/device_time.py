#!/usr/bin/env python
"""Tunnel-immune device-time measurement of the bench stages.

The axon tunnel makes host-side timing of TPU work unreliable in BOTH
directions (measured in this repo, round 3):

- every synchronous dispatch pays a ~30-35 ms host<->device round-trip, so
  per-step sync timing is RTT, not compute;
- ``jax.block_until_ready`` can return while a queued executable is still
  running (observed: a 543 ms 32-step scan dispatch "completed" in 3 ms),
  so enqueue-many-then-block windows can under-measure arbitrarily.

The one trustworthy clock is the TPU's own: ``jax.profiler.trace`` records
each XLA module execution on the device timeline ("XLA Modules" lane).
This tool runs a stage a few dispatches, parses that lane, and reports
median device-time per train step. Usage:

  python tools/device_time.py [zinc|voc|pcqm] [K]

K = steps fused per dispatch via lax.scan (1 = raw step executable).
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def module_times_ms(prof_dir):
    """Device-side execution times (ms) of every XLA module run in a trace."""
    paths = glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {prof_dir}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    proc, thr = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thr[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    out = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in proc.get(e["pid"], ""):
            continue
        if thr.get((e["pid"], e.get("tid")), "") != "XLA Modules":
            continue
        out.append((float(e["dur"]) / 1e3, e["name"]))
    return out


def measure(make_cfg, K=32, dispatches=4, label=""):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from graphgps_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg, dim_out = make_cfg(new_cfg)
    ds = load_dataset(cfg)
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    if K > 1:
        cfg.train.steps_per_dispatch = K
        loader = DeviceLoader(ds.train, batch_size=cfg.train.batch_size,
                              y_graph_level=cfg.dataset.task == "graph")
        _, gb = next(iter(loader))
        state = L.init_state(cfg, model, gb, 0, tx)
        step = jax.jit(L.scan_steps_core(cfg, model, tx, loader))
        tree = loader.arenas_tree
        n = loader.arenas.num_graphs_total
        rng = np.random.default_rng(0)
        sel = jnp.asarray(rng.integers(
            0, n, size=(K, cfg.train.batch_size)).astype(np.int32))
        key = L.run_key(cfg, 0)
        args = lambda i: (tree, state, sel, jax.random.fold_in(key, i))  # noqa: E731
        unpack = lambda out: out[0]  # noqa: E731
    else:
        loader = BatchLoader(ds.train, batch_size=cfg.train.batch_size,
                             shuffle=False,
                             y_graph_level=cfg.dataset.task == "graph")
        gb = next(iter(loader)).to_graph_batch()
        state = L.init_state(cfg, model, gb, 0, tx)
        raw = L._build_raw_steps(cfg, model, tx)["train"]
        key = L.run_key(cfg, 0)
        step = jax.jit(raw, donate_argnums=(0,))
        args = lambda i: (state, gb, jax.random.fold_in(key, i))  # noqa: E731
        unpack = lambda out: out[0]  # noqa: E731

    out = step(*args(0))                      # compile
    state = unpack(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])  # hard drain
    flops = None
    try:
        cost = jax.jit(step).lower(*args(0)).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])      # per dispatch (scan body 1x!)
    except Exception:
        pass

    prof_dir = f"/tmp/ggps_devtime_{label}_{K}"
    os.system(f"rm -rf {prof_dir}")
    with jax.profiler.trace(prof_dir):
        for i in range(dispatches):
            out = step(*args(i + 1))
            state = unpack(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])  # hard drain

    mods = module_times_ms(prof_dir)
    # keep only the dominant (train-step) module: the trace also catches
    # tiny fold_in/convert modules
    big = sorted((d for d, _ in mods), reverse=True)[:dispatches]
    med_dispatch = float(np.median(big))
    per_step = med_dispatch / K
    real_edges = int(np.asarray(gb.edge_mask).sum())
    res = dict(label=label, K=K, device_ms_per_step=round(per_step, 4),
               dispatch_ms=round(med_dispatch, 3),
               edges_per_sec=round(real_edges / (per_step / 1e3), 1))
    if flops:
        res["flops_per_dispatch_costmodel"] = flops
    return res


def main():
    import bench

    stage = sys.argv[1] if len(sys.argv) > 1 else "zinc"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base = {"zinc": bench._zinc_cfg, "voc": bench._voc512_cfg,
            "pcqm": bench._pcqm256_cfg}[stage]
    # optional dotted cfg overrides for A/B runs:
    #   python tools/device_time.py pcqm 8 mixed_precision=True parallel.remat=True
    overrides = sys.argv[3:]

    def make(new_cfg):
        cfg, dim_out = base(new_cfg)
        for ov in overrides:
            key, _, val = ov.partition("=")
            node = cfg
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            import ast
            try:
                node[parts[-1]] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                node[parts[-1]] = val
        return cfg, dim_out

    label = stage + ("_" + "_".join(o.replace(".", "_").replace("=", "")
                                    for o in overrides) if overrides else "")
    print(json.dumps(measure(make, K=K, label=label)))


if __name__ == "__main__":
    main()
