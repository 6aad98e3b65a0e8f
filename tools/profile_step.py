#!/usr/bin/env python
"""Capture a jax.profiler trace of one benchmark stage and print the
per-kernel device-time breakdown, grouped by HLO source component, for
op-count tuning.

Usage: python tools/profile_step.py [stage] [K]
  stage: zinc (default) | voc | pcqm
  K:     steps_per_dispatch (default 32)

One workload per process (docs/RESULTS.md dispatch-degradation note); run on
an idle chip.
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _component(op_name: str) -> str:
    """Collapse an HLO op_name path to a readable component bucket."""
    if not op_name:
        return "(unattributed)"
    m = re.search(r"GPSLayer_\d+/([A-Za-z]+_\d+|[a-z_]+)", op_name)
    tag = ""
    if "transpose(jvp" in op_name:
        tag = " [bwd]"
    elif "jvp(" in op_name:
        tag = " [fwd]"
    if m:
        part = m.group(1)
        part = re.sub(r"_\d+$", "", part)
        return f"GPSLayer/{part}{tag}"
    for pat in ("FeatureEncoder", "GNNHead", "SANHead", "Norm",
                "MaskedBatchNorm"):
        if pat in op_name:
            return pat + tag
    # strip jit wrapper and take the most specific call-site name
    core = op_name.split("/")[-1]
    return core[:40] + tag


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "zinc"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    make_cfg = {"zinc": bench._zinc_cfg, "voc": bench._voc512_cfg,
                "pcqm": bench._pcqm256_cfg,
                "malnet": bench._malnet5k_cfg}[stage]
    cfg, dim_out = make_cfg(new_cfg)
    cfg.train.steps_per_dispatch = K
    ds = load_dataset(cfg)
    B = cfg.train.batch_size
    loader = DeviceLoader(ds.train, batch_size=B,
                          y_graph_level=cfg.dataset.task == "graph")
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    _, gb = next(iter(loader))
    state = L.init_state(cfg, model, gb, 0, tx)
    # GGPS_PROFILE_GUARD=0 profiles the guard-free executable variant
    guard = os.environ.get("GGPS_PROFILE_GUARD", "1") == "1"
    jitted = jax.jit(L.scan_steps_core(cfg, model, tx, loader, guard=guard))
    tree = loader.arenas_tree

    n = loader.arenas.num_graphs_total
    rng = np.random.default_rng(0)
    sel = jnp.asarray(rng.integers(0, n, size=(K, B)).astype(np.int32))
    key = L.run_key(cfg, 0)
    state, losses, *_ = jitted(tree, state, sel, key)  # compile
    jax.block_until_ready(losses)
    # optimized HLO for instruction-name -> source-component attribution
    hlo = jitted.lower(tree, state, sel, key).compile().as_text()
    src_of = {}
    for mm in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?op_name=\"([^\"]*)\"", hlo):
        src_of[mm.group(1)] = mm.group(2)

    for g in range(5):  # warm
        state, losses, *_ = jitted(tree, state, sel, jax.random.fold_in(key, g))
    jax.block_until_ready(losses)

    # Untraced wall measurement with a HARD DRAIN (device→host fetch):
    # jax.block_until_ready can return early through the axon tunnel (see
    # bench.py docstring), so we fetch a value and subtract the measured
    # tunnel round-trip. Cross-checks the traced device clock below.
    import time as _time
    trivial = jax.jit(lambda a: a + 1.0)
    np.asarray(jax.device_get(trivial(jnp.zeros((8,)))))
    t0 = _time.perf_counter()
    np.asarray(jax.device_get(trivial(jnp.zeros((8,)))))
    rtt = _time.perf_counter() - t0
    reps = 3
    t0 = _time.perf_counter()
    for g in range(reps):
        state, losses, *_ = jitted(tree, state, sel,
                                   jax.random.fold_in(key, 50 + g))
    np.asarray(jax.device_get(losses)).ravel()[:1]
    untraced_ms = (_time.perf_counter() - t0 - rtt) / (reps * K) * 1e3

    prof_dir = f"/tmp/ggps_profile_{stage}_{K}"
    os.system(f"rm -rf {prof_dir}")
    with jax.profiler.trace(prof_dir):
        for g in range(4):
            state, losses, *_ = jitted(tree, state, sel,
                                       jax.random.fold_in(key, 100 + g))
        jax.block_until_ready(losses)

    # ---- parse the trace: aggregate device-stream events ------------------
    paths = glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {prof_dir}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    proc = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in proc.items()
                if "TPU" in nm or "/device" in nm.lower()}
    # restrict to the "XLA Ops" lane; the "XLA Modules"/"Steps" lanes (and
    # their numeric-named duplicates inside the ops lane) are whole-dispatch
    # rollups that would double-count everything
    thr = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thr[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0])          # per HLO instruction
    byc = defaultdict(lambda: [0.0, 0])          # per source component
    total = 0.0
    nsteps = 4 * K
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = thr.get((e["pid"], e.get("tid")), "")
        if lane and "XLA Ops" not in lane:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("while") or \
                name.replace(".", "").isdigit():
            continue  # rollups (module executions mirror into the ops lane
            # as bare-numeric names)
        dur = float(e.get("dur", 0.0))
        agg[name][0] += dur
        agg[name][1] += 1
        byc[_component(src_of.get(name, ""))][0] += dur
        byc[_component(src_of.get(name, ""))][1] += 1
        total += dur

    print(f"\n=== {stage} K={K}: device events over {nsteps} steps ===")
    nk = sum(c for _, c in agg.values())
    print(f"untraced step time {untraced_ms:.4f} ms/step (drained wall);"
          f" traced ops sum {total / 1e3 / nsteps:.4f} ms/step (device clock"
          " — ops can overlap, so the sum may exceed elapsed device time)")
    scale = untraced_ms * 1e3 / total * nsteps if total else 0.0
    print(f"{nk / nsteps:.0f} events/step")
    print("\n-- by source component (scaled to untraced step) --")
    print(f"{'share%':>7} {'~us/step':>9} {'evts/step':>9}  component")
    for comp, (dur, cnt) in sorted(byc.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"{dur / total * 100:7.2f} {dur / nsteps * scale:9.2f}"
              f" {cnt / nsteps:9.1f}  {comp}")
    print("\n-- top HLO instructions --")
    print(f"{'share%':>7} {'~us/step':>9} {'calls':>6}  name | source")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for name, (dur, cnt) in rows[:30]:
        print(f"{dur / total * 100:7.2f} {dur / nsteps * scale:9.2f}"
              f" {cnt:6d}  {name[:40]} | {src_of.get(name, '')[-70:]}")

    # optional: top instructions whose SOURCE matches a filter substring
    # (PROFILE_FILTER=GatedGCN), layer index collapsed for aggregation
    filt = os.environ.get("PROFILE_FILTER")
    if filt:
        fagg = defaultdict(lambda: [0.0, 0])
        for name, (dur, cnt) in agg.items():
            src = src_of.get(name, "")
            if filt in src:
                key = re.sub(r"GPSLayer_\d+", "GPSLayer", src)[-100:]
                fagg[key][0] += dur
                fagg[key][1] += cnt
        print(f"\n-- instructions with source ~ {filt!r} --")
        for key, (dur, cnt) in sorted(fagg.items(), key=lambda kv: -kv[1][0])[:40]:
            print(f"{dur / total * 100:7.2f} {dur / nsteps * scale:9.2f}"
                  f" {cnt:6d}  {key}")
    print(json.dumps({"stage": stage, "K": K,
                      "untraced_ms_per_step": round(untraced_ms, 4),
                      "traced_ops_ms_per_step": round(total / 1e3 / nsteps, 4),
                      "events_per_step": round(nk / nsteps, 1)}))


if __name__ == "__main__":
    main()
