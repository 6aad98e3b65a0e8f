"""Config system: nested config tree + YAML + dotted CLI overrides.

Capability parity with the reference's yacs ``CfgNode`` global + ~11
``register_config`` extenders (SURVEY.md §2.2; /root/reference/graphgps/config/*,
gt_config.py:5-72, posenc_config.py:6-87) — but NOT a global mutable singleton:
``new_cfg()`` returns a fresh tree that is threaded explicitly. ``times_func``
strings are parsed safely (no ``eval``, unlike
/root/reference/graphgps/loader/master_loader.py:195-196).
"""
from __future__ import annotations

import copy
import re
from typing import Any, List, Optional

import yaml


class CfgNode(dict):
    """dict with attribute access; nested trees of plain data."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()}


class FrozenCfg:
    """Immutable attribute-access view of a CfgNode for use as a flax Module
    field (flax would coerce a raw dict into FrozenDict, losing attr access)."""

    __slots__ = ("_d", "_h")

    def __init__(self, d):
        object.__setattr__(self, "_d", d)
        object.__setattr__(self, "_h", None)

    def __getattr__(self, k):
        try:
            v = self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return FrozenCfg(v) if isinstance(v, dict) else v

    def __getitem__(self, k):
        v = self._d[k]
        return FrozenCfg(v) if isinstance(v, dict) else v

    def __contains__(self, k):
        return k in self._d

    def get(self, k, default=None):
        v = self._d.get(k, default)
        return FrozenCfg(v) if isinstance(v, dict) else v

    def keys(self):
        return self._d.keys()

    def __setattr__(self, k, v):
        raise AttributeError("FrozenCfg is immutable")

    def __eq__(self, other):
        return isinstance(other, FrozenCfg) and self._d == other._d

    def __hash__(self):
        if self._h is None:
            object.__setattr__(self, "_h", hash(repr(_plain(self._d))))
        return self._h


def _plain(d):
    return {k: (_plain(v) if isinstance(v, dict) else v) for k, v in d.items()}


def _node(**kw) -> CfgNode:
    n = CfgNode()
    for k, v in kw.items():
        n[k] = v
    return n


def _posenc_group(**extra) -> CfgNode:
    """One posenc_* group (reference posenc_config.py:6-87)."""
    g = _node(
        enable=False,
        model="none",        # Transformer / DeepSet / Linear / MLP / none
        dim_pe=16,
        layers=3,
        n_heads=4,
        post_layers=0,
        raw_norm_type="none",  # none / BatchNorm
        pass_as_var=False,
    )
    g.eigen = _node(laplacian_norm="sym", eigvec_norm="L2", max_freqs=10)
    g.kernel = _node(times=[], times_func="")
    for k, v in extra.items():
        g[k] = v
    return g


def new_cfg() -> CfgNode:
    """Build the full default config tree."""
    cfg = CfgNode()

    # --- top-level run management (reference main.py:51-113, defaults_config.py) ---
    cfg.out_dir = "results"
    cfg.cfg_dest = "config.yaml"
    cfg.name_tag = ""
    cfg.seed = 0
    cfg.round = 5                      # float display precision in logs
    cfg.run_id = 0
    cfg.repeat = 1
    cfg.run_multiple_splits = []
    cfg.metric_best = "auto"
    cfg.metric_agg = "argmax"          # argmax / argmin over eval epochs
    cfg.bn = _node(eps=1e-5, mom=0.1)
    cfg.accelerator = "auto"           # tpu / cpu / auto
    cfg.devices = 1
    # bf16 storage/compute policy with f32 master params (train/precision.py).
    # Off by default: on v5e, XLA's default matmul precision already runs f32
    # matmuls on the MXU via bf16 passes, and measured A/B at ZINC/VOC-512/
    # PCQM-deep shapes shows the explicit policy's cast overhead outweighs the
    # HBM savings at GraphGPS model sizes (docs/RESULTS.md). Enable for very
    # wide models / memory-bound regimes.
    cfg.mixed_precision = False
    cfg.tensorboard_each_run = False
    cfg.tensorboard_agg = True

    # --- dataset ---------------------------------------------------------------
    cfg.dataset = _node(
        format="synthetic", name="zinc-like", dir="./datasets",
        task="graph",                  # graph / node / edge
        task_type="regression",        # regression / classification /
                                       # classification_binary / classification_multilabel /
                                       # subtoken_prediction
        transductive=False,
        node_encoder=True, node_encoder_name="TypeDictNode",
        node_encoder_num_types=28, node_encoder_bn=False,
        # GraphGym YAML-compat: accepted + warned-if-set, unused (encoder
        # dims come from gnn.dim_inner / gt.dim_hidden) — validate_cfg
        encoder_dim=128,
        edge_encoder=True, edge_encoder_name="TypeDictEdge",
        edge_encoder_num_types=4, edge_encoder_bn=False,
        slic_compactness=10,
        infer_link_label="none",
        # PCQM4Mv2Contact link prediction (reference master_loader.py:486-487)
        resample_negative=False,
        contact_neg_sampling="structured",  # structured / random / complete
        # MalNetTiny feature set when dataset.name is not one of the
        # reference's choices (Constant / OneHotDegree / LocalDegreeProfile)
        malnet_features="LocalDegreeProfile",
        split_mode="standard",         # standard / random / cv-<k> / fixed / sliced
        split_index=0,
        split=[0.8, 0.1, 0.1],
        split_dir="./splits",
        shuffle_split=True,
        # static shape buckets (TPU): 0 = auto from dataset maxima
        max_nodes=0, max_edges=0,
        # device-arena PE row dtype ("" = float32; "bfloat16" halves the
        # dominant float arena at PCQM4Mv2-full scale, cast back on gather)
        device_pe_dtype="",
        # device-batched PE precompute (pe/device.py) when the enabled types
        # support it; host numpy engine otherwise
        posenc_device=False,
        # synthetic generator knobs (hermetic runs without network egress)
        synthetic_fallback=True,
        synth_num_graphs=1200, synth_min_nodes=10, synth_max_nodes=36,
        synth_num_tasks=1, synth_seed=42,
    )

    # runtime-computed shared dims (GraphGym cfg.share capability)
    cfg.share = _node(dim_in=0, dim_out=1, num_splits=3)

    # --- train -----------------------------------------------------------------
    cfg.train = _node(
        mode="custom", batch_size=32, eval_period=1,
        ckpt_period=100, enable_ckpt=True, ckpt_best=False, ckpt_clean=True,
        # orbax AsyncCheckpointer: serialization+IO overlap training; the
        # loop waits the previous write out before each new save/clean/read
        ckpt_async=True,
        auto_resume=False, epoch_resume=-1, finetune="",
        sampler="full_batch",
        log_attn_weights=False,   # harvest per-layer attention (analysis mode)
        device_loader=True,       # device-side batch assembly when possible
        # K optimizer steps per dispatch via lax.scan (DeviceLoader only;
        # amortizes dispatch latency on tiny-graph recipes — see
        # train/loop.py make_scan_steps). 1 = classic one-step dispatch.
        steps_per_dispatch=1,
        # with --repeat S: vmap ALL seeds' training onto one chip at once
        # (train/multiseed.py) — small recipes train S seeds in ~1x wall time
        parallel_seeds=False,
        profiler=False,           # jax.profiler trace of one post-compile epoch
        # PRNG implementation for the run's random streams (param init,
        # dropout, sign flips). 'rbg' generates mask bits with the TPU
        # hardware generator (XLA RngBitGenerator) while key derivation
        # (split/fold_in) stays threefry — measured 1.65x faster flagship
        # train steps than pure 'threefry', whose per-mask bit chains XLA
        # rematerializes into the attention backward (docs/RESULTS.md).
        # 'threefry' restores JAX's default bit-exact streams.
        rng_impl="rbg",
        # elastic recovery: on SIGTERM/SIGUSR1 (pod preemption notice) finish
        # the current epoch, checkpoint synchronously, and exit cleanly so an
        # auto_resume relaunch continues where it stopped (train/loop.py
        # install_preemption_handler; SURVEY.md §5 failure detection)
        preempt_save=True,
    )

    # --- model -----------------------------------------------------------------
    cfg.model = _node(
        type="GPSModel", loss_fun="l1", size_average="mean",
        thresh=0.5, edge_decoding="dot", graph_pooling="add",
    )

    # --- gnn (local MPNN / plain-GNN network knobs) ----------------------------
    cfg.gnn = _node(
        head="san_graph", layers_pre_mp=0, layers_mp=2, layers_post_mp=0,
        dim_inner=64, layer_type="gineconv", stage_type="stack",
        batchnorm=True, act="relu", dropout=0.0, agg="mean",
        normalize_adj=False, residual=False, att_heads=1,
    )

    # --- gt (graph-transformer / GPS knobs; reference gt_config.py:5-72) -------
    cfg.gt = _node(
        layer_type="GINE+Transformer", layers=4, n_heads=4, dim_hidden=64,
        full_graph=True, gamma=1e-5, gamma_learnable=False,
        pna_degrees=[], dropout=0.0, attn_dropout=0.0,
        layer_norm=False, batch_norm=True, residual=True,
        # global-attention implementation: auto (measured size dispatch:
        # dense ≤1024 nodes, chunked online-softmax above — see
        # ops/pallas/flash_mha.py docstring table), dense / chunked / flash
        # (force the named exact path), fused (Pallas fused
        # proj+MHA+proj kernel for small-N Transformer shapes,
        # ops/pallas/fused_gps_attn.py), ring (node-axis sequence
        # parallelism over the mesh 'model' axis — parallel/ring_attention.py)
        attn_impl="auto",
    )
    # Performer options of the vendored stack (reference performer_layer.py
    # :421-513): some heads use bucketed local-window attention instead of
    # FAVOR+ (window ± 1 bucket, the LocalAttention look_forward=1 semantics)
    cfg.gt.performer = _node(local_attn_heads=0, local_window_size=256)
    cfg.gt.bigbird = _node(
        attention_type="block_sparse", chunk_size_feed_forward=0,
        is_decoder=False, add_cross_attention=False,
        use_bias=False, num_random_blocks=3, block_size=3, layer_norm_eps=1e-6,
        max_position_embeddings=128, use_position_embeddings=False,
    )

    # --- graphormer (reference graphormer_config.py:6-26) ----------------------
    cfg.graphormer = _node(
        num_layers=6, embed_dim=80, num_heads=4, dropout=0.0,
        attention_dropout=0.0, mlp_dropout=0.0, input_dropout=0.0,
        use_graph_token=True,
    )

    # --- positional encodings --------------------------------------------------
    cfg.posenc_LapPE = _posenc_group()
    cfg.posenc_SignNet = _posenc_group(phi_out_dim=4, phi_hidden_dim=64)
    cfg.posenc_RWSE = _posenc_group()
    cfg.posenc_HKdiagSE = _posenc_group()
    cfg.posenc_ElstaticSE = _posenc_group()
    cfg.posenc_EquivStableLapPE = _posenc_group()
    cfg.posenc_GraphormerBias = _posenc_group(
        node_degrees_only=False, num_spatial_types=20, num_in_degrees=64,
        num_out_degrees=64, directed_graphs=False, has_edge_attr=True,
    )

    # --- optim (reference optimizers_config.py:4-28, extra_optimizers.py) ------
    cfg.optim = _node(
        optimizer="adamW", base_lr=1e-3, weight_decay=0.0, momentum=0.9,
        max_epoch=100, scheduler="cosine_with_warmup", steps=[30, 60, 90],
        lr_decay=0.1, num_warmup_epochs=10, min_lr=0.0,
        reduce_factor=0.5, schedule_patience=10,
        clip_grad_norm=False, clip_grad_norm_value=1.0,
        batch_accumulation=1,
        # run clip+optimizer over the ravel-flattened param vector: collapses
        # ~1k per-leaf kernels/step into a few fused ones (optimizers.py
        # flat_ravel). Auto-disabled for finetune-freeze masks and TP.
        fused_flat=True,
    )

    # --- observability ---------------------------------------------------------
    cfg.wandb = _node(use=False, entity="", project="graphgps-tpu", name="")
    cfg.pretrained = _node(dir="", reset_prediction_head=True, freeze_main=False)

    # --- parallelism (new capability; SURVEY.md §2.10) -------------------------
    cfg.parallel = _node(
        data_axis=1,                  # devices on the data axis (0/1 = auto)
        model_axis=1,                 # tensor-parallel width of FFN/attention
        edge_partition=False,         # shard local-GNN aggregations over the
                                      # 'model' mesh axis (ops/segment.py →
                                      # parallel/edge_partition.py)
        mesh_shape=[],                # explicit [data, model]; [] = auto
        remat=False,                  # jax.checkpoint over GPS layers
        scan_layers=False,            # nn.scan over GPS layers (1 trace per
                                      # stack — much faster compiles)
        donate=True,
    )

    # registered extender hooks
    from ..registry import config_dict
    for fn in config_dict.values():
        fn(cfg)
    return cfg


_RANGE_RE = re.compile(r"^range\(\s*(-?\d+)\s*(?:,\s*(-?\d+)\s*)?(?:,\s*(-?\d+)\s*)?\)$")


def parse_times_func(s: str) -> List[int]:
    """Safely parse 'range(a,b[,c])' or comma list (no eval; cf. reference
    master_loader.py:195-196 which eval()s this)."""
    s = s.strip()
    if not s:
        return []
    m = _RANGE_RE.match(s)
    if m:
        a = int(m.group(1))
        b = m.group(2)
        c = m.group(3)
        if b is None:
            return list(range(a))
        return list(range(a, int(b), int(c) if c else 1))
    return [int(t) for t in s.replace("[", "").replace("]", "").split(",") if t.strip()]


def _merge(dst: CfgNode, src: dict, path: str = "") -> None:
    for k, v in src.items():
        kp = f"{path}.{k}" if path else k
        if isinstance(v, dict) and isinstance(dst.get(k), CfgNode):
            _merge(dst[k], v, kp)
        else:
            if k not in dst:
                raise KeyError(f"unknown config key: {kp}")
            dst[k] = _coerce(dst[k], v, kp)


def _coerce(old: Any, new: Any, key: str) -> Any:
    if old is None or new is None:
        return new
    if isinstance(old, bool):
        if isinstance(new, bool):
            return new
        if isinstance(new, str):
            return new.lower() in ("true", "1", "yes")
        return bool(new)
    if isinstance(old, int) and not isinstance(old, bool):
        if isinstance(new, float) and new != int(new):
            return new  # allow int default promoted by float override (e.g. gamma)
        return int(new)
    if isinstance(old, float):
        return float(new)
    if isinstance(old, str):
        return str(new)
    if isinstance(old, list):
        return list(new) if isinstance(new, (list, tuple)) else yaml.safe_load(str(new))
    return new


def load_cfg(cfg: CfgNode, yaml_path: str) -> CfgNode:
    with open(yaml_path) as f:
        raw = yaml.safe_load(f) or {}
    _merge(cfg, raw)
    return cfg


def _parse_opt_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except Exception:
        return s


def update_from_list(cfg: CfgNode, opts: List[str]) -> CfgNode:
    """Dotted CLI overrides: ['optim.base_lr', '0.01', 'wandb.use', 'False']."""
    if len(opts) % 2 != 0:
        raise ValueError("override list must be key value pairs")
    for key, val in zip(opts[::2], opts[1::2]):
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            raise KeyError(f"unknown config key: {key}")
        node[leaf] = _coerce(node[leaf], _parse_opt_value(str(val)), key)
    return cfg


def dump_cfg(cfg: CfgNode, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def validate_cfg(cfg: CfgNode) -> None:
    """Reject accepted-for-parity knobs whose non-default values this
    framework does not implement — silently training a different model than
    the config says is the bug class this guards against (VERDICT r2 weak #4).
    """
    if cfg.train.sampler != "full_batch":
        raise ValueError(
            f"train.sampler={cfg.train.sampler!r}: only 'full_batch' is "
            "supported (the reference's graph tasks use no other sampler)")
    if cfg.gnn.stage_type not in ("stack", "skipsum"):
        raise ValueError(
            f"gnn.stage_type={cfg.gnn.stage_type!r}: 'skipconcat' is not "
            "implemented (use 'stack' or 'skipsum')")
    if cfg.gnn.normalize_adj:
        raise ValueError(
            "gnn.normalize_adj=True is a GraphGym generalconv knob; the "
            "supported conv stacks normalize internally (gcnconv) or not at "
            "all — set it False")
    bb = cfg.gt.bigbird
    if bb.is_decoder or bb.add_cross_attention:
        raise ValueError(
            "gt.bigbird.is_decoder / add_cross_attention: decoder-style "
            "BigBird is meaningless for graph attention and not implemented")
    if bb.chunk_size_feed_forward:
        raise ValueError(
            "gt.bigbird.chunk_size_feed_forward: HF's FFN memory chunking is "
            "unnecessary under XLA fusion; set 0 (use gt.remat for memory)")
    if bb.use_position_embeddings:
        raise ValueError(
            "gt.bigbird.use_position_embeddings: node sequences have no "
            "positional order; the reference defines but never reads this "
            "knob (vendored bigbird_layer.py reads only max_position_"
            "embeddings) — set it False")
    if cfg.model.size_average not in ("mean", "sum"):
        raise ValueError(
            f"model.size_average={cfg.model.size_average!r}: use 'mean'/'sum'")
    if cfg.dataset.encoder_dim != 128:
        # accepted so dumped GraphGym YAMLs (which include every default)
        # still load; this framework derives encoder dims from
        # gnn.dim_inner / gt.dim_hidden like the reference's composed
        # encoders, so the knob has no effect
        import logging
        logging.getLogger("graphgps_tpu").warning(
            "dataset.encoder_dim=%s is accepted for GraphGym YAML compat "
            "but unused: encoder dims come from gnn.dim_inner/gt.dim_hidden",
            cfg.dataset.encoder_dim)


def resolve_metric_best(cfg: CfgNode) -> str:
    """'auto' → task-appropriate default (reference logger behavior)."""
    if cfg.metric_best != "auto":
        # the stats key for ROC-AUC is 'auc' (reference logger.py:91);
        # accept the common 'auroc' spelling — round 5 found five generated
        # configs using it, which silently fell back to argmax-on-LOSS in
        # best-epoch selection
        if cfg.metric_best == "auroc":
            return "auc"
        return cfg.metric_best
    tt = cfg.dataset.task_type
    if "classification_multilabel" in tt:
        return "ap"
    if "classification" in tt:
        return "accuracy"
    return "mae"


def enabled_posenc(cfg: CfgNode) -> List[str]:
    names = []
    for k in cfg:
        if k.startswith("posenc_") and cfg[k].get("enable", False):
            names.append(k[len("posenc_"):])
    return names
