"""Fine-tuning / pretrained-model loading.

Capability parity with /root/reference/graphgps/finetuning.py:10-152:
- find the last checkpoint of a pretrained run dir,
- merge the pretrained run's config into the current one with strict
  compatibility checks on model-defining fields and lenient copies of the rest,
- load pretrained weights into a freshly-built model, optionally resetting the
  prediction head and/or freezing the body.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

log = logging.getLogger("graphgps_tpu")

# Fields that must MATCH between the pretrained cfg and the current cfg
# (reference finetuning.py:63-75 compare_cfg strict list).
_STRICT_FIELDS = [
    ("model", "type"),
    ("gt", "layer_type"), ("gt", "layers"), ("gt", "n_heads"),
    ("gt", "dim_hidden"),
    ("gnn", "head"),
]
# Fields copied FROM the pretrained cfg (lenient; reference finetuning.py:77-97).
_COPY_GROUPS = ["gt", "gnn", "graphormer"]
_COPY_POSENC = True


def get_final_pretrained_ckpt(ckpt_dir: str) -> str:
    """Path of the highest-epoch checkpoint (reference finetuning.py:10-17).

    Accepts <run>/ckpt directly, or an experiment-level parent whose lowest
    seed subdir holds the ckpt (so pretrained.dir may point at either level,
    consistent with load_pretrained_model_cfg)."""
    if not os.path.isdir(ckpt_dir):
        parent = os.path.dirname(ckpt_dir)   # the pretrained.dir itself
        seeds = sorted((d for d in os.listdir(parent)
                        if d.isdigit() and os.path.isdir(
                            os.path.join(parent, d, "ckpt"))),
                       key=int) if os.path.isdir(parent) else []
        if seeds:
            ckpt_dir = os.path.join(parent, seeds[0], "ckpt")
        else:
            raise FileNotFoundError(f"no pretrained ckpt dir: {ckpt_dir}")
    epochs = sorted(int(x) for x in os.listdir(ckpt_dir) if x.isdigit())
    if not epochs:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    return os.path.join(ckpt_dir, str(epochs[-1]))


def load_pretrained_model_cfg(cfg) -> Any:
    """Merge the pretrained run's dumped config into cfg
    (reference finetuning.py:48-97)."""
    import yaml

    pdir = os.path.abspath(cfg.pretrained.dir)
    # config.yaml is dumped at the experiment level; checkpoints per seed dir —
    # accept pretrained.dir pointing at either (abspath so a bare relative
    # name can never fall back to the launch directory's config.yaml)
    for cand in (os.path.join(pdir, "config.yaml"),
                 os.path.join(os.path.dirname(pdir), "config.yaml")):
        if os.path.exists(cand):
            cfg_path = cand
            break
    else:
        raise FileNotFoundError(f"pretrained config not found under {pdir}")
    with open(cfg_path) as f:
        pre = yaml.safe_load(f)

    def get(d, *keys):
        for k in keys:
            d = d[k]
        return d

    for group, field in _STRICT_FIELDS:
        pre_v = get(pre, group, field)
        cur_v = cfg[group][field]
        if cur_v != pre_v:
            log.warning("finetuning: overriding %s.%s: %r -> %r (pretrained)",
                        group, field, cur_v, pre_v)
            cfg[group][field] = pre_v
    for group in _COPY_GROUPS:
        if group in pre:
            for k, v in pre[group].items():
                if k in cfg[group] and not isinstance(v, dict):
                    cfg[group][k] = v
                elif k in cfg[group] and isinstance(v, dict):
                    for k2, v2 in v.items():
                        if k2 in cfg[group][k] and not isinstance(v2, dict):
                            cfg[group][k][k2] = v2
    if _COPY_POSENC:
        for key in list(pre):
            if key.startswith("posenc_") and key in cfg:
                for k, v in pre[key].items():
                    if k in cfg[key] and not isinstance(v, dict):
                        cfg[key][k] = v
                    elif k in cfg[key] and isinstance(v, dict):
                        for k2, v2 in v.items():
                            if k2 in cfg[key][k]:
                                cfg[key][k][k2] = v2
    # dataset encoders define input dims — must follow the pretrained model
    for k in ("node_encoder_name", "node_encoder_num_types",
              "edge_encoder_name", "edge_encoder_num_types"):
        if k in pre.get("dataset", {}):
            cfg.dataset[k] = pre["dataset"][k]
    return cfg


def _tree_update(dst: Dict, src: Dict, skip_prefix: Tuple[str, ...],
                 path: str = "") -> int:
    """Copy matching-shape leaves of src into dst, skipping head params.
    Returns number of leaves copied."""
    n = 0
    for k, v in src.items():
        p = f"{path}/{k}" if path else k
        if any(p.startswith(s) or k.startswith(s) for s in skip_prefix):
            log.info("finetuning: skipping %s (prediction head reset)", p)
            continue
        if isinstance(v, dict):
            if k in dst and isinstance(dst[k], dict):
                n += _tree_update(dst[k], v, skip_prefix, p)
        elif k in dst:
            if np.shape(dst[k]) == np.shape(v):
                dst[k] = v
                n += 1
            else:
                log.warning("finetuning: shape mismatch at %s: %s vs %s — kept init",
                            p, np.shape(dst[k]), np.shape(v))
    return n


# Flax module-name prefixes of prediction heads (the post_mp analog,
# reference finetuning.py:99-127 drops 'post_mp.*').
HEAD_PREFIXES = ("SANGraphHead", "GNNGraphHead", "InductiveNodeHead",
                 "GraphormerGraphHead", "InductiveEdgeHead", "OGBCodeGraphHead",
                 "InferLinksHead")


def init_model_from_pretrained(state, cfg):
    """Load pretrained params/batch_stats into a fresh TrainState
    (reference finetuning.py:99-152). Optionally freeze all non-head params
    (freezing is applied by the train loop through the returned mask).

    NOTE: parallel.scan_layers changes the parameter tree (stacked
    ScanGPSScanBody vs per-layer GPSLayer_i); pretrained checkpoints only load
    into a model built with the SAME scan_layers setting — mismatched leaves
    are kept at their fresh init with a logged warning."""
    import orbax.checkpoint as ocp

    ckpt_path = get_final_pretrained_ckpt(
        os.path.join(os.path.abspath(cfg.pretrained.dir), "ckpt"))
    with ocp.PyTreeCheckpointer() as ckptr:
        # restore ONLY params/batch_stats: the finetune optimizer structure
        # (e.g. freeze via multi_transform) need not match the pretrained
        # run's opt_state, which is irrelevant here anyway
        template = {
            "params": jax.device_get(state.params),
            "batch_stats": dict(jax.device_get(state.batch_stats)),
        }
        restored = ckptr.restore(
            os.path.abspath(ckpt_path),
            args=ocp.args.PyTreeRestore(item=template, partial_restore=True))

    skip = HEAD_PREFIXES if cfg.pretrained.reset_prediction_head else ()
    params = jax.tree_util.tree_map(np.asarray, dict(jax.device_get(state.params)))
    n = _tree_update(params, restored["params"], skip)
    log.info("finetuning: loaded %d param tensors from %s", n, ckpt_path)
    bs = jax.tree_util.tree_map(np.asarray, dict(jax.device_get(state.batch_stats)))
    _tree_update(bs, restored["batch_stats"], skip)

    from .train.loop import TrainState
    new_state = TrainState(params=params, batch_stats=bs,
                           opt_state=state.opt_state, step=state.step)
    freeze_mask = None
    if cfg.pretrained.freeze_main:
        freeze_mask = freeze_body_mask(params)
    return new_state, freeze_mask


def freeze_body_mask(params) -> Any:
    """Pytree of bools: True = trainable (head), False = frozen body
    (reference finetuning.py:144-152 requires_grad_=False on body)."""

    def walk(d, in_head):
        out = {}
        for k, v in d.items():
            head = in_head or any(k.startswith(p) for p in HEAD_PREFIXES)
            out[k] = walk(v, head) if isinstance(v, dict) else head
        return out

    return walk(params, False)
