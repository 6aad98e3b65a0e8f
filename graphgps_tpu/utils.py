"""Misc utilities: compile cache, wandb naming, dict flattening.

Capability parity with /root/reference/graphgps/utils.py (flatten_dict,
cfg_to_dict, make_wandb_name) plus TPU-environment helpers.
"""
from __future__ import annotations

import os
from typing import Any, Dict


def enable_compile_cache(path: str = "") -> None:
    """Enable jax's persistent compilation cache (XLA compiles through the
    remote-compile tunnel take minutes; the cache makes re-runs instant)."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def flatten_dict(d: Dict, prefix: str = "") -> Dict[str, Any]:
    """Nested dict → flat dotted keys (reference utils.py:68-84)."""
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key))
        else:
            out[key] = v
    return out


def make_wandb_name(cfg) -> str:
    """Auto-generated W&B run name (reference utils.py:108-144)."""
    dataset = f"{cfg.dataset.format}-{cfg.dataset.name}".replace("PyG-", "")
    model = cfg.model.type
    if cfg.model.type == "GPSModel":
        model = f"GPS.{cfg.gt.layer_type}"
    return f"{dataset}.{model}.r{cfg.run_id}"
