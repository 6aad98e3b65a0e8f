#!/usr/bin/env python3
"""Train EVERY recipe in configs/ for 2 epochs on tiny data — the analog of
the reference's tests/graph_run.sh smoke battery (tests/configs/graph/*.yaml,
reference tests/graph_run.sh:13-42), in one command:

    python tools/smoke_configs.py            # all recipes
    python tools/smoke_configs.py GPS/zinc   # substring filter

Each run keeps the recipe's full model architecture and only overrides data
volume / epochs / checkpointing. Exits non-zero if any recipe fails.
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# recipes that need artifacts a hermetic smoke run cannot fabricate
SKIP = {
    "GPS/pcqm4m-GPSdeep-inference.yaml": "needs a pretrained checkpoint dir",
    "GPS/zinc-GPS+RWSE-inference.yaml": "needs a pretrained checkpoint dir",
}

OVERRIDES = [
    "dataset.synth_num_graphs", "24",
    "dataset.synth_max_nodes", "12",
    "train.batch_size", "4",
    "train.enable_ckpt", "False",
    "optim.max_epoch", "2",
    "optim.num_warmup_epochs", "1",
    "optim.batch_accumulation", "1",
    "wandb.use", "False",
]


def run_one(cfg_path: str, out_root: str) -> None:
    from graphgps_tpu.driver import main

    name = os.path.splitext(os.path.basename(cfg_path))[0]
    main(["--cfg", cfg_path, "out_dir", os.path.join(out_root, name)]
         + OVERRIDES)


def main() -> int:
    # FORCE CPU (don't setdefault: the axon sitecustomize presets
    # JAX_PLATFORMS=axon, which would silently run the whole battery on —
    # and contend for — the one TPU chip). GGPS_SMOKE_TPU=1 opts back in.
    if os.environ.get("GGPS_SMOKE_TPU", "0") != "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    sys.path.insert(0, REPO)

    pattern = sys.argv[1] if len(sys.argv) > 1 else ""
    cfgs = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))
    cfgs = [c for c in cfgs if pattern in os.path.relpath(c, REPO)]
    out_root = tempfile.mkdtemp(prefix="ggps_smoke_")
    failed = []
    skipped = 0
    for cfg in cfgs:
        rel = os.path.relpath(cfg, os.path.join(REPO, "configs"))
        if rel in SKIP:
            skipped += 1
            print(f"SKIP {rel}: {SKIP[rel]}")
            continue
        t0 = time.time()
        try:
            run_one(cfg, out_root)
            print(f"OK   {rel} ({time.time() - t0:.1f}s)")
        except Exception:
            failed.append(rel)
            print(f"FAIL {rel}")
            traceback.print_exc()
    print(f"\n{len(cfgs) - len(failed) - skipped} ok, {len(failed)} failed,"
          f" {skipped} skipped")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
