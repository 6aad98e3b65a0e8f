"""Every shipped recipe must parse against the config schema (full smoke
training for all of them lives in tools/smoke_configs.py — one command; here
a fast subset trains 1 epoch so the suite exercises config plumbing)."""
import glob
import os

import numpy as np
import pytest

from graphgps_tpu.config.config import load_cfg, new_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))

FAST_TRAIN = ["GPS/zinc-GPS.yaml", "SAN/peptides-func-SAN.yaml",
              "GatedGCN/peptides-struct-GatedGCN.yaml",
              "GPS/webkb-tex-GPS.yaml"]


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[os.path.relpath(p, os.path.join(REPO, "configs"))
                              for p in ALL_CONFIGS])
def test_config_parses(path):
    cfg = new_cfg()
    load_cfg(cfg, path)  # unknown keys / type mismatches raise


@pytest.mark.parametrize("rel", FAST_TRAIN)
def test_config_trains_one_epoch(rel, tmp_path):
    import json

    from graphgps_tpu.driver import main

    path = os.path.join(REPO, "configs", rel)
    main(["--cfg", path, "out_dir", str(tmp_path / "out"),
          "dataset.synth_num_graphs", "16", "dataset.synth_max_nodes", "10",
          "train.batch_size", "4", "train.enable_ckpt", "False",
          "train.eval_period", "1",
          "optim.max_epoch", "1", "optim.num_warmup_epochs", "1",
          "optim.batch_accumulation", "1"])
    name = os.path.splitext(os.path.basename(path))[0]
    stats = tmp_path / "out" / name / "0" / "val" / "stats.json"
    rows = [json.loads(l) for l in stats.read_text().splitlines()]
    assert np.isfinite(rows[-1]["loss"])
