"""CLI driver end-to-end: config loading, overrides, multi-seed loop,
aggregation files (reference main.py:81-176 capabilities)."""
import json
import os

import numpy as np
import pytest

from graphgps_tpu.driver import main, parse_args, run_loop_settings
from graphgps_tpu.config.config import new_cfg


def test_parse_args_and_overrides(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("optim:\n  max_epoch: 3\n")
    args = parse_args(["--cfg", str(cfg_file), "--repeat", "2",
                       "optim.base_lr", "0.01"])
    assert args.repeat == 2
    assert args.opts == ["optim.base_lr", "0.01"]


def test_run_loop_settings_seeds():
    cfg = new_cfg()
    cfg.seed = 10
    ids, seeds, splits = run_loop_settings(cfg, repeat=3)
    assert seeds == [10, 11, 12]
    assert splits == [0, 0, 0]

    cfg.run_multiple_splits = [0, 1, 2]
    ids2, seeds2, splits2 = run_loop_settings(cfg, repeat=1)
    assert splits2 == [0, 1, 2]
    assert seeds2 == [10, 10, 10]
    with pytest.raises(NotImplementedError):
        run_loop_settings(cfg, repeat=2)


def test_main_multiseed_aggregation(tmp_path):
    cfg_file = tmp_path / "exp.yaml"
    cfg_file.write_text(f"""
out_dir: {tmp_path}/out
metric_best: mae
metric_agg: argmin
dataset:
  synth_num_graphs: 32
  synth_max_nodes: 12
train:
  batch_size: 8
  enable_ckpt: false
gt:
  layers: 1
  dim_hidden: 16
  n_heads: 2
gnn:
  dim_inner: 16
optim:
  max_epoch: 2
  num_warmup_epochs: 1
""")
    main(["--cfg", str(cfg_file), "--repeat", "2"])
    out = tmp_path / "out" / "exp"
    assert (out / "config.yaml").exists()
    # two seed dirs + aggregation
    assert (out / "0" / "val" / "stats.json").exists()
    assert (out / "1" / "val" / "stats.json").exists()
    best = json.loads((out / "agg" / "val" / "best.json").read_text())
    assert "mae" in best and "mae_std" in best
