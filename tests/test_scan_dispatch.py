"""K-steps-per-dispatch training (train.steps_per_dispatch + make_scan_steps):
lax.scan over device-assembled batches inside one jitted call."""
import json

import numpy as np

from graphgps_tpu.driver import main


def _run(tmp_path, k, tag):
    out = tmp_path / tag
    main(["--cfg", "configs/debug/zinc-debug.yaml",
          "out_dir", str(out),
          "dataset.synth_num_graphs", "50",   # 50/8 → 7 batches, partial tail
          "dataset.synth_max_nodes", "12",
          "train.batch_size", "8",
          "train.enable_ckpt", "False",
          "train.steps_per_dispatch", str(k),
          "gt.layers", "1", "gt.dim_hidden", "16", "gt.n_heads", "2",
          "gnn.dim_inner", "16",
          "optim.max_epoch", "4", "optim.num_warmup_epochs", "1"])
    rows = [json.loads(l) for l in
            (out / "zinc-debug" / "0" / "train" / "stats.json")
            .read_text().splitlines()]
    return rows


def test_scan_dispatch_trains_and_matches_row_counts(tmp_path):
    rows = _run(tmp_path, 4, "k4")
    assert len(rows) == 4                      # one row per epoch
    assert np.isfinite(rows[-1]["mae"])
    # descent happens
    assert rows[-1]["loss"] < rows[0]["loss"]


def test_scan_dispatch_comparable_to_single_step(tmp_path):
    k1 = _run(tmp_path, 1, "k1")
    k4 = _run(tmp_path, 4, "k4b")
    # different rng derivations → not bitwise equal, but the same recipe must
    # land in the same loss regime
    assert abs(k1[-1]["loss"] - k4[-1]["loss"]) < 0.4
    # every real graph is seen each epoch: epoch MAE computed over all 40
    # train targets (sanity via loss being a weighted mean, not NaN)
    assert np.isfinite(k4[0]["loss"])
