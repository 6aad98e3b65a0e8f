"""Seed-parallel (vmapped) training vs sequential per-seed runs.

The multiseed trainer (train/multiseed.py) must reproduce the sequential
runs' semantics: same per-seed init, batch order, dropout-rng chain, and LR
schedule — so per-epoch stats match the sequential scan-path runs up to XLA
batching numerics.
"""
import json
import os

import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import run_single
from graphgps_tpu.train.multiseed import run_multiseed

SEEDS = [3, 4]


def _cfg(out_dir):
    cfg = new_cfg()
    cfg.out_dir = str(out_dir)
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 10
    cfg.train.batch_size = 4
    cfg.train.enable_ckpt = False
    cfg.train.steps_per_dispatch = 2  # scan path on both sides
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gt.dropout = 0.1              # exercises the per-seed rng chain
    # threefry is vmap-invariant, so seed-parallel == sequential bitwise;
    # the rbg default draws hardware bits whose values legitimately differ
    # under vmap (jax PRNG semantics) — equally valid masks, not a bug
    cfg.train.rng_impl = "threefry"
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 2
    cfg.optim.base_lr = 0.005
    return cfg


def _stats(run_dir, split):
    with open(os.path.join(run_dir, split, "stats.json")) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_multiseed_matches_sequential(tmp_path):
    ms_cfg = _cfg(tmp_path / "ms")
    ms_cfg.train.parallel_seeds = True
    assert run_multiseed(ms_cfg, run_ids=[0, 1], seeds=SEEDS)

    for run_id, seed in zip([0, 1], SEEDS):
        sq_cfg = _cfg(tmp_path / f"seq{run_id}")
        sq_cfg.seed = seed
        run_single(sq_cfg, str(tmp_path / f"seq{run_id}" / "0"))
        for split in ("train", "val", "test"):
            ms = _stats(str(tmp_path / "ms" / str(run_id)), split)
            sq = _stats(str(tmp_path / f"seq{run_id}" / "0"), split)
            assert len(ms) == len(sq)
            for a, b in zip(ms, sq):
                assert a["epoch"] == b["epoch"]
                for k in ("loss", "mae"):
                    np.testing.assert_allclose(
                        a[k], b[k], rtol=2e-4, atol=1e-6,
                        err_msg=f"{split} epoch {a['epoch']} {k} "
                                f"(seed {seed})")

    # seeds genuinely independent: different init -> different losses
    l0 = _stats(str(tmp_path / "ms" / "0"), "train")[-1]["loss"]
    l1 = _stats(str(tmp_path / "ms" / "1"), "train")[-1]["loss"]
    assert l0 != l1


def test_multiseed_falls_back_on_plateau(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.optim.scheduler = "reduce_on_plateau"
    assert not run_multiseed(cfg, run_ids=[0, 1], seeds=SEEDS)


def test_multiseed_falls_back_on_accum(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.optim.batch_accumulation = 4
    assert not run_multiseed(cfg, run_ids=[0, 1], seeds=SEEDS)


def test_multiseed_wandb_replay(monkeypatch):
    """wandb.use no longer bails multiseed: per-seed histories are replayed
    into sequential named runs after training."""
    import sys
    import types

    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.train.multiseed import _replay_wandb

    calls = []

    class _Run:
        def __init__(self, name):
            self.name = name
            self.logged = []

        def log(self, metrics, step=None):
            self.logged.append((step, dict(metrics)))
            calls.append((self.name, step))

        def finish(self):
            calls.append((self.name, "finish"))

    fake = types.ModuleType("wandb")
    runs = []

    def init(**kw):
        r = _Run(kw.get("name"))
        runs.append(r)
        return r

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg = new_cfg()
    cfg.wandb.use = True
    cfg.wandb.project = "test"
    history = [
        {"train": [{"epoch": 0, "loss": 1.0}, {"epoch": 1, "loss": 0.5}],
         "val": [{"epoch": 1, "mae": 0.4}]},
        {"train": [{"epoch": 0, "loss": 2.0}]},
    ]
    _replay_wandb(cfg, [0, 1], [0, 1], history)
    assert len(runs) == 2
    assert runs[0].name.endswith(".s0") and runs[1].name.endswith(".s1")
    # steps monotonic, val merged into epoch-1 step
    assert runs[0].logged[0][0] == 0 and runs[0].logged[1][0] == 1
    assert runs[0].logged[1][1]["val/mae"] == 0.4
    assert calls[-1] == (runs[1].name, "finish")
