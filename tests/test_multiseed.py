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


def test_multiseed_plateau_matches_sequential(tmp_path):
    """reduce_on_plateau no longer bails (VERDICT r3 #5): per-seed host
    scheduler state drives an (S,) LR hyperparam vector. patience=0 forces
    LR drops within the short run; per-epoch stats AND the logged LR
    trajectory must match each seed's sequential plateau run."""
    def plateau_cfg(out_dir):
        cfg = _cfg(out_dir)
        cfg.optim.scheduler = "reduce_on_plateau"
        cfg.optim.schedule_patience = 0
        cfg.optim.reduce_factor = 0.5
        cfg.optim.max_epoch = 6
        return cfg

    ms_cfg = plateau_cfg(tmp_path / "ms")
    ms_cfg.train.parallel_seeds = True
    assert run_multiseed(ms_cfg, run_ids=[0, 1], seeds=SEEDS)

    for run_id, seed in zip([0, 1], SEEDS):
        sq_cfg = plateau_cfg(tmp_path / f"seq{run_id}")
        sq_cfg.seed = seed
        run_single(sq_cfg, str(tmp_path / f"seq{run_id}" / "0"))
        for split in ("train", "val"):
            ms = _stats(str(tmp_path / "ms" / str(run_id)), split)
            sq = _stats(str(tmp_path / f"seq{run_id}" / "0"), split)
            assert len(ms) == len(sq)
            for a, b in zip(ms, sq):
                np.testing.assert_allclose(
                    a["loss"], b["loss"], rtol=2e-4, atol=1e-6,
                    err_msg=f"{split} epoch {a['epoch']} (seed {seed})")
        # the LR trajectory (including plateau drops) matches sequential
        ms_lr = [r["lr"] for r in _stats(str(tmp_path / "ms" / str(run_id)),
                                         "train")]
        sq_lr = [r["lr"] for r in _stats(str(tmp_path / f"seq{run_id}" / "0"),
                                         "train")]
        np.testing.assert_allclose(ms_lr, sq_lr, rtol=1e-6,
                                   err_msg=f"seed {seed} lr trajectory")
    # patience=0 on a noisy val metric must have dropped LR at least once
    assert any(l < ms_cfg.optim.base_lr
               for l in [r["lr"] for r in
                         _stats(str(tmp_path / "ms" / "0"), "train")])


def test_multiseed_auto_resume(tmp_path):
    """auto_resume no longer bails: every seed's checkpoint restores and
    training continues at the common epoch; the resumed run's final stats
    match an uninterrupted run's (same rng chain, same shuffles)."""
    def ck_cfg(out_dir, epochs):
        cfg = _cfg(out_dir)
        cfg.train.parallel_seeds = True
        cfg.train.enable_ckpt = True
        cfg.train.ckpt_best = False
        cfg.train.ckpt_period = 1
        cfg.train.auto_resume = True
        cfg.optim.max_epoch = epochs
        return cfg

    # uninterrupted 4-epoch reference
    full = ck_cfg(tmp_path / "full", 4)
    assert run_multiseed(full, run_ids=[0, 1], seeds=SEEDS)

    # 2 epochs, then resume to 4
    part = ck_cfg(tmp_path / "part", 2)
    assert run_multiseed(part, run_ids=[0, 1], seeds=SEEDS)
    resumed = ck_cfg(tmp_path / "part", 4)
    assert run_multiseed(resumed, run_ids=[0, 1], seeds=SEEDS)

    for run_id in (0, 1):
        fu = _stats(str(tmp_path / "full" / str(run_id)), "train")
        re = _stats(str(tmp_path / "part" / str(run_id)), "train")
        assert [r["epoch"] for r in re] == [0, 1, 2, 3]
        np.testing.assert_allclose(re[-1]["loss"], fu[-1]["loss"],
                                   rtol=2e-4, atol=1e-6)


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
