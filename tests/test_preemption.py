"""Preemption-safe elastic recovery (SURVEY.md §5 failure detection — the
reference has only auto_resume; TPU pods get SIGTERM'd with a grace window).

In-process: a raised preemption flag stops custom_train at the next epoch
boundary with a committed synchronous checkpoint, and an auto_resume relaunch
finishes exactly the remaining epochs. Cross-process: a real training run
(main.py subprocess) receives SIGTERM mid-run, exits cleanly with a
checkpoint on disk, and a relaunch resumes past the saved epoch.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import run_single


@pytest.fixture(autouse=True)
def _clear_flag():
    L.clear_preemption()
    yield
    L.clear_preemption()


def _cfg(tmp_path, **over):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 40
    cfg.dataset.synth_max_nodes = 14
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.optim.max_epoch = 5
    cfg.train.enable_ckpt = True
    cfg.train.ckpt_period = 100          # periodic saves never fire
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def test_preempt_stops_and_resumes(tmp_path):
    run_dir = str(tmp_path / "run")
    cfg = _cfg(tmp_path)
    L.request_preemption()               # notice arrives before epoch 0 ends
    hist = run_single(cfg, run_dir)
    assert len(hist["train"]) == 1       # stopped at the first boundary
    eps = [x for x in os.listdir(L.ckpt_dir(run_dir)) if x.isdigit()]
    assert eps == ["0"], eps             # committed synchronous save

    L.clear_preemption()
    cfg2 = _cfg(tmp_path, **{"train.auto_resume": True})
    hist2 = run_single(cfg2, run_dir)
    assert len(hist2["train"]) == 4      # exactly the remaining epochs
    # stats.json carries the full 0..4 trajectory with no repeats
    with open(os.path.join(run_dir, "train", "stats.json")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert [r["epoch"] for r in rows] == list(range(5))


def test_preempt_keeps_ckpt_under_best_clean(tmp_path):
    """ckpt_best + ckpt_clean must not prune the preemption save."""
    run_dir = str(tmp_path / "run")
    cfg = _cfg(tmp_path, **{"train.ckpt_best": True, "train.ckpt_clean": True})
    L.request_preemption()
    run_single(cfg, run_dir)
    eps = sorted(x for x in os.listdir(L.ckpt_dir(run_dir)) if x.isdigit())
    assert "0" in eps                    # the resume point survived cleaning


def test_preempt_save_false_disables(tmp_path):
    cfg = _cfg(tmp_path, **{"train.preempt_save": False,
                            "train.enable_ckpt": False,
                            "optim.max_epoch": 2})
    L.request_preemption()
    hist = run_single(cfg, str(tmp_path / "run"))
    assert len(hist["train"]) == 2       # flag ignored, run completes


def test_sigterm_subprocess(tmp_path):
    """Real signal path: SIGTERM a live training process, expect a clean exit
    with a checkpoint, then resume past it."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PYTEST_CURRENT_TEST", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [sys.executable, "main.py", "--cfg", "configs/debug/zinc-debug.yaml",
            "out_dir", str(tmp_path), "optim.max_epoch", "500",
            "train.eval_period", "1", "gt.layers", "1", "gt.dim_hidden", "16",
            "dataset.synth_num_graphs", "48", "train.batch_size", "16",
            "seed", "0"]
    p = subprocess.Popen(args, env=env, cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    # wait for ≥2 completed epochs (stats.json rows), then preempt
    stats = None
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            if stats is None:
                for root, _dirs, files in os.walk(str(tmp_path)):
                    if "stats.json" in files and os.sep + "train" in root:
                        stats = os.path.join(root, "stats.json")
            if stats and os.path.exists(stats):
                with open(stats) as f:
                    if sum(1 for l in f if l.strip()) >= 2:
                        break
            if p.poll() is not None:
                pytest.fail("training exited early:\n" + p.communicate()[0])
            time.sleep(1)
        else:
            pytest.fail("no training progress within deadline")
        p.send_signal(signal.SIGTERM)
        out = p.communicate(timeout=180)[0]
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, out
    assert "preemption notice received" in out, out
    run_dir = os.path.dirname(os.path.dirname(stats))
    eps = [int(x) for x in os.listdir(L.ckpt_dir(run_dir)) if x.isdigit()]
    assert eps, "no checkpoint written on preemption"
    saved = max(eps)

    # relaunch with auto_resume: trains only the remaining epochs
    args2 = args[:6] + ["optim.max_epoch", str(saved + 3),
                        "train.auto_resume", "True"] + args[8:]
    out2 = subprocess.run(args2, env=env, cwd=repo, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True,
                          timeout=240).stdout
    with open(stats) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    epochs = [r["epoch"] for r in rows]
    assert epochs[-1] == saved + 2, (epochs, out2)
    assert epochs.count(saved + 1) == 1   # resumed, not retrained
