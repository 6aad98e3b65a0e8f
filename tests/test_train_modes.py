"""Analysis/inference train modes: PCQM4Mv2 submission writer, attention logging."""
import os

import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import run_single


def _cfg(tmp_path, **over):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 32
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 1
    cfg.train.enable_ckpt = False
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def test_pcqm_inference_writes_submission(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path, **{"train.mode": "PCQM4Mv2-inference"})
    # make the test split's targets all-NaN like the OGB-LSC held-out sets
    from graphgps_tpu.data.datasets.base import load_dataset as _ld

    def nan_test_load(c):
        ds = _ld(c)
        for g in ds.test:
            g.y = np.full_like(np.atleast_1d(g.y), np.nan, dtype=np.float32)
        return ds

    monkeypatch.setattr("graphgps_tpu.driver.load_dataset", nan_test_load)
    run_dir = str(tmp_path / "run")
    hist = run_single(cfg, run_dir)
    assert "submission" in hist["test"][0]
    sub = np.load(hist["test"][0]["submission"])
    assert sub["y_pred"].ndim == 1 and len(sub["y_pred"]) > 0
    assert "mae" in hist["val"][0]


def test_log_attn_weights(tmp_path):
    cfg = _cfg(tmp_path, **{"train.mode": "log-attn-weights",
                            "train.log_attn_weights": True})
    run_dir = str(tmp_path / "run")
    hist = run_single(cfg, run_dir)
    path = hist["test"][0]["path"]
    assert os.path.exists(path)
    z = np.load(path)
    attn_keys = [k for k in z.files if k.endswith("_attn")]
    assert attn_keys
    a = z[attn_keys[0]]
    # (L, B, H, N, N), rows over real keys sum to 1
    assert a.ndim == 5 and a.shape[0] == cfg.gt.layers
    assert np.isfinite(a).all()
