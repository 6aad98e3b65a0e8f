"""Finetuning: pretrained cfg merge, weight loading with head reset, body freeze."""
import os

import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import dump_cfg, new_cfg
from graphgps_tpu.driver import run_single
from graphgps_tpu.finetuning import (freeze_body_mask, load_pretrained_model_cfg)


def _cfg(tmp_path, **over):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 40
    cfg.dataset.synth_max_nodes = 14
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 2
    cfg.train.enable_ckpt = True
    cfg.train.ckpt_period = 1
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def _pretrain(tmp_path):
    cfg = _cfg(tmp_path)
    run_dir = str(tmp_path / "pretrain")
    run_single(cfg, run_dir)
    dump_cfg(cfg, os.path.join(run_dir, "config.yaml"))
    return run_dir


def test_pretrained_cfg_merge(tmp_path):
    pre_dir = _pretrain(tmp_path)
    cfg2 = _cfg(tmp_path, **{"gt.dim_hidden": 999, "gt.layers": 5})
    cfg2.pretrained.dir = pre_dir
    cfg2 = load_pretrained_model_cfg(cfg2)
    assert cfg2.gt.dim_hidden == 16  # strict field forced to pretrained value
    assert cfg2.gt.layers == 1


def test_finetune_run_and_freeze(tmp_path):
    pre_dir = _pretrain(tmp_path)
    cfg2 = _cfg(tmp_path)
    cfg2.pretrained.dir = pre_dir
    cfg2.pretrained.freeze_main = True
    cfg2.optim.max_epoch = 2
    hist = run_single(cfg2, str(tmp_path / "ft"))
    assert len(hist["train"]) == 2
    assert all(np.isfinite(h["loss"]) for h in hist["train"])
    # frozen body must not explode the loss (head-only training)
    assert hist["train"][-1]["loss"] < 10.0, hist["train"]


def test_frozen_body_params_unchanged(tmp_path):
    """One optimizer step must leave body params bit-identical under freeze."""
    import jax
    import jax.numpy as jnp
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.data.batching import collate
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.finetuning import freeze_body_mask

    cfg = _cfg(tmp_path)
    ds = load_dataset(cfg)
    gb = collate(ds.train[:8], 8, 16, 512).to_graph_batch()
    model = build_model(cfg, 1)
    state = L.init_state(cfg, model, gb, 0, make_tx(cfg))
    mask = freeze_body_mask(jax.device_get(state.params))
    tx = make_tx(cfg, mask)
    state = L.TrainState(params=state.params, batch_stats=state.batch_stats,
                         opt_state=tx.init(state.params), step=state.step)
    cfg.parallel.donate = False
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    before = jax.device_get(state.params)
    new_state, loss, *_ = train_step(state, gb, jax.random.PRNGKey(0))
    after = jax.device_get(new_state.params)

    def check(d_b, d_a, m, path=""):
        for k in d_b:
            p = f"{path}/{k}"
            if isinstance(d_b[k], dict):
                check(d_b[k], d_a[k], m[k], p)
            elif m[k]:  # trainable head: must move
                pass
            else:       # frozen body: bit-identical
                np.testing.assert_array_equal(np.asarray(d_b[k]),
                                              np.asarray(d_a[k]), err_msg=p)

    check(before, after, mask)
    # and at least one head param must actually change
    changed = []

    def moved(d_b, d_a, m):
        for k in d_b:
            if isinstance(d_b[k], dict):
                moved(d_b[k], d_a[k], m[k])
            elif m[k]:
                changed.append(not np.array_equal(np.asarray(d_b[k]),
                                                  np.asarray(d_a[k])))

    moved(before, after, mask)
    assert any(changed)


def test_freeze_mask_shape():
    params = {"GPSLayer_0": {"Dense_0": {"kernel": np.zeros((2, 2))}},
              "SANGraphHead_0": {"Dense_0": {"kernel": np.zeros((2, 1))}}}
    mask = freeze_body_mask(params)
    assert mask["GPSLayer_0"]["Dense_0"]["kernel"] is False
    assert mask["SANGraphHead_0"]["Dense_0"]["kernel"] is True


def test_set_lr_reaches_frozen_optimizer(tmp_path):
    """set_lr must find the injected LR inside multi_transform's state dict."""
    import jax
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.data.batching import collate
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx, set_lr
    from graphgps_tpu.finetuning import freeze_body_mask

    cfg = _cfg(tmp_path)
    cfg.optim.clip_grad_norm = True
    ds = load_dataset(cfg)
    gb = collate(ds.train[:8], 8, 16, 512).to_graph_batch()
    model = build_model(cfg, 1)
    state = L.init_state(cfg, model, gb, 0, make_tx(cfg))
    mask = freeze_body_mask(jax.device_get(state.params))
    tx = make_tx(cfg, mask)
    opt_state = tx.init(state.params)
    set_lr(opt_state, 0.123)

    found = []

    def walk(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            found.append(float(np.asarray(s.hyperparams["learning_rate"])))
        if isinstance(s, (tuple, list)):
            for x in s:
                walk(x)
        if isinstance(s, dict):
            for x in s.values():
                walk(x)

    walk(opt_state)
    assert found and abs(found[0] - 0.123) < 1e-6, found
