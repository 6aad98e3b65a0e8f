"""End-to-end training: loss decreases on the synthetic ZINC-like task;
checkpoint save/resume round-trips; schedulers follow their formulas."""
import os

import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import create_loaders, infer_dims, run_single
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.optim.optimizers import (ReduceLROnPlateau, build_schedule,
                                           make_tx)


def train_cfg(tmp_path, **over):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 60
    cfg.dataset.synth_max_nodes = 16
    cfg.train.batch_size = 8
    cfg.gt.layers = 2
    cfg.gt.dim_hidden = 32
    cfg.gt.n_heads = 4
    cfg.optim.max_epoch = 6
    cfg.optim.base_lr = 3e-3
    cfg.optim.num_warmup_epochs = 1
    cfg.train.enable_ckpt = False
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    for k, v in over.items():
        node = cfg
        *parts, leaf = k.split(".")
        for p in parts:
            node = node[p]
        node[leaf] = v
    return cfg


def test_loss_decreases(tmp_path):
    cfg = train_cfg(tmp_path)
    hist = run_single(cfg, str(tmp_path / "run"))
    losses = [h["loss"] for h in hist["train"]]
    assert losses[-1] < losses[0] * 0.9, losses
    assert os.path.exists(tmp_path / "run" / "train" / "stats.json")


def test_grad_accumulation_equivalent_shapes(tmp_path):
    cfg = train_cfg(tmp_path, **{"optim.batch_accumulation": 2,
                                 "optim.max_epoch": 2})
    hist = run_single(cfg, str(tmp_path / "run"))
    assert len(hist["train"]) == 2


def test_checkpoint_roundtrip(tmp_path):
    cfg = train_cfg(tmp_path, **{"train.enable_ckpt": True,
                                 "train.ckpt_period": 1,
                                 "optim.max_epoch": 2})
    run_dir = str(tmp_path / "run")
    hist = run_single(cfg, run_dir)
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    # resume: restores from last epoch and continues without error
    cfg2 = train_cfg(tmp_path, **{"train.enable_ckpt": True,
                                  "train.auto_resume": True,
                                  "optim.max_epoch": 4})
    hist2 = run_single(cfg2, run_dir)
    # resumed run only trains the remaining epochs
    assert len(hist2["train"]) == 2


def test_inference_only(tmp_path):
    cfg = train_cfg(tmp_path, **{"train.mode": "inference-only",
                                 "optim.max_epoch": 1})
    hist = run_single(cfg, str(tmp_path / "run"))
    assert set(hist) == {"train", "val", "test"}


def test_schedulers_formulas():
    cfg = new_cfg()
    cfg.optim.base_lr = 1.0
    cfg.optim.num_warmup_epochs = 5
    cfg.optim.max_epoch = 50

    cfg.optim.scheduler = "cosine_with_warmup"
    f = build_schedule(cfg)
    assert f(0) == 0.0
    assert f(5) == pytest.approx(1.0)
    assert f(50) == pytest.approx(0.0, abs=1e-9)
    assert f(5) > f(20) > f(45)

    cfg.optim.scheduler = "linear_with_warmup"
    f = build_schedule(cfg)
    assert f(2) == pytest.approx(0.4)
    assert f(50) == pytest.approx(0.0)

    cfg.optim.scheduler = "polynomial_with_warmup"
    cfg.optim.min_lr = 0.1
    f = build_schedule(cfg)
    assert f(5) == pytest.approx(1.0)
    assert f(50) == pytest.approx(0.1)


def test_reduce_on_plateau():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=2, mode="min")
    assert s.update(1.0) == 1.0
    assert s.update(0.9) == 1.0        # improvement
    s.update(0.95); s.update(0.95)     # 2 bad epochs
    assert s.update(0.95) == 0.5       # 3rd bad → decay
    d = s.state_dict()
    s2 = ReduceLROnPlateau(base_lr=1.0)
    s2.load_state_dict(d)
    assert s2.lr == 0.5


def test_eval_metrics_written(tmp_path):
    cfg = train_cfg(tmp_path, **{"optim.max_epoch": 2})
    hist = run_single(cfg, str(tmp_path / "run"))
    assert "mae" in hist["val"][-1]
    assert "spearmanr" in hist["val"][-1]


def test_flat_ravel_tx_parity():
    """flat_ravel(clip→adamW) produces the same params trajectory as the
    per-leaf chain (float-association tolerance on the global-norm clip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    cfg.optim.optimizer = "adamW"
    cfg.optim.weight_decay = 1e-4
    cfg.optim.clip_grad_norm = True
    cfg.optim.clip_grad_norm_value = 0.5

    rng = np.random.default_rng(0)
    params = {"a": {"w": jnp.array(rng.normal(size=(4, 3)), jnp.float32),
                    "b": jnp.zeros((3,), jnp.float32)},
              "c": jnp.array(rng.normal(size=(5,)), jnp.float32)}

    cfg.optim.fused_flat = True
    tx_f = make_tx(cfg)
    cfg.optim.fused_flat = False
    tx_l = make_tx(cfg)

    sf, sl = tx_f.init(params), tx_l.init(params)
    pf = pl = params
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.array(rng.normal(size=p.shape), jnp.float32), pf)
        uf, sf = tx_f.update(grads, sf, pf)
        ul, sl = tx_l.update(grads, sl, pl)
        pf = optax.apply_updates(pf, uf)
        pl = optax.apply_updates(pl, ul)
    for f, l in zip(jax.tree_util.tree_leaves(pf),
                    jax.tree_util.tree_leaves(pl)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(l),
                                   rtol=1e-6, atol=1e-7)
    # set_lr must still find the injected hyperparam through the flat wrapper
    from graphgps_tpu.optim.optimizers import set_lr
    sf = set_lr(sf, 0.123)


def test_async_ckpt_best_clean(tmp_path):
    """Async best-epoch checkpointing: the run ends with exactly the best
    epoch's (committed) checkpoint on disk — the crash-fallback second dir
    kept while a write is in flight is pruned at the end."""
    cfg = train_cfg(tmp_path, **{"train.enable_ckpt": True,
                                 "train.ckpt_best": True,
                                 "train.ckpt_clean": True,
                                 "train.ckpt_async": True,
                                 "optim.max_epoch": 5})
    run_dir = str(tmp_path / "run")
    hist = run_single(cfg, run_dir)
    d = os.path.join(run_dir, "ckpt")
    epochs = [int(x) for x in os.listdir(d) if x.isdigit()]
    assert len(epochs) == 1
    val = hist["val"]
    best = val[int(np.argmin([r["mae"] for r in val]))]["epoch"]
    assert epochs[0] == best
    # and it restores
    st = None  # load via a fresh state
    model = build_model(cfg, 1)
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.data.device_loader import DeviceLoader
    ds = load_dataset(cfg)
    loader = DeviceLoader(ds.train, batch_size=cfg.train.batch_size)
    _, gb = next(iter(loader))
    st = L.init_state(cfg, model, gb, 0, make_tx(cfg))
    st2, nxt, _ = L.load_ckpt(run_dir, st)
    assert nxt == best + 1


def test_save_ckpt_async_matches_sync(tmp_path):
    """An async save commits the identical tree a sync save would."""
    import jax
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.data.device_loader import DeviceLoader

    cfg = train_cfg(tmp_path)
    ds = load_dataset(cfg)
    loader = DeviceLoader(ds.train, batch_size=cfg.train.batch_size)
    model = build_model(cfg, 1)
    _, gb = next(iter(loader))
    state = L.init_state(cfg, model, gb, 0, make_tx(cfg))

    da, db = str(tmp_path / "sync"), str(tmp_path / "async")
    L.save_ckpt(da, state, 3, {"lr": 0.1}, async_save=False)
    L.save_ckpt(db, state, 3, {"lr": 0.1}, async_save=True)
    L.wait_for_ckpts()
    sa, ea, scha = L.load_ckpt(da, state)
    sb, eb, schb = L.load_ckpt(db, state)
    assert ea == eb == 4 and scha == schb == {"lr": 0.1}
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(sa.opt_state),
                    jax.tree_util.tree_leaves(sb.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
