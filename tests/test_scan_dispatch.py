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


def test_phantom_batches_do_not_touch_state():
    """The trailing all-padding filler batches of a scan group must not move
    params, advance the step, or update BatchNorm running stats (they did —
    adamW decay + empty-mask BN EMA corrupted eval after a few hundred epochs)."""
    import jax
    import jax.numpy as jnp

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.train.batch_size = 4
    cfg.train.steps_per_dispatch = 4
    ds = load_dataset(cfg)
    loader = DeviceLoader(ds.train, batch_size=4)
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    _, gb0 = next(iter(loader))
    state = L.init_state(cfg, model, gb0, 0, tx)
    multi = L.make_scan_steps(cfg, model, tx, loader)

    key = jax.random.PRNGKey(0)
    sel_real = jnp.asarray(np.arange(16).reshape(4, 4).astype(np.int32))
    sel_phantom = jnp.asarray(np.concatenate(
        [np.arange(12).reshape(3, 4), -np.ones((1, 4))]).astype(np.int32))

    s_a, *_ = multi(state, sel_phantom, key)
    # 3 real steps + 1 phantom → step counter must be exactly 3
    assert int(np.asarray(s_a.step)) == 3
    # host snapshot BEFORE the next call (the jit donates its state arg)
    params_a = jax.device_get(s_a.params)
    stats_a = jax.device_get(s_a.batch_stats)

    # phantom group (all -1) leaves EVERYTHING bitwise unchanged
    s_b, *_ = multi(s_a, jnp.asarray(-np.ones((4, 4), np.int32)), key)
    assert int(np.asarray(s_b.step)) == 3
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats_a),
                    jax.tree_util.tree_leaves(s_b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unguarded_scan_matches_guarded_on_real_groups():
    """make_scan_steps dispatches a guard-free executable when the host sees
    no all-padding batch in the group; it must be bitwise-identical to the
    guarded executable on such groups (the guard's jnp.where is a no-op
    there)."""
    import jax
    import jax.numpy as jnp

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.train.batch_size = 4
    cfg.train.steps_per_dispatch = 4
    cfg.parallel.donate = False
    ds = load_dataset(cfg)
    loader = DeviceLoader(ds.train, batch_size=4)
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    _, gb0 = next(iter(loader))
    state = L.init_state(cfg, model, gb0, 0, tx)
    tree = loader.arenas_tree
    key = jax.random.PRNGKey(3)
    sel = jnp.asarray(np.arange(16).reshape(4, 4).astype(np.int32))

    g_on = jax.jit(L.scan_steps_core(cfg, model, tx, loader, guard=True))
    g_off = jax.jit(L.scan_steps_core(cfg, model, tx, loader, guard=False))
    s_g, *_ = g_on(tree, state, sel, key)
    s_u, *_ = g_off(tree, state, sel, key)
    assert int(np.asarray(s_g.step)) == int(np.asarray(s_u.step)) == 4
    for a, b in zip(jax.tree_util.tree_leaves(s_g.params),
                    jax.tree_util.tree_leaves(s_u.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_g.opt_state),
                    jax.tree_util.tree_leaves(s_u.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_carry_matches_tree_carry():
    """The raveled-carry scan (default with the fused flat optimizer) must be
    numerically identical to the per-leaf-carry scan: same leaf order, same
    flat update adds, same BN stat math. Different carry layouts are
    different XLA programs, so fusion (e.g. fma contraction in the BN EMA)
    may differ by an ulp — assert tight allclose, not bitwise."""
    import jax
    import jax.numpy as jnp

    import graphgps_tpu.data.datasets  # noqa: F401
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.config.config import new_cfg
    from graphgps_tpu.data.datasets.base import load_dataset
    from graphgps_tpu.data.device_loader import DeviceLoader
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 2
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.train.batch_size = 4
    cfg.train.steps_per_dispatch = 4
    cfg.optim.clip_grad_norm = True
    cfg.parallel.donate = False          # reuse `state` across both calls
    ds = load_dataset(cfg)
    loader = DeviceLoader(ds.train, batch_size=4)
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    _, gb0 = next(iter(loader))
    state = L.init_state(cfg, model, gb0, 0, tx)

    multi_flat = L.make_scan_steps(cfg, model, tx, loader, flat_carry=True)
    multi_tree = L.make_scan_steps(cfg, model, tx, loader, flat_carry=False)

    key = jax.random.PRNGKey(3)
    sels = jnp.asarray(np.arange(16).reshape(4, 4).astype(np.int32))
    s_f, loss_f, *_ = multi_flat(state, sels, key)
    s_t, loss_t, *_ = multi_tree(state, sels, key)

    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_t),
                               rtol=2e-6, atol=1e-8)
    assert int(np.asarray(s_f.step)) == int(np.asarray(s_t.step)) == 4
    for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                    jax.tree_util.tree_leaves(s_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.batch_stats),
                    jax.tree_util.tree_leaves(s_t.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-8)
