"""nn.scan layer stacking: stacked params, training parity of the architecture
class, Performer per-layer key distinctness."""
import jax
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop as L
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.models.networks import build_model
from graphgps_tpu.optim.optimizers import make_tx


def _setup(scan: bool, glob="Transformer"):
    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 3
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gt.layer_type = f"GINE+{glob}"
    cfg.gnn.dim_inner = 16
    cfg.parallel.scan_layers = scan
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256).to_graph_batch()
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    return cfg, model, tx, state, gb


def test_scan_param_count_matches_unrolled():
    _, _, _, s_scan, _ = _setup(True)
    _, _, _, s_unroll, _ = _setup(False)
    n_scan = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(s_scan.params))
    n_unroll = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(s_unroll.params))
    assert n_scan == n_unroll


def test_scan_trains_and_loss_decreases():
    cfg, model, tx, state, gb = _setup(True)
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, loss, *_ = train_step(state, gb, sub)
        losses.append(float(np.asarray(loss)))
    assert losses[-1] < losses[0]


def test_scan_performer_runs():
    cfg, model, tx, state, gb = _setup(True, glob="Performer")
    _, _, _, eval_step = L.make_steps(cfg, model, tx)
    loss, pred, _, _ = eval_step(state, gb)
    assert np.isfinite(float(np.asarray(loss)))


def test_scan_bigbird_falls_back_to_unrolled():
    cfg, model, tx, state, gb = _setup(True, glob="BigBird")
    # BigBird needs static per-layer plans → unrolled params (no stacked axis)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat]
    assert any("GPSLayer_1" in n for n in names)

def test_bigbird_net_trains():
    """Standalone BigBird network end-to-end training sanity."""
    cfg, model, tx, state, gb = _setup(False, glob="BigBird")
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    state2, loss, *_ = train_step(state, gb, jax.random.PRNGKey(0))
    assert np.isfinite(float(np.asarray(loss)))


def test_scan_with_remat_trains():
    """scan_layers + remat together (the deep-recipe configuration): the
    remat'd scan body must mark `train` static at the lifted-arg index."""
    import jax
    import numpy as np

    import graphgps_tpu.train.loop as L
    from graphgps_tpu.optim.optimizers import make_tx

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 24
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 3
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.parallel.scan_layers = True
    cfg.parallel.remat = True
    ds = load_dataset(cfg)
    gb = collate(ds.train[:4], 4, 16, 256, y_graph_level=True).to_graph_batch()
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    train_step, _, _, _ = L.make_steps(cfg, model, tx)
    state, loss, *_ = train_step(state, gb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
