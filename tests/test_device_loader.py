"""Device-side batch assembly vs host collation parity."""
import jax
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.datasets.base import load_dataset
from graphgps_tpu.data.device_loader import DeviceLoader
from graphgps_tpu.data.graph import Graph

from conftest import make_chain_graph


def _graphs(rng, n=10):
    out = []
    for i in range(n):
        g = make_chain_graph(int(rng.integers(3, 9)))
        g.pe["pestat_RWSE"] = rng.normal(size=(g.num_nodes, 4)).astype(np.float32)
        out.append(g)
    return out


def test_device_matches_host_collate(rng):
    gs = _graphs(rng)
    dl = DeviceLoader(gs, batch_size=4, max_nodes=16, shuffle=False)
    real, gb = next(iter(dl))
    hb = collate(gs[:4], 4, 16, dl.max_edges).to_graph_batch()
    assert real == 4
    np.testing.assert_array_equal(np.asarray(gb.node_feat),
                                  np.asarray(hb.node_feat))
    np.testing.assert_array_equal(np.asarray(gb.node_mask),
                                  np.asarray(hb.node_mask))
    np.testing.assert_array_equal(np.asarray(gb.graph_mask),
                                  np.asarray(hb.graph_mask))
    # same real-edge multiset; both receiver-sorted overall
    em_d, em_h = np.asarray(gb.edge_mask), np.asarray(hb.edge_mask)
    set_d = set(zip(np.asarray(gb.senders)[em_d].tolist(),
                    np.asarray(gb.receivers)[em_d].tolist()))
    set_h = set(zip(np.asarray(hb.senders)[em_h].tolist(),
                    np.asarray(hb.receivers)[em_h].tolist()))
    assert set_d == set_h
    r = np.asarray(gb.receivers)
    assert (np.diff(r) >= 0).all()
    # PE parity on real nodes
    nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(gb.pe["pestat_RWSE"])[nm],
                               np.asarray(hb.pe["pestat_RWSE"])[nm])
    np.testing.assert_allclose(np.nan_to_num(np.asarray(gb.y)),
                               np.nan_to_num(np.asarray(hb.y)))


def test_device_partial_batch(rng):
    gs = _graphs(rng, 6)
    dl = DeviceLoader(gs, batch_size=4, shuffle=False)
    batches = list(dl)
    assert len(batches) == 2
    real2, gb2 = batches[1]
    assert real2 == 2
    gm = np.asarray(gb2.graph_mask)
    assert gm.tolist() == [True, True, False, False]
    assert not np.asarray(gb2.node_mask).reshape(4, -1)[2:].any()
    assert np.isnan(np.asarray(gb2.y)[2:]).all()


def test_device_loader_trains(tmp_path):
    import graphgps_tpu.train.loop  # noqa: F401
    from graphgps_tpu.driver import run_single

    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 40
    cfg.dataset.synth_max_nodes = 12
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 3
    cfg.optim.base_lr = 3e-3
    cfg.train.enable_ckpt = False
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    hist = run_single(cfg, str(tmp_path / "run"))
    losses = [h["loss"] for h in hist["train"]]
    assert losses[-1] < losses[0]


def test_fused_steps_match_two_dispatch(tmp_path):
    """make_fused_steps (assembly fused into the jitted step) matches the
    assemble-then-step path exactly."""
    import jax
    import jax.numpy as jnp
    import graphgps_tpu.train.loop as L
    from graphgps_tpu.data.device_loader import assemble
    from graphgps_tpu.models.networks import build_model
    from graphgps_tpu.optim.optimizers import make_tx
    from graphgps_tpu.data.datasets.base import load_dataset

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 16
    cfg.dataset.synth_max_nodes = 12
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    ds = load_dataset(cfg)
    dl = DeviceLoader(ds.train, batch_size=4, shuffle=False)
    _, gb = next(iter(dl))
    model = build_model(cfg, 1)
    tx = make_tx(cfg)
    state = L.init_state(cfg, model, gb, 0, tx)
    sel = jnp.arange(4, dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)

    cfg.parallel.donate = False
    step2, _, _, eval2 = L.make_steps(cfg, model, tx)
    fused_train, fused_eval = L.make_fused_steps(cfg, model, tx, dl)
    b = assemble(dl._tree, sel, dl.max_nodes, 4)
    _, loss_a, *_ = step2(state, b, rng)
    _, loss_b, *_ = fused_train(state, sel, rng)
    np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                               rtol=1e-6)
    la, *_ = eval2(state, b)
    lb, *_ = fused_eval(state, sel)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_compact_arena_narrowing_bit_parity(rng):
    """narrow_int compaction (int8/16 arenas) must be invisible downstream:
    assembled batches are bit-identical to the uncompacted path and integer
    outputs come back as int32 (PCQM4Mv2-full HBM-fit path, docs/ROADMAP.md)."""
    from graphgps_tpu.data.device_loader import assemble, narrow_int

    gs = _graphs(rng)
    # int labels + an integer extra (spatial-type-like, small cardinality)
    for i, g in enumerate(gs):
        g.y = np.array([i % 3], dtype=np.int64)
        g.extras["edge_label"] = np.full((3, 2), i % 5, dtype=np.int64)
    dc = DeviceLoader(gs, batch_size=4, max_nodes=16, shuffle=False,
                      compact=True)
    df = DeviceLoader(gs, batch_size=4, max_nodes=16, shuffle=False,
                      compact=False)
    # arenas actually narrowed (features are tiny categoricals)
    assert dc._tree["node_feat"].dtype == np.int8
    assert dc._tree["senders"].dtype == np.int8
    assert dc._tree["y"].dtype == np.int8
    # uncompacted path: jnp.asarray clamps int64 -> int32 (x64 disabled)
    assert df._tree["node_feat"].dtype == np.int32
    assert dc.hbm_bytes() < df.hbm_bytes()
    sel = np.arange(4, dtype=np.int32)
    bc = assemble(dc._tree, sel, 16, 4)
    bf = assemble(df._tree, sel, 16, 4)
    assert bc.node_feat.dtype == np.int32
    assert bc.y.dtype == np.int32
    assert bc.extras["edge_label"].dtype == np.int32
    for name in ("node_feat", "edge_feat", "senders", "receivers", "y"):
        np.testing.assert_array_equal(np.asarray(getattr(bc, name)),
                                      np.asarray(getattr(bf, name)))
    np.testing.assert_array_equal(np.asarray(bc.extras["edge_label"]),
                                  np.asarray(bf.extras["edge_label"]))


def test_narrow_int_ranges():
    from graphgps_tpu.data.device_loader import narrow_int

    assert narrow_int(np.array([0, 119], np.int64)).dtype == np.int8
    assert narrow_int(np.array([-5, 200], np.int64)).dtype == np.int16
    assert narrow_int(np.array([0, 70000], np.int64)).dtype == np.int32
    big = np.array([2 ** 40], np.int64)
    assert narrow_int(big).dtype == np.int64  # out of int32 range: untouched
    f = np.array([0.5], np.float32)
    assert narrow_int(f) is f  # floats pass through


def test_bf16_pe_arena_opt_in(rng):
    import jax.numpy as jnp
    from graphgps_tpu.data.device_loader import assemble

    gs = _graphs(rng)
    dl = DeviceLoader(gs, batch_size=4, max_nodes=16, shuffle=False,
                      pe_dtype="bfloat16")
    assert dl._tree["pe"]["pestat_RWSE"].dtype == jnp.bfloat16
    _, gb = next(iter(dl))
    # gathered rows come back f32, values within bf16 rounding of the source
    assert gb.pe["pestat_RWSE"].dtype == jnp.float32
    ref = np.concatenate([g.pe["pestat_RWSE"] for g in gs[:4]])
    got = np.asarray(gb.pe["pestat_RWSE"])[np.asarray(gb.node_mask)]
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)
