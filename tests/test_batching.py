"""Collation correctness: masks, slot layout, edge sorting, y padding."""
import numpy as np
import pytest

from graphgps_tpu.data.batching import BatchLoader, collate
from graphgps_tpu.data.graph import Graph

from conftest import make_chain_graph


def test_collate_layout():
    gs = [make_chain_graph(3), make_chain_graph(5)]
    hb = collate(gs, batch_size=2, max_nodes=8, max_edges=32)
    assert hb.arrays["node_feat"].shape == (16, 1)
    nm = hb.arrays["node_mask"]
    assert nm[:3].all() and not nm[3:8].any()
    assert nm[8:13].all() and not nm[13:].any()
    assert hb.arrays["graph_mask"].all()
    # graph 1's nodes occupy slots [8, 13): all its edges offset by 8
    em = hb.arrays["edge_mask"]
    s, r = hb.arrays["senders"], hb.arrays["receivers"]
    assert em.sum() == 4 + 8
    real_r = r[em]
    assert ((real_r < 3) | ((real_r >= 8) & (real_r < 13))).all()
    # receivers sorted
    assert (np.diff(r) >= 0).all()


def test_collate_partial_batch_padding():
    gs = [make_chain_graph(4)]
    hb = collate(gs, batch_size=3, max_nodes=8, max_edges=32)
    assert hb.arrays["graph_mask"].tolist() == [True, False, False]
    y = hb.arrays["y"]
    assert y.shape[0] == 3
    assert np.isnan(y[1]).all() and np.isnan(y[2]).all()


def test_collate_rejects_oversize():
    with pytest.raises(ValueError):
        collate([make_chain_graph(10)], batch_size=1, max_nodes=8, max_edges=64)
    with pytest.raises(ValueError):
        collate([make_chain_graph(10)], batch_size=1, max_nodes=16, max_edges=4)


def test_loader_epoch_determinism():
    gs = [make_chain_graph(n) for n in range(3, 11)]
    l1 = BatchLoader(gs, batch_size=4, shuffle=True, seed=7)
    l2 = BatchLoader(gs, batch_size=4, shuffle=True, seed=7)
    b1 = [hb.arrays["node_mask"].sum() for hb in l1]
    b2 = [hb.arrays["node_mask"].sum() for hb in l2]
    assert b1 == b2
    assert len(l1) == 2


def test_node_level_y():
    g = make_chain_graph(4)
    g.y = np.arange(4, dtype=np.int64)
    hb = collate([g], batch_size=2, max_nodes=4, max_edges=16,
                 y_graph_level=False)
    assert hb.arrays["y"].shape[0] == 8
    assert hb.arrays["y"][:4].tolist() == [0, 1, 2, 3]


def test_dense_view_roundtrip():
    import jax.numpy as jnp

    gs = [make_chain_graph(3), make_chain_graph(5)]
    gb = collate(gs, batch_size=2, max_nodes=8, max_edges=32).to_graph_batch()
    x = jnp.arange(16.0).reshape(16, 1)
    dense = gb.dense_view(x)
    assert dense.shape == (2, 8, 1)
    assert (gb.flat_view(dense) == x).all()


def test_extras_padding_uses_explicit_axes():
    """shortest_path_types' hop axis must NOT be padded to Nmax when the first
    graph coincidentally has num_spatial_types nodes (explicit-axes fix)."""
    import numpy as np

    from graphgps_tpu.data.batching import collate
    from graphgps_tpu.data.graph import Graph

    D = 6  # num_spatial_types
    graphs = []
    for n in (D, 4):  # FIRST graph has exactly D nodes — the old misfire
        s = np.arange(n - 1)
        ei = np.stack([np.concatenate([s, s + 1]), np.concatenate([s + 1, s])])
        g = Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei,
                  y=np.array([1.0], np.float32))
        g.extras["spatial_types"] = np.zeros((n, n), np.int64)
        g.extras["shortest_path_types"] = np.zeros((n, n, D), np.int64)
        g.extras["split_mask"] = np.ones((n,), bool)
        graphs.append(g)
    hb = collate(graphs, 2, 8, 64)
    assert hb.extras["spatial_types"].shape == (2, 8, 8)
    assert hb.extras["shortest_path_types"].shape == (2, 8, 8, D)  # hops != Nmax
    assert hb.extras["split_mask"].shape == (2, 8)
