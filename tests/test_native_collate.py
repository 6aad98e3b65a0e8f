"""Native C++ collater vs the numpy reference implementation."""
import numpy as np
import pytest

from graphgps_tpu import native
from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.packed import PackedGraphs, PackedLoader, collate_packed
from graphgps_tpu.data.graph import Graph

from conftest import make_chain_graph


def _graphs(rng, n=12):
    out = []
    for i in range(n):
        nn = int(rng.integers(3, 11))
        g = make_chain_graph(nn)
        g.pe["pestat_RWSE"] = rng.normal(size=(nn, 4)).astype(np.float32)
        out.append(g)
    return out


def test_native_lib_builds():
    assert native.available(), "g++ build of the native collater failed"


def test_native_matches_numpy(rng):
    gs = _graphs(rng)
    p = PackedGraphs(gs)
    sel = np.array([3, 0, 7, 5])
    nb = collate_packed(p, sel, 4, 16, 128)
    pb = collate([gs[i] for i in sel], 4, 16, 128)
    np.testing.assert_array_equal(nb.arrays["node_feat"], pb.arrays["node_feat"])
    np.testing.assert_array_equal(nb.arrays["node_mask"], pb.arrays["node_mask"])
    np.testing.assert_array_equal(nb.arrays["graph_mask"], pb.arrays["graph_mask"])
    np.testing.assert_array_equal(nb.pe["pestat_RWSE"], pb.pe["pestat_RWSE"])
    # same multiset of (sender, receiver, feat) on real lanes; CSR-sorted
    for b in (nb, pb):
        em = b.arrays["edge_mask"]
        r = b.arrays["receivers"]
        assert (np.diff(r) >= 0).all()  # sorted incl. padding
    em_n, em_p = nb.arrays["edge_mask"], pb.arrays["edge_mask"]
    real_n = set(zip(nb.arrays["senders"][em_n].tolist(),
                     nb.arrays["receivers"][em_n].tolist()))
    real_p = set(zip(pb.arrays["senders"][em_p].tolist(),
                     pb.arrays["receivers"][em_p].tolist()))
    assert real_n == real_p
    np.testing.assert_allclose(np.nan_to_num(nb.arrays["y"]),
                               np.nan_to_num(pb.arrays["y"]))


def test_native_edge_feat_follows_sort(rng):
    """Edge features must stay aligned with their (sender, receiver) pair."""
    gs = _graphs(rng)
    # give each edge a unique feature = sender*1000 + receiver
    for g in gs:
        s, r = g.edge_index
        g.edge_feat = (s * 1000 + r).astype(np.int64)[:, None]
    p = PackedGraphs(gs)
    sel = np.arange(len(gs))
    nb = collate_packed(p, sel, len(gs), 16, 256)
    em = nb.arrays["edge_mask"]
    s = nb.arrays["senders"][em]
    r = nb.arrays["receivers"][em]
    base = (s // 16) * 16
    expect = (s - base) * 1000 + (r - base)
    np.testing.assert_array_equal(nb.arrays["edge_feat"][em, 0], expect)


def test_packed_loader_epoch(rng):
    gs = _graphs(rng, 20)
    loader = PackedLoader(gs, batch_size=8, shuffle=True, seed=3)
    batches = list(loader)
    assert len(batches) == 3
    total_real = sum(int(b.arrays["graph_mask"].sum()) for b in batches)
    assert total_real == 20
    gb = batches[0].to_graph_batch()
    assert gb.node_feat.shape[0] == 8 * loader.max_nodes


def test_overflow_errors(rng):
    gs = _graphs(rng)
    p = PackedGraphs(gs)
    with pytest.raises(ValueError):
        collate_packed(p, np.array([0]), 1, 2, 128)
    with pytest.raises(ValueError):
        collate_packed(p, np.arange(10), 10, 16, 4)


def test_native_speedup(rng):
    """Native collate should beat the numpy path (sanity perf check)."""
    import time
    gs = _graphs(rng, 256)
    p = PackedGraphs(gs)
    sel = np.arange(256)
    t0 = time.perf_counter()
    for _ in range(20):
        collate_packed(p, sel, 256, 16, 4096)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        collate([gs[i] for i in sel], 256, 16, 4096)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
