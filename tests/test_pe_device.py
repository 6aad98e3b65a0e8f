"""On-device batched PE vs the host (numpy) reference engine."""
import numpy as np
import pytest

from graphgps_tpu.data.batching import collate
from graphgps_tpu.pe import device as dev, host as hostpe

from conftest import make_chain_graph


def _batch(graphs, B=None, N=12, E=128):
    B = B or len(graphs)
    return collate(graphs, B, N, E)


def test_batched_adjacency_matches_host(rng):
    gs = [make_chain_graph(5), make_chain_graph(8)]
    gb = _batch(gs).to_graph_batch()
    A = np.asarray(dev.batched_adjacency(gb))
    for i, g in enumerate(gs):
        n = g.num_nodes
        np.testing.assert_allclose(A[i, :n, :n], hostpe.adjacency(g))
        assert A[i, n:, :].sum() == 0 and A[i, :, n:].sum() == 0


def test_batched_rwse_matches_host():
    gs = [make_chain_graph(5), make_chain_graph(9)]
    gb = _batch(gs).to_graph_batch()
    times = [1, 2, 3, 4, 6]
    out = np.asarray(dev.batched_rwse(gb, times)).reshape(2, 12, len(times))
    for i, g in enumerate(gs):
        ref = hostpe.rwse(g, times)
        np.testing.assert_allclose(out[i, :g.num_nodes], ref, atol=1e-5)


def test_batched_lap_eig_matches_host():
    gs = [make_chain_graph(5), make_chain_graph(9)]
    gb = _batch(gs).to_graph_batch()
    k = 6
    vals, vecs = dev.batched_lap_eig(gb, k)
    vals, vecs = np.asarray(vals), np.asarray(vecs).reshape(2, 12, k)
    for i, g in enumerate(gs):
        n = g.num_nodes
        ref_vals, ref_vecs = hostpe.lap_eig(g, k)
        kk = min(n, k)
        np.testing.assert_allclose(vals[i, :kk], ref_vals[:kk], atol=1e-4)
        # NaN padding semantics
        if n < k:
            assert np.isnan(vals[i, n:]).all()
        # eigvecs match up to column sign
        for c in range(kk):
            a, b = vecs[i, :n, c], ref_vecs[:n, c]
            err = min(np.abs(a - b).max(), np.abs(a + b).max())
            assert err < 1e-3, (i, c, err)


def test_batched_heat_kernel_matches_host():
    gs = [make_chain_graph(6), make_chain_graph(10)]
    gb = _batch(gs).to_graph_batch()
    times = [1, 2]
    out = np.asarray(dev.batched_heat_kernel_diag(gb, times)).reshape(2, 12, 2)
    for i, g in enumerate(gs):
        ref = hostpe.heat_kernel_diag(g, times)
        np.testing.assert_allclose(out[i, :g.num_nodes], ref, atol=1e-4)
