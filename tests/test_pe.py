"""PE/SE precompute parity vs closed-form oracles (reference unittests/test_eigvecs.py
style: path graphs with known spectra)."""
import numpy as np
import pytest

from graphgps_tpu.data.graph import Graph
from graphgps_tpu.pe import host as pe

from conftest import make_chain_graph


def path_graph(n):
    return make_chain_graph(n)


def test_laplacian_unnormalized():
    g = path_graph(3)
    L = pe.laplacian(pe.adjacency(g), None)
    expect = np.array([[1, -1, 0], [-1, 2, -1], [0, -1, 1]], dtype=float)
    np.testing.assert_allclose(L, expect)


def test_lap_eig_known_spectrum():
    """P3 unnormalized Laplacian eigenvalues are 0, 1, 3."""
    g = path_graph(3)
    evals, evects = pe.lap_eig(g, max_freqs=3, laplacian_norm="none")
    np.testing.assert_allclose(np.sort(evals), [0.0, 1.0, 3.0], atol=1e-5)
    # L2-normalized columns
    np.testing.assert_allclose(np.linalg.norm(evects, axis=0), np.ones(3),
                               atol=1e-5)


def test_lap_eig_nan_padding():
    g = path_graph(3)
    evals, evects = pe.lap_eig(g, max_freqs=6)
    assert np.isnan(evals[3:]).all()
    assert np.isnan(evects[:, 3:]).all()
    assert not np.isnan(evects[:, :3]).any()


def test_eigvec_normalizer_variants():
    v = np.array([[3.0, 0.0], [4.0, 2.0]])
    ev = np.array([1.0, 4.0])
    np.testing.assert_allclose(pe.eigvec_normalizer(v, ev, "L1"),
                               v / np.array([[7.0, 2.0]]))
    np.testing.assert_allclose(pe.eigvec_normalizer(v, ev, "L2"),
                               v / np.array([[5.0, 2.0]]))
    np.testing.assert_allclose(pe.eigvec_normalizer(v, ev, "abs-max"),
                               v / np.array([[4.0, 2.0]]))
    # wavelength: abs-max then × (2π/√λ)/2π = 1/√λ
    wl = pe.eigvec_normalizer(v, ev, "wavelength")
    np.testing.assert_allclose(wl, v / np.array([[4.0, 2.0]]) /
                               np.sqrt(ev)[None, :], atol=1e-5)


def test_rwse_path3():
    """Hand-computed random-walk landing probabilities on P3.

    P = D^-1 A:  node0→node1 w.p. 1; node1→{0,2} w.p. ½; node2→node1 w.p. 1.
    diag(P^2) = [1/2, 1, 1/2]; diag(P^1) = 0; diag(P^3) = 0 (bipartite).
    """
    g = path_graph(3)
    out = pe.rwse(g, [1, 2, 3, 4])
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[:, 1], [0.5, 1.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[:, 2], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[:, 3], [0.5, 1.0, 0.5], atol=1e-6)


def test_rwse_nonconsecutive_times_match_power():
    g = make_chain_graph(7)
    a = pe.rwse(g, [2, 4, 6])
    b = pe.rwse(g, [2, 3, 4, 5, 6])
    np.testing.assert_allclose(a[:, 0], b[:, 0], atol=1e-7)
    np.testing.assert_allclose(a[:, 1], b[:, 2], atol=1e-7)
    np.testing.assert_allclose(a[:, 2], b[:, 4], atol=1e-7)


def test_heat_kernel_diag_sums_to_trace():
    """Σ_j hk_diag[j](t) == Σ_i exp(-t λ_i) (trace identity)."""
    g = make_chain_graph(6)
    L = pe.laplacian(pe.adjacency(g), "sym")
    evals = np.linalg.eigvalsh(L)
    out = pe.heat_kernel_diag(g, [1, 2])
    for j, t in enumerate([1, 2]):
        np.testing.assert_allclose(out[:, j].sum(), np.exp(-t * evals).sum(),
                                   rtol=1e-5)


def test_electrostatic_shape_and_finite():
    g = make_chain_graph(6)
    out = pe.electrostatic(g)
    assert out.shape == (6, 10)
    assert np.isfinite(out).all()


def test_graphormer_bias_bfs():
    g = path_graph(4)
    stats = pe.graphormer_bias(g, num_spatial_types=10)
    d = stats["spatial_types"]
    expect = np.array([[0, 1, 2, 3], [1, 0, 1, 2], [2, 1, 0, 1], [3, 2, 1, 0]])
    np.testing.assert_array_equal(d, expect)
    # undirected: degree = in+out; ends have 2 (1 in + 1 out), middles 4
    np.testing.assert_array_equal(stats["in_degrees"], [2, 4, 4, 2])


def test_graphormer_bias_disconnected_clamp():
    g = Graph(node_feat=np.zeros((3, 1), np.int64),
              edge_index=np.array([[0], [1]]))
    stats = pe.graphormer_bias(g, num_spatial_types=5)
    assert stats["spatial_types"][0, 2] == 5  # unreachable → clamp
