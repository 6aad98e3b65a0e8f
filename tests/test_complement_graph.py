"""SAN complement-graph ("fake edge") mask parity — the analog of the
reference's unittests/test_negate_edge_index.py, checked against a brute-force
complement on path/star/cycle/random graphs."""
import jax.numpy as jnp
import numpy as np
import pytest

from graphgps_tpu.data.batching import collate
from graphgps_tpu.data.graph import Graph
from graphgps_tpu.models.san import dense_adjacency

from conftest import make_chain_graph


def _star(n):
    s = np.zeros(n - 1, dtype=np.int64)
    r = np.arange(1, n)
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    return Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei)


def _cycle(n):
    s = np.arange(n)
    r = (s + 1) % n
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    return Graph(node_feat=np.zeros((n, 1), np.int64), edge_index=ei)


def _random(rng, n, p=0.3):
    a = rng.random((n, n)) < p
    a = np.triu(a, 1)
    a = a | a.T
    s, r = np.nonzero(a)
    return Graph(node_feat=np.zeros((n, 1), np.int64),
                 edge_index=np.stack([s, r]))


@pytest.mark.parametrize("maker", ["chain", "star", "cycle", "random"])
def test_complement_mask_matches_bruteforce(maker, rng):
    graphs = {
        "chain": [make_chain_graph(5), make_chain_graph(7)],
        "star": [_star(6), _star(4)],
        "cycle": [_cycle(6), _cycle(5)],
        "random": [_random(rng, 7), _random(rng, 6)],
    }[maker]
    Nmax = 8
    gb = collate(graphs, len(graphs), Nmax, 256).to_graph_batch()
    adj = np.asarray(dense_adjacency(gb))
    vmask = np.asarray(gb.node_mask).reshape(len(graphs), Nmax)
    eye = np.eye(Nmax, dtype=bool)
    fake = vmask[:, :, None] & vmask[:, None, :] & ~adj & ~eye[None]

    for i, g in enumerate(graphs):
        n = g.num_nodes
        dense = np.zeros((n, n), dtype=bool)
        dense[g.edge_index[0], g.edge_index[1]] = True
        dense |= dense.T
        expect = ~dense & ~np.eye(n, dtype=bool)   # brute-force complement
        np.testing.assert_array_equal(fake[i, :n, :n], expect)
        # no fake edge may touch padding
        assert not fake[i, n:, :].any() and not fake[i, :, n:].any()
        # real + fake + diagonal partitions the pair grid exactly
        total = adj[i, :n, :n] | fake[i, :n, :n] | np.eye(n, dtype=bool)
        assert total.all()
