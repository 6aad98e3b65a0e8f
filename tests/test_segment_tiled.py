"""tiled_segment_sum (ops/pallas/segment_tiled.py): the long-graph
scatter replacement must equal jax.ops.segment_sum exactly — unsorted ids,
empty segments, skewed (power-law-ish) degree distributions, masked rows —
and its VJP must be the plain row gather. Interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphgps_tpu.ops.pallas.segment_tiled import (_pick_nb, _prep,
                                                   tiled_segment_sum)


def _case(E, S, d, seed, skew=False, empty_frac=0.0):
    rng = np.random.default_rng(seed)
    if skew:
        # power-law-ish: a few hub segments soak up most edges
        p = 1.0 / np.arange(1, S + 1)
        p /= p.sum()
        ids = rng.choice(S, size=E, p=p)
    else:
        hi = max(int(S * (1.0 - empty_frac)), 1)
        ids = rng.integers(0, hi, size=E)
    data = rng.standard_normal((E, d)).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(ids, jnp.int32)


@pytest.mark.parametrize("E,S,d,skew,empty", [
    (2048, 1024, 64, False, 0.0),
    (2048, 1024, 64, False, 0.5),      # half the segments empty
    (4096, 512, 128, True, 0.0),       # hubs: one segment ≫ W edges
    (1000, 248, 32, False, 0.0),       # E not a multiple of W, odd S
])
def test_matches_segment_sum(E, S, d, skew, empty):
    data, ids = _case(E, S, d, seed=E + S, skew=skew, empty_frac=empty)
    out = tiled_segment_sum(data, ids, S)
    ref = jax.ops.segment_sum(data, ids, num_segments=S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_grad_is_gather():
    E, S, d = 2048, 512, 64
    data, ids = _case(E, S, d, seed=1)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((S, d)),
                    jnp.float32)

    def loss(data):
        return jnp.sum(tiled_segment_sum(data, ids, S) * w)

    g = jax.grad(loss)(data)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w)[np.asarray(ids)],
                               rtol=1e-6, atol=1e-6)


def test_prep_invariants():
    """Tile table invariants: t2b monotone, every block initialized exactly
    once, every real edge appears in exactly one slot."""
    E, S = 3000, 1024
    _, ids = _case(E, S, 8, seed=9, skew=True)
    NB = _pick_nb(S)
    perm, src, loc, t2b, first, T, nblocks = _prep(ids, S, NB)
    t2b = np.asarray(t2b)
    first = np.asarray(first)
    src = np.asarray(src)
    assert (np.diff(t2b) >= 0).all()
    # exactly one first-tile per block
    assert first.sum() == nblocks
    assert len(np.unique(t2b[first == 1])) == nblocks
    # each real sorted-edge index appears exactly once
    real = src[src < E]
    assert len(real) == E and len(np.unique(real)) == E


def test_segment_sum_dispatch_gate(monkeypatch):
    """segment_sum routes through the tiled kernel at long-graph shapes when
    forced (CPU), and the result still matches the XLA reduction."""
    from graphgps_tpu.ops import segment as seg

    monkeypatch.setenv("GGPS_TILED_SEGMENT", "1")
    monkeypatch.setenv("GGPS_TILED_FORCE", "1")
    E, S, d = 20000, 2048, 32
    data, ids = _case(E, S, d, seed=4)
    mask = jnp.asarray(np.random.default_rng(5).random(E) > 0.2)
    out = seg.segment_sum(data, ids, S, mask=mask)
    ref = jax.ops.segment_sum(jnp.where(mask[:, None], data, 0), ids,
                              num_segments=S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
