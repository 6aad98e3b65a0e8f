"""Segment ops vs numpy oracles (the torch_scatter replacement, SURVEY.md §2.9)."""
import jax.numpy as jnp
import numpy as np

from graphgps_tpu.ops.segment import (segment_count, segment_max, segment_mean,
                                      segment_min, segment_softmax, segment_sum)


def _setup(rng):
    E, N, D = 64, 10, 4
    ids = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    data = rng.normal(size=(E, D)).astype(np.float32)
    mask = rng.random(E) > 0.3
    return data, ids, mask, N


def test_segment_sum_mean_max(rng):
    data, ids, mask, N = _setup(rng)
    out = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), N, jnp.array(mask)))
    ref = np.zeros((N, data.shape[1]), np.float32)
    np.add.at(ref, ids[mask], data[mask])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    out_m = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), N, jnp.array(mask)))
    cnt = np.zeros(N)
    np.add.at(cnt, ids[mask], 1)
    ref_m = ref / np.maximum(cnt, 1e-6)[:, None]
    np.testing.assert_allclose(out_m, ref_m, rtol=1e-4, atol=1e-5)

    out_x = np.asarray(segment_max(jnp.array(data), jnp.array(ids), N, jnp.array(mask)))
    for seg in range(N):
        sel = (ids == seg) & mask
        expect = data[sel].max(axis=0) if sel.any() else np.zeros(data.shape[1])
        np.testing.assert_allclose(out_x[seg], expect, rtol=1e-5, atol=1e-5)


def test_segment_min_empty_fill(rng):
    data, ids, mask, N = _setup(rng)
    out = np.asarray(segment_min(jnp.array(data), jnp.array(ids), N, jnp.array(mask)))
    for seg in range(N):
        sel = (ids == seg) & mask
        expect = data[sel].min(axis=0) if sel.any() else np.zeros(data.shape[1])
        np.testing.assert_allclose(out[seg], expect, rtol=1e-5, atol=1e-5)


def test_segment_softmax_matches_dense(rng):
    """Scatter softmax == per-segment dense softmax (reference pyg_softmax,
    san2_layer.py:11-33)."""
    E, N = 40, 6
    ids = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    scores = rng.normal(size=(E, 2)).astype(np.float32) * 10
    mask = rng.random(E) > 0.2
    out = np.asarray(segment_softmax(jnp.array(scores), jnp.array(ids), N,
                                     jnp.array(mask)))
    for seg in range(N):
        sel = (ids == seg) & mask
        if not sel.any():
            continue
        ex = np.exp(scores[sel] - scores[sel].max(axis=0))
        np.testing.assert_allclose(out[sel], ex / ex.sum(axis=0), rtol=1e-4,
                                   atol=1e-6)
    assert np.abs(out[~mask]).max() == 0.0


def test_segment_count(rng):
    _, ids, mask, N = _setup(rng)
    out = np.asarray(segment_count(jnp.array(ids), N, jnp.array(mask)))
    ref = np.zeros(N)
    np.add.at(ref, ids[mask], 1)
    np.testing.assert_allclose(out, ref)
