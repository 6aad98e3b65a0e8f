"""Segment ops vs numpy oracles (the torch_scatter replacement, SURVEY.md §2.9)."""
import jax
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


def test_blocked_segment_sum_matches_global(rng):
    """Per-graph block-diagonal MXU segment-sum (device-arena edge layout)
    must equal the global path bit-for-bit class (f32-exact both sides)."""
    from graphgps_tpu.ops.segment import blocked_segment_sum

    B, Ecap, Nmax, d = 5, 7, 6, 3
    E = B * Ecap
    # per-graph local receivers in [0, Nmax) lifted to global ids
    local = rng.integers(0, Nmax, size=(B, Ecap)).astype(np.int32)
    ids = (local + np.arange(B)[:, None] * Nmax).reshape(-1)
    data = rng.normal(size=(E, d)).astype(np.float32)
    mask = rng.random(E) > 0.3
    S = B * Nmax
    ref = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), S,
                                 jnp.array(mask)))
    out = np.asarray(blocked_segment_sum(jnp.array(data), jnp.array(ids),
                                         Ecap, Nmax, jnp.array(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    # dispatch through the public API with layout kwargs
    out2 = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), S,
                                  jnp.array(mask), edge_block=Ecap,
                                  max_nodes=Nmax))
    np.testing.assert_allclose(out2, ref, rtol=1e-6, atol=1e-6)
    # 1-D data (degree counting) and 3-D data (SAN (E, H, Dh) messages)
    ones = np.ones(E, np.float32)
    np.testing.assert_allclose(
        np.asarray(segment_sum(jnp.array(ones), jnp.array(ids), S,
                               jnp.array(mask), edge_block=Ecap,
                               max_nodes=Nmax)),
        np.asarray(segment_sum(jnp.array(ones), jnp.array(ids), S,
                               jnp.array(mask))), rtol=1e-6)
    d3 = rng.normal(size=(E, 2, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(segment_sum(jnp.array(d3), jnp.array(ids), S,
                               jnp.array(mask), edge_block=Ecap,
                               max_nodes=Nmax)),
        np.asarray(segment_sum(jnp.array(d3), jnp.array(ids), S,
                               jnp.array(mask))), rtol=1e-6, atol=1e-6)


def test_blocked_segment_sum_grad(rng):
    """VJP of the blocked path matches the global path (no scatter in bwd)."""
    from graphgps_tpu.ops.segment import blocked_segment_sum

    B, Ecap, Nmax, d = 3, 5, 4, 2
    E = B * Ecap
    local = rng.integers(0, Nmax, size=(B, Ecap)).astype(np.int32)
    ids = jnp.array((local + np.arange(B)[:, None] * Nmax).reshape(-1))
    data = jnp.array(rng.normal(size=(E, d)).astype(np.float32))
    mask = jnp.array(rng.random(E) > 0.3)
    S = B * Nmax

    g1 = jax.grad(lambda x: (blocked_segment_sum(x, ids, Ecap, Nmax,
                                                 mask) ** 2).sum())(data)
    g2 = jax.grad(lambda x: (segment_sum(x, ids, S, mask) ** 2).sum())(data)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_blocked_gather_matches_take(rng):
    """blocked_gather == x[idx] exactly (fwd), and its grad matches the
    scatter-add VJP of jnp.take — for 1-D, 2-D and 3-D features."""
    from graphgps_tpu.ops.segment import blocked_gather, gather

    B, Ecap, Nmax = 3, 7, 4
    E, S = B * Ecap, B * Nmax
    local = rng.integers(0, Nmax, size=(B, Ecap)).astype(np.int32)
    idx = jnp.array((local + np.arange(B)[:, None] * Nmax).reshape(-1))
    for shape in [(S,), (S, 5), (S, 2, 3)]:
        x = jnp.array(rng.normal(size=shape).astype(np.float32))
        out = blocked_gather(x, idx, Ecap, Nmax)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x[idx]))
        g1 = jax.grad(lambda v: (blocked_gather(v, idx, Ecap, Nmax) ** 2)
                      .sum())(x)
        g2 = jax.grad(lambda v: (v[idx] ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-6)
    # dispatcher: blocked kwargs engage the blocked path; ints fall back
    x2 = jnp.array(rng.normal(size=(S, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(gather(x2, idx, edge_block=Ecap, max_nodes=Nmax)),
        np.asarray(x2[idx]))
    xi = jnp.array(rng.integers(0, 9, size=(S, 2)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather(xi, idx, edge_block=Ecap, max_nodes=Nmax)),
        np.asarray(xi[idx]))


def test_blocked_minmax_matches_global(rng):
    """Blocked max/min (fused select-reduce, VERDICT r2 weak #3) == the
    scatter path, fwd + bwd, including empty-segment zero fill. Called
    directly — the public dispatch keeps it opt-in (GGPS_BLOCKED_MINMAX)
    after it measured slower than the scatter for PNA (docs/RESULTS.md)."""
    from graphgps_tpu.ops.segment import (_blocked_minmax, segment_max,
                                          segment_min)

    B, Ecap, Nmax, d = 4, 6, 5, 3
    E = B * Ecap
    local = rng.integers(0, Nmax, size=(B, Ecap)).astype(np.int32)
    ids = (local + np.arange(B)[:, None] * Nmax).reshape(-1)
    data = rng.normal(size=(E, d)).astype(np.float32)
    mask = rng.random(E) > 0.3
    S = B * Nmax
    for fn, op in ((segment_max, "max"), (segment_min, "min")):
        ref = np.asarray(fn(jnp.array(data), jnp.array(ids), S,
                            jnp.array(mask)))
        out = np.asarray(_blocked_minmax(jnp.array(data), jnp.array(ids),
                                         Ecap, Nmax, jnp.array(mask), op))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
        g_ref = jax.grad(lambda x: (fn(x, jnp.array(ids), S,
                                       jnp.array(mask)) ** 2).sum())(
                                           jnp.array(data))
        g_out = jax.grad(lambda x: (_blocked_minmax(
            x, jnp.array(ids), Ecap, Nmax, jnp.array(mask),
            op) ** 2).sum())(jnp.array(data))
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


def test_blocked_softmax_matches_global(rng):
    """Per-graph-constant-shift softmax (scatter-free) is the EXACT softmax:
    matches the segment-max-shift path to f32 precision, fwd + bwd."""
    from graphgps_tpu.ops.segment import segment_softmax

    B, Ecap, Nmax, H = 4, 6, 5, 2
    E = B * Ecap
    local = rng.integers(0, Nmax, size=(B, Ecap)).astype(np.int32)
    ids = (local + np.arange(B)[:, None] * Nmax).reshape(-1)
    S = B * Nmax
    mask = rng.random(E) > 0.3
    for shape in ((E,), (E, H)):
        scores = (rng.normal(size=shape) * 5).astype(np.float32)
        ref = np.asarray(segment_softmax(jnp.array(scores), jnp.array(ids),
                                         S, jnp.array(mask)))
        out = np.asarray(segment_softmax(jnp.array(scores), jnp.array(ids),
                                         S, jnp.array(mask), edge_block=Ecap,
                                         max_nodes=Nmax))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        g_ref = jax.grad(lambda x: (segment_softmax(
            x, jnp.array(ids), S, jnp.array(mask)) ** 2).sum())(
                jnp.array(scores))
        g_out = jax.grad(lambda x: (segment_softmax(
            x, jnp.array(ids), S, jnp.array(mask), edge_block=Ecap,
            max_nodes=Nmax) ** 2).sum())(jnp.array(scores))
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)


def test_blocked_softmax_no_underflow_across_segments(rng):
    """Per-graph-max shifting underflows segments sitting ≳88 below the graph
    max (round-3 review); the per-segment blocked shift must not."""
    from graphgps_tpu.ops.segment import segment_softmax

    B, Ecap, Nmax = 1, 4, 4
    # node 0 gets two edges with huge scores; node 1 two edges far below
    ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
    scores = jnp.asarray([100.0, 100.0, 0.0, 0.0], jnp.float32)
    mask = jnp.ones(4, bool)
    out = np.asarray(segment_softmax(scores, ids, B * Nmax, mask,
                                     edge_block=Ecap, max_nodes=Nmax))
    np.testing.assert_allclose(out, [0.5, 0.5, 0.5, 0.5], rtol=1e-5)
