"""Per-layer numerical oracles: reference math re-derived in numpy and checked
against the flax layers with extracted parameters (SURVEY.md §7.2.7 — the
per-layer parity harness; oracles are written from the reference equations,
not its code)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgps_tpu.data.batching import collate
from graphgps_tpu.models.local_gnn import GatedGCNLayer, GCNLayer, GINLayer
from graphgps_tpu.ops import favor
from graphgps_tpu.ops.bigbird import bigbird_block_mask
from graphgps_tpu.ops.mha import mha_core

from conftest import make_chain_graph


def _tiny_batch(n=5, d=4):
    g = make_chain_graph(n)
    gb = collate([g], 1, 8, 32).to_graph_batch()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    x = jnp.where(gb.node_mask[:, None], x, 0.0)
    e = jnp.asarray(rng.normal(size=(32, d)).astype(np.float32))
    e = jnp.where(gb.edge_mask[:, None], e, 0.0)
    return gb, x, e


def _dense(params, name):
    return np.asarray(params[name]["kernel"]), np.asarray(params[name]["bias"])


def test_gatedgcn_oracle():
    """x'_i = A x_i + Σ_j σ(e_ij)·B x_j / (Σ_j σ(e_ij) + ε),
    e_ij = D x_i + E x_j + C e  (reference gatedgcn_layer.py:67-126),
    then BN(affine-identity at init uses batch stats)→ReLU→residual."""
    gb, x, e = _tiny_batch()
    layer = GatedGCNLayer(dim=4, residual=True, batch_norm=False)
    variables = layer.init(jax.random.PRNGKey(1), gb, x, e, False)
    out_x, out_e = layer.apply(variables, gb, x, e, False)

    p = variables["params"]
    A = _dense(p, "Dense_0")
    B = _dense(p, "Dense_1")
    C = _dense(p, "Dense_2")
    D = _dense(p, "Dense_3")
    E = _dense(p, "Dense_4")
    xn, en = np.asarray(x), np.asarray(e)
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    Ax = xn @ A[0] + A[1]
    Bx = xn @ B[0] + B[1]
    Ce = en @ C[0] + C[1]
    Dx = xn @ D[0] + D[1]
    Ex = xn @ E[0] + E[1]
    gate = Dx[r] + Ex[s] + Ce
    sig = 1 / (1 + np.exp(-gate))
    num = np.zeros_like(xn)
    den = np.zeros_like(xn)
    for k in range(len(s)):
        if em[k]:
            num[r[k]] += sig[k] * Bx[s[k]]
            den[r[k]] += sig[k]
    x_new = Ax + num / (den + 1e-6)
    # batch_norm=False → Norm is identity; act; residual
    expect_x = xn + np.maximum(x_new, 0)
    expect_e = en + np.maximum(gate, 0)
    nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(out_x)[nm], expect_x[nm], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_e)[em], expect_e[em], rtol=1e-4,
                               atol=1e-5)


def test_gin_oracle():
    """x'_i = MLP((1+ε)x_i + Σ_j x_j) with ε=0 at init."""
    gb, x, e = _tiny_batch()
    layer = GINLayer(dim=4)
    variables = layer.init(jax.random.PRNGKey(2), gb, x, e, False)
    out, _ = layer.apply(variables, gb, x, e, False)
    p = variables["params"]["MLP_0"]
    W0 = _dense(p, "Dense_0")
    W1 = _dense(p, "Dense_1")
    xn = np.asarray(x)
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    agg = np.zeros_like(xn)
    for k in range(len(s)):
        if em[k]:
            agg[r[k]] += xn[s[k]]
    h = xn + agg   # eps init 0
    expect = np.maximum(h @ W0[0] + W0[1], 0) @ W1[0] + W1[1]
    nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(out)[nm], expect[nm], rtol=1e-4,
                               atol=1e-5)


def test_gcn_oracle():
    """Symmetric-normalized GCN with implicit self-loop."""
    gb, x, e = _tiny_batch()
    layer = GCNLayer(dim=4)
    variables = layer.init(jax.random.PRNGKey(3), gb, x, e, False)
    out, _ = layer.apply(variables, gb, x, e, False)
    W = _dense(variables["params"], "Dense_0")
    xn = np.asarray(x)
    h = xn @ W[0] + W[1]
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    deg = np.zeros(xn.shape[0])
    for k in range(len(s)):
        if em[k]:
            deg[r[k]] += 1
    dinv = 1 / np.sqrt(deg + 1.0)
    expect = h * (dinv ** 2)[:, None]
    for k in range(len(s)):
        if em[k]:
            expect[r[k]] += h[s[k]] * dinv[s[k]] * dinv[r[k]]
    nm = np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(out)[nm], expect[nm], rtol=1e-4,
                               atol=1e-5)


def test_mha_oracle():
    """Dense masked softmax attention vs straight numpy."""
    rng = np.random.default_rng(0)
    B, H, N, Dh = 1, 2, 6, 4
    q = rng.normal(size=(B, H, N, Dh)).astype(np.float32)
    k = rng.normal(size=(B, H, N, Dh)).astype(np.float32)
    v = rng.normal(size=(B, H, N, Dh)).astype(np.float32)
    mask = np.array([[True] * 4 + [False] * 2])
    out = np.asarray(mha_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(mask)))
    for h in range(H):
        logits = q[0, h] @ k[0, h].T / np.sqrt(Dh)
        logits[:, ~mask[0]] = -1e30
        a = np.exp(logits - logits.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        expect = a @ v[0, h]
        np.testing.assert_allclose(out[0, h, mask[0]], expect[mask[0]],
                                   rtol=1e-4, atol=1e-5)


def test_favor_approximates_softmax():
    """FAVOR+ with many random features ≈ softmax attention (reference
    performer_layer.py math). Checked by correlation, not exactness."""
    rng = np.random.default_rng(0)
    B, H, N, Dh = 1, 1, 16, 8
    q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32)) * 0.5
    k = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32)) * 0.5
    v = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    exact = np.asarray(mha_core(q, k, v, mask))
    outs = []
    for seed in range(3):
        proj = favor.orthogonal_gaussian(jax.random.PRNGKey(seed), 256, Dh)
        outs.append(np.asarray(favor.favor_attention(q, k, v, mask, proj)))
    approx = np.mean(outs, axis=0)
    corr = np.corrcoef(exact.ravel(), approx.ravel())[0, 1]
    assert corr > 0.9, corr
    assert np.abs(exact - approx).mean() < 0.15


def test_bigbird_mask_structure():
    n, bs, nrand = 30, 3, 2
    m = bigbird_block_mask(n, bs, nrand, seed=0)
    assert m.shape == (n, n)
    # reference global semantics: FIRST and LAST blocks
    # (bigbird_layer.py:494,517-523) — rows and columns
    assert m[:bs, :].all() and m[-bs:, :].all()
    assert m[:, :bs].all() and m[:, -bs:].all()
    # sliding window: diagonal always allowed
    assert np.diag(m).all()
    # deterministic per seed
    m2 = bigbird_block_mask(n, bs, nrand, seed=0)
    np.testing.assert_array_equal(m, m2)
    m3 = bigbird_block_mask(n, bs, nrand, seed=1)
    assert (m != m3).any()


def test_bigbird_mask_matches_reference_oracle():
    """Block-pattern equivalence vs a numpy oracle of the reference semantics
    (bigbird_block_sparse_attention parts 1-5, bigbird_layer.py:316-765):
    first/last query blocks attend everything; middle query blocks attend the
    first/last key blocks + a 3-block sliding window + n random key blocks."""
    n, bs, nrand = 48, 4, 2
    nb = n // bs
    m = bigbird_block_mask(n, bs, nrand, seed=0)
    # collapse back to block granularity
    blocks = m.reshape(nb, bs, nb, bs).any(axis=(1, 3))
    assert blocks[0].all() and blocks[-1].all()          # parts 1 & 5
    for i in range(1, nb - 1):                           # parts 2-4
        expected_fixed = {0, nb - 1, i - 1, i, i + 1}
        on = set(np.nonzero(blocks[i])[0].tolist())
        assert expected_fixed <= on
        n_random = len(on - expected_fixed)
        assert n_random <= nrand                         # seeded random keys
    # middle rows are sparse, not global
    assert not blocks[1:-1].all()
