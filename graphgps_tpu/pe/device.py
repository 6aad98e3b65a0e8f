"""On-device (batched, jitted) positional-encoding computation.

The reference precomputes PEs per graph on the host with numpy eigh / dense
matpowers (/root/reference/graphgps/transform/posenc_stats.py — O(N³) python
loop over 3.7M graphs for PCQM4Mv2). TPU-native alternative: compute PEs for a
whole padded batch at once on device —

- ``batched_lap_eig``: one ``jnp.linalg.eigh`` over the (B, Nmax, Nmax) padded
  Laplacian stack (masked so padding decouples), smallest-k eigenpairs with the
  reference's NaN-padding semantics expressed as masks;
- ``batched_rwse``: k-step random-walk diagonals via iterated batched SpMM on
  the dense (B, Nmax, Nmax) transition stack;
- ``batched_heat_kernel_diag`` from the eigendecomposition.

These run inside jit (e.g. fused into the first training step or a
preprocessing pass over the dataset) and match pe/host.py numerically on real
nodes — tests/test_pe_device.py.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..data.graph import GraphBatch


def batched_adjacency(batch: GraphBatch) -> jax.Array:
    """(B, Nmax, Nmax) dense adjacency from the flat edge list (undirected
    symmetrization, no self loops). Padded edges are masked out."""
    B, N = batch.num_graphs, batch.max_nodes
    s_local = batch.senders % N
    r_local = batch.receivers % N
    g = batch.receivers // N
    flat = g * (N * N) + s_local * N + r_local
    ones = batch.edge_mask.astype(jnp.float32)
    A = jnp.zeros((B * N * N,), jnp.float32).at[flat].add(
        ones, indices_are_sorted=False, unique_indices=False)
    A = A.reshape(B, N, N)
    A = jnp.maximum(A, A.transpose(0, 2, 1))   # symmetrize
    A = jnp.minimum(A, 1.0)                    # dedupe multi-edges
    eye = jnp.eye(N)[None]
    return A * (1.0 - eye)


def batched_laplacian(A: jax.Array, node_mask: jax.Array,
                      norm: str = "sym") -> jax.Array:
    """Masked (sym-normalized) Laplacian stack; padded rows/cols are identity
    so they contribute eigenvalue 1 clusters that we mask off afterwards."""
    B, N, _ = A.shape
    m = node_mask.reshape(B, N).astype(A.dtype)
    deg = A.sum(-1)
    if norm == "sym":
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        L = jnp.eye(N)[None] * m[:, :, None] * m[:, None, :] \
            - dinv[:, :, None] * A * dinv[:, None, :]
    else:
        L = jnp.eye(N)[None] * deg[:, :, None] * 0 + jnp.zeros_like(A)
        L = jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(deg) - A
    # decouple padding: identity rows with large diagonal so padded eigenpairs
    # sort to the top and never enter the smallest-k selection
    pad = (1.0 - m)
    L = L * m[:, :, None] * m[:, None, :] + \
        jnp.eye(N)[None] * pad[:, :, None] * 1e6
    return L


def batched_lap_eig(batch: GraphBatch, max_freqs: int,
                    laplacian_norm: str = "sym",
                    eigvec_norm: str = "L2") -> Tuple[jax.Array, jax.Array]:
    """Smallest-`max_freqs` eigenpairs per graph.

    Returns (eigvals (B, k), eigvecs (B*Nmax, k)); entries beyond a graph's
    real spectrum (n < k) are NaN — same convention as pe/host.lap_eig.
    """
    B, N = batch.num_graphs, batch.max_nodes
    A = batched_adjacency(batch)
    m = batch.node_mask.reshape(B, N)
    L = batched_laplacian(A, batch.node_mask,
                          "none" if laplacian_norm == "none" else "sym")
    evals, evecs = jnp.linalg.eigh(L)          # ascending; padding at ≥1e6
    k = max_freqs
    vals = evals[:, :k]
    vecs = evecs[:, :, :k]
    n_real = m.sum(-1, keepdims=True)          # (B, 1)
    freq_ok = jnp.arange(k)[None, :] < n_real  # (B, k)
    # normalize eigvecs over real rows
    mm = m[:, :, None].astype(vecs.dtype)
    if eigvec_norm == "L2":
        denom = jnp.sqrt(jnp.sum((vecs * mm) ** 2, axis=1, keepdims=True))
    elif eigvec_norm == "L1":
        denom = jnp.sum(jnp.abs(vecs * mm), axis=1, keepdims=True)
    elif eigvec_norm == "abs-max":
        denom = jnp.max(jnp.abs(vecs * mm), axis=1, keepdims=True)
    else:
        denom = jnp.ones((B, 1, k), vecs.dtype)
    vecs = vecs / jnp.maximum(denom, 1e-12)
    vals = jnp.where(freq_ok, vals, jnp.nan)
    vecs = jnp.where(freq_ok[:, None, :] & m[:, :, None], vecs, jnp.nan)
    return vals, vecs.reshape(B * N, k)


def batched_rwse(batch: GraphBatch, times: List[int]) -> jax.Array:
    """Random-walk landing probabilities diag(P^k) for k in times;
    (B*Nmax, K). Matches pe/host.rwse on real nodes."""
    B, N = batch.num_graphs, batch.max_nodes
    A = batched_adjacency(batch)
    deg = A.sum(-1)
    dinv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    P = dinv[:, :, None] * A                   # (B, N, N)
    out = []
    Pk = None
    prev_k = 0
    for k in sorted(times):
        steps = k - prev_k
        if Pk is None:
            Pk = jnp.linalg.matrix_power(P, k) if k > 1 else P
        else:
            for _ in range(steps):
                Pk = jnp.einsum("bij,bjk->bik", Pk, P,
                                preferred_element_type=jnp.float32)
        prev_k = k
        diag = jnp.diagonal(Pk, axis1=1, axis2=2)   # (B, N)
        out.append(diag)
    res = jnp.stack(out, axis=-1)              # (B, N, K)
    return res.reshape(B * N, len(times))


def compute_posenc_device(graphs, cfg, batch_graphs: int = 256) -> bool:
    """Fill ``g.pe`` for every graph using DEVICE-batched kernels.

    The reference precomputes PEs with a per-graph numpy loop
    (np.linalg.eigh O(N³) per graph — hours over PCQM4Mv2's 3.7M molecules,
    /root/reference/graphgps/loader/master_loader.py:206-216). Here graphs are
    bucketed by size, collated into padded stacks, and each bucket runs ONE
    jitted batched computation (eigh / iterated SpMM) on the accelerator.

    Returns True if every enabled PE type was computed on device; False when a
    type needs the host engine (SignNet eigvecs-as-extras layout, ElstaticSE,
    GraphormerBias — the caller falls back for those).
    """
    import functools
    import numpy as np

    from ..config.config import enabled_posenc, parse_times_func
    from ..data.batching import collate, round_up

    names = enabled_posenc(cfg)
    device_types = {"RWSE", "HKdiagSE", "LapPE", "EquivStableLapPE"}
    if not names or not set(names) <= device_types:
        return False

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _run(gb, which, params_items):
        params = dict(params_items)
        out = {}
        if "RWSE" in which:
            out["pestat_RWSE"] = batched_rwse(gb, list(params["rwse_times"]))
        if "HKdiagSE" in which:
            out["pestat_HKdiagSE"] = batched_heat_kernel_diag(
                gb, list(params["hk_times"]))
        if "LapPE" in which or "EquivStableLapPE" in which:
            key = "LapPE" if "LapPE" in which else "EquivStableLapPE"
            vals, vecs = batched_lap_eig(gb, params["max_freqs"],
                                         params["lap_norm"],
                                         params["eigvec_norm"])
            out["EigVecs"] = vecs
            out["EigVals"] = vals
        return out

    lap_name = ("LapPE" if "LapPE" in names
                else "EquivStableLapPE" if "EquivStableLapPE" in names else None)
    p = {}
    if "RWSE" in names:
        c = cfg.posenc_RWSE.kernel
        p["rwse_times"] = tuple(c.times or parse_times_func(c.times_func))
    if "HKdiagSE" in names:
        c = cfg.posenc_HKdiagSE.kernel
        p["hk_times"] = tuple(c.times or parse_times_func(c.times_func))
    if lap_name:
        lp = cfg[f"posenc_{lap_name}"]
        p["max_freqs"] = lp.eigen.max_freqs
        p["lap_norm"] = lp.eigen.laplacian_norm
        p["eigvec_norm"] = lp.eigen.eigvec_norm
    else:
        p["max_freqs"], p["lap_norm"], p["eigvec_norm"] = 0, "sym", "L2"
    which = tuple(sorted(names))
    params_static = tuple(sorted(p.items()))

    # bucket by padded size so each bucket compiles once
    order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_nodes)
    i = 0
    while i < len(order):
        chunk = order[i:i + batch_graphs]
        i += batch_graphs
        nmax = round_up(max(graphs[j].num_nodes for j in chunk), 16)
        emax = round_up(sum(graphs[j].num_edges for j in chunk) + 8, 128)
        gs = [graphs[j] for j in chunk]
        # strip y/pe for collation (not needed for PE math)
        from ..data.graph import Graph
        bare = [Graph(node_feat=g.node_feat[:, :1], edge_index=g.edge_index)
                for g in gs]
        gb = collate(bare, len(bare), nmax, emax).to_graph_batch()
        out = _run(gb, which, params_static)
        host = jax.device_get(out)
        for bi, j in enumerate(chunk):
            g = graphs[j]
            n = g.num_nodes
            lo = bi * nmax
            if "pestat_RWSE" in host:
                g.pe["pestat_RWSE"] = np.asarray(
                    host["pestat_RWSE"][lo:lo + n])
            if "pestat_HKdiagSE" in host:
                g.pe["pestat_HKdiagSE"] = np.asarray(
                    host["pestat_HKdiagSE"][lo:lo + n])
            if "EigVecs" in host:
                g.pe["EigVecs"] = np.asarray(host["EigVecs"][lo:lo + n])
                g.extras["EigVals"] = np.asarray(
                    host["EigVals"][bi:bi + 1])
    return True


def batched_heat_kernel_diag(batch: GraphBatch, times: List[int]) -> jax.Array:
    """Heat-kernel diagonals Σ_i exp(-t λ_i) φ²; (B*Nmax, T)."""
    B, N = batch.num_graphs, batch.max_nodes
    A = batched_adjacency(batch)
    L = batched_laplacian(A, batch.node_mask, "sym")
    evals, evecs = jnp.linalg.eigh(L)
    m = batch.node_mask.reshape(B, N)
    real = evals < 1e5                          # padded eigenpairs pushed to 1e6
    # normalize over real rows
    mm = m[:, :, None].astype(evecs.dtype)
    denom = jnp.sqrt(jnp.sum((evecs * mm) ** 2, axis=1, keepdims=True))
    evecs = evecs / jnp.maximum(denom, 1e-12)
    outs = []
    for t in times:
        w = jnp.where(real, jnp.exp(-t * evals), 0.0)   # (B, N)
        hk = jnp.einsum("bk,bnk->bn", w, evecs ** 2)
        outs.append(hk)
    return jnp.stack(outs, axis=-1).reshape(B * N, len(times))
