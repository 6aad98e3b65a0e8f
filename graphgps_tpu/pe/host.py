"""Host-side (numpy) positional/structural encoding precompute.

Semantics parity with the reference engine
(/root/reference/graphgps/transform/posenc_stats.py:13-145): LapPE eigh of the
(optionally sym-normalized) Laplacian with NaN padding, eigvec normalization
variants (:352-402), RWSE random-walk landing probabilities (:184-230), heat-kernel
diagonals (:233-279), electrostatic encodings (:322-349), and Graphormer
shortest-path bias (/root/reference/graphgps/encoder/graphormer_encoder.py:15-100).

These run once per graph at dataset-load time. On-device batched equivalents live
in graphgps_tpu/pe/device.py for PCQM4Mv2-scale preprocessing.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.graph import Graph


def adjacency(g: Graph, undirected: bool = True) -> np.ndarray:
    n = g.num_nodes
    A = np.zeros((n, n), dtype=np.float64)
    s, r = g.edge_index
    A[s, r] = 1.0
    if undirected:
        A[r, s] = 1.0
    np.fill_diagonal(A, 0.0)
    return A


def laplacian(A: np.ndarray, norm: Optional[str] = "sym") -> np.ndarray:
    deg = A.sum(axis=1)
    if norm in (None, "none"):
        return np.diag(deg) - A
    with np.errstate(divide="ignore"):
        dinv_sqrt = np.where(deg > 0, deg ** -0.5, 0.0)
    L = np.eye(A.shape[0]) - dinv_sqrt[:, None] * A * dinv_sqrt[None, :]
    # zero-degree nodes: L_ii = 1 by convention above is wrong (isolated node has
    # L_ii = 0 in D-A); keep I - D^-1/2 A D^-1/2 semantics like scipy/PyG.
    return L


def eigvec_normalizer(evects: np.ndarray, evals: np.ndarray,
                      normalization: str = "L2", eps: float = 1e-12) -> np.ndarray:
    """Normalize eigenvectors columnwise (reference posenc_stats.py:352-402)."""
    if normalization == "L1":
        denom = np.abs(evects).sum(axis=0, keepdims=True)
    elif normalization == "L2":
        denom = np.linalg.norm(evects, axis=0, keepdims=True)
    elif normalization == "abs-max":
        denom = np.abs(evects).max(axis=0, keepdims=True)
    elif normalization == "wavelength":
        denom = np.abs(evects).max(axis=0, keepdims=True)
        evals_c = np.clip(evals, 0, None)
        wavelength = 2 * np.pi / np.sqrt(evals_c + eps)
        return evects / np.maximum(denom, eps) * wavelength[None, :] / (2 * np.pi)
    elif normalization == "wavelength-asin":
        denom = np.abs(evects).max(axis=0, keepdims=True)
        evals_c = np.clip(evals, 0, 4.0)
        wavelength = 2 * np.pi / (np.arcsin(np.sqrt(evals_c) / 2.0) + eps)
        return evects / np.maximum(denom, eps) * wavelength[None, :] / (2 * np.pi)
    elif normalization in ("none", None):
        return evects
    else:
        raise ValueError(f"unknown eigvec normalization {normalization}")
    return evects / np.maximum(denom, eps)


def lap_eig(g: Graph, max_freqs: int, laplacian_norm: str = "sym",
            eigvec_norm: str = "L2") -> Tuple[np.ndarray, np.ndarray]:
    """Smallest-`max_freqs` Laplacian eigenpairs, NaN-padded when N < max_freqs.

    Returns (eigvals (max_freqs,), eigvecs (N, max_freqs)) float32; mirrors
    get_lap_decomp_stats (reference posenc_stats.py:148-181).
    """
    n = g.num_nodes
    L = laplacian(adjacency(g), None if laplacian_norm == "none" else laplacian_norm)
    evals, evects = np.linalg.eigh(L)
    k = min(n, max_freqs)
    idx = np.argsort(evals)[:k]
    evals_k, evects_k = evals[idx], evects[:, idx]
    evects_k = eigvec_normalizer(evects_k, evals_k, eigvec_norm)
    out_vals = np.full((max_freqs,), np.nan, dtype=np.float32)
    out_vecs = np.full((n, max_freqs), np.nan, dtype=np.float32)
    out_vals[:k] = evals_k
    out_vecs[:, :k] = evects_k
    return out_vals, out_vecs


def rwse(g: Graph, times: List[int]) -> np.ndarray:
    """Diagonals of random-walk matrix powers P^k, P = D^-1 A.

    Mirrors get_rw_landing_probs (reference posenc_stats.py:184-230), including the
    consecutive-k fast path that reuses the running matrix power.
    """
    n = g.num_nodes
    A = adjacency(g)
    deg = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, 1.0 / deg, 0.0)
    P = dinv[:, None] * A
    out = np.zeros((n, len(times)), dtype=np.float32)
    if not times:
        return out
    Pk = np.linalg.matrix_power(P, times[0])
    out[:, 0] = np.diag(Pk)
    for i, (k_prev, k) in enumerate(zip(times[:-1], times[1:]), start=1):
        if k == k_prev + 1:
            Pk = Pk @ P
        else:
            Pk = np.linalg.matrix_power(P, k)
        out[:, i] = np.diag(Pk)
    return out


def heat_kernel_diag(g: Graph, times: List[int]) -> np.ndarray:
    """Heat-kernel diagonal Σ_i exp(-t λ_i) φ_ij² over the sym-normalized
    Laplacian spectrum (reference posenc_stats.py:233-279)."""
    n = g.num_nodes
    L = laplacian(adjacency(g), "sym")
    evals, evects = np.linalg.eigh(L)
    # drop the ~zero first frequency like the reference (one per component kept out)
    evects = evects / np.maximum(np.linalg.norm(evects, axis=0, keepdims=True), 1e-12)
    out = np.zeros((n, len(times)), dtype=np.float32)
    for j, t in enumerate(times):
        out[:, j] = (np.exp(-t * evals)[None, :] * evects ** 2).sum(axis=1)
    return out


def electrostatic(g: Graph) -> np.ndarray:
    """10 per-node summary stats of the Laplacian pseudo-inverse Green's function
    (reference posenc_stats.py:322-349)."""
    n = g.num_nodes
    L = laplacian(adjacency(g), None)
    Dinv = np.linalg.pinv(L)
    Dinv = Dinv - np.diag(np.diag(Dinv))  # zero the diagonal like reference
    A = adjacency(g)
    deg = np.maximum(A.sum(axis=1), 1.0)
    elec = Dinv
    feats = np.stack([
        elec.min(axis=0), elec.max(axis=0), elec.mean(axis=0), elec.std(axis=0),
        elec.min(axis=1), elec.max(axis=1), elec.mean(axis=1), elec.std(axis=1),
        (A @ elec).diagonal() / deg,       # mean of interaction over neighbors (row)
        (elec @ A).diagonal() / deg,
    ], axis=1)
    return feats.astype(np.float32)


def graphormer_bias(g: Graph, num_spatial_types: int,
                    directed: bool = False,
                    with_edge_paths: bool = False) -> Dict[str, np.ndarray]:
    """All-pairs shortest-path types + in/out degrees for the Graphormer bias
    encoder (reference graphormer_encoder.py:15-100). BFS per node
    (unweighted) with parent tracking; with ``with_edge_paths`` also returns
    ``shortest_path_types`` (N, N, num_spatial_types): the scalar edge-type
    sequence along each shortest path (reference :66-93), consumed by the
    BiasEncoder's edge-distance term."""
    n = g.num_nodes
    adj: List[List[int]] = [[] for _ in range(n)]
    s, r = g.edge_index
    for a, b in zip(s.tolist(), r.tolist()):
        adj[a].append(b)
        if not directed:
            adj[b].append(a)
    INF = 1 << 30  # true unreachable sentinel — clamping happens below only
    dist = np.full((n, n), INF, dtype=np.int64)
    parent = np.full((n, n), -1, dtype=np.int32) if with_edge_paths else None
    for src in range(n):
        dist[src, src] = 0
        frontier = [src]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[src, v] > d:
                        dist[src, v] = d
                        if parent is not None:
                            parent[src, v] = u
                        nxt.append(v)
            frontier = nxt
    # reference convention (graphormer_encoder.py:63,81-85): reachable pairs
    # get len(truncated path)−1 ≤ distance−1; unreachable pairs get `distance`
    spatial = np.where(dist >= INF, num_spatial_types,
                       np.minimum(dist, num_spatial_types - 1)).astype(np.int32)
    in_deg = np.zeros((n,), dtype=np.int32)
    out_deg = np.zeros((n,), dtype=np.int32)
    for a, b in zip(s.tolist(), r.tolist()):
        out_deg[a] += 1
        in_deg[b] += 1
    if not directed:
        deg = in_deg + out_deg
        in_deg = out_deg = deg
    out = dict(spatial_types=spatial, in_degrees=in_deg, out_degrees=out_deg)

    if with_edge_paths and g.edge_feat is not None:
        # scalar edge type per (u, v) like the reference (edge_attr[:, 0]
        # when multi-column)
        etype = np.zeros((n, n), dtype=np.int64)
        ef = g.edge_feat.reshape(g.num_edges, -1)[:, 0]
        etype[s, r] = ef
        if not directed:
            etype[r, s] = ef
        D = num_spatial_types
        spt = np.zeros((n, n, D), dtype=np.int64)
        for i in range(n):
            for j in range(n):
                if i == j or dist[i, j] >= INF:
                    continue  # no path → all-zero type row (reference zeros)
                # walk back through BFS parents, truncating like the
                # reference's path[:distance]
                path = [j]
                while path[-1] != i:
                    path.append(int(parent[i, path[-1]]))
                path.reverse()
                path = path[:D]
                for k in range(len(path) - 1):
                    spt[i, j, k] = etype[path[k], path[k + 1]]
        out["shortest_path_types"] = spt
    return out


# ---------------------------------------------------------------------------------
# Orchestrator

def compute_posenc(graphs: List[Graph], cfg) -> None:
    """Apply all enabled posenc_* computations in place (the analog of the
    reference's compute_posenc_stats loop, master_loader.py:206-216).

    With ``cfg.dataset.posenc_device=True`` (default False — the host engine
    wins below million-graph scale, see docs/RESULTS.md), the device-batched
    engine (pe/device.py) handles RWSE/HKdiagSE/LapPE buckets in a few jitted
    calls; this host loop covers the rest and serves as the fallback."""
    from ..config.config import enabled_posenc, parse_times_func

    names = enabled_posenc(cfg)
    if not names:
        return
    if cfg.dataset.get("posenc_device", False):
        from .device import compute_posenc_device
        try:
            if compute_posenc_device(graphs, cfg):
                return
        except Exception as e:  # fall back to the host engine
            import logging
            logging.getLogger("graphgps_tpu").warning(
                "device PE precompute failed (%s) — host fallback", e)
    for g in graphs:
        for name in names:
            pcfg = cfg[f"posenc_{name}"]
            if name in ("LapPE", "EquivStableLapPE"):
                evals, evects = lap_eig(g, pcfg.eigen.max_freqs,
                                        pcfg.eigen.laplacian_norm,
                                        pcfg.eigen.eigvec_norm)
                g.pe["EigVecs"] = evects
                g.extras["EigVals"] = np.broadcast_to(
                    evals[None, :], (1, evals.shape[0])).copy()
            elif name == "SignNet":
                evals, evects = lap_eig(g, pcfg.eigen.max_freqs,
                                        pcfg.eigen.laplacian_norm,
                                        pcfg.eigen.eigvec_norm)
                g.pe["eigvecs_sn"] = evects
                g.extras["eigvals_sn"] = np.broadcast_to(
                    evals[None, :], (1, evals.shape[0])).copy()
            elif name == "RWSE":
                times = pcfg.kernel.times or parse_times_func(pcfg.kernel.times_func)
                g.pe["pestat_RWSE"] = rwse(g, times)
            elif name == "HKdiagSE":
                times = pcfg.kernel.times or parse_times_func(pcfg.kernel.times_func)
                g.pe["pestat_HKdiagSE"] = heat_kernel_diag(g, times)
            elif name == "ElstaticSE":
                g.pe["pestat_ElstaticSE"] = electrostatic(g)
            elif name == "GraphormerBias":
                stats = graphormer_bias(
                    g, pcfg.num_spatial_types, pcfg.directed_graphs,
                    with_edge_paths=bool(pcfg.get("has_edge_attr", False))
                    and g.edge_feat is not None)
                g.extras["spatial_types"] = stats["spatial_types"]
                if "shortest_path_types" in stats:
                    g.extras["shortest_path_types"] = stats["shortest_path_types"]
                g.pe["in_degrees"] = stats["in_degrees"][:, None]
                g.pe["out_degrees"] = stats["out_degrees"][:, None]
            else:
                raise ValueError(f"unknown posenc type {name}")
