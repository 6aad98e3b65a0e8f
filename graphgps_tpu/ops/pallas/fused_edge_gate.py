"""Edge-tiled GatedGCN gather/gate/aggregate kernel for LONG graphs.

The small-graph ``fused_gatedgcn`` kernel holds a whole graph block in VMEM —
impossible at superpixel scale (VOC: N≤512 nodes, ~3k edges/graph, a 24 MB
block). The XLA blocked path materializes the (B, E, N) one-hot gather
matrices in HBM instead (~200 MB at the VOC shape, re-read by every segment
op). This kernel takes the middle road:

- the five Linears stay OUTSIDE in XLA (big (S, d) matmuls run near-roofline
  there);
- the memory-bound middle — sender/receiver one-hot gathers, the σ gate, and
  the masked num/den segment-sum — runs per (graph, edge-tile-group) grid
  step with every one-hot built and consumed in VMEM;
- per graph, the node projections are resident across its edge tiles (block
  index constant in t), and the (N, 2d) num/den accumulator lives in the
  output ref, initialized at the first tile group.

Layout: edges reshape to (B, T, Et) tiles with Et=128 and T a multiple of
TG=8 (callers pad the edge axis; padded slots point at node 0 with mask 0 —
the device-arena invariant). The (TG, Et) tile-group blocks keep every
resident-array access 8-sublane aligned (the constraint that bars the
small-graph kernel from G<8 blocks).

Gradients: custom VJP; the backward recomputes the forward tiles and emits
d(pD), d(pEB) accumulated per graph plus per-tile d(ce); weight/bias grads
fall out of XLA's autodiff through the outside Linears.

Reference: gatedgcn_layer.py:30-137 (same math as fused_gatedgcn.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .fused_gatedgcn import _dot, _dot_tn, _interpret

ET = 128   # edges per tile (lane-friendly)
TG = 8     # tiles per grid step (sublane-aligned group)


def _onehots(s_ref, r_ref, em_ref, N):
    """(TG, Et) index/mask blocks → (TG·Et, N) one-hots (f32) built in VMEM:
    oh_s, oh_r (unmasked; padded edges point at a real node) and the
    edge-masked receiver one-hot for the aggregation."""
    f32 = jnp.float32
    s3 = s_ref[0]                                     # (TG, Et) i32
    r3 = r_ref[0]
    em3 = em_ref[0].astype(f32)
    io = jax.lax.broadcasted_iota(jnp.int32, (TG, ET, N), 2)
    oh_s = (s3[:, :, None] == io).astype(f32).reshape(TG * ET, N)
    oh_r3 = (r3[:, :, None] == io).astype(f32)
    oh_r = oh_r3.reshape(TG * ET, N)
    ohr_m = (oh_r3 * em3[:, :, None]).reshape(TG * ET, N)
    return oh_s, oh_r, ohr_m


def _fwd_kernel(pd_ref, peb_ref, ce_ref, s_ref, r_ref, em_ref,
                gate_ref, nd_ref, *, N, d):
    f32 = jnp.float32
    t = pl.program_id(1)
    oh_s, oh_r, ohr_m = _onehots(s_ref, r_ref, em_ref, N)
    gs = _dot(oh_s, peb_ref[0].astype(f32))           # (TGE, 2d) [Ex|Bx]_s
    dr = _dot(oh_r, pd_ref[0].astype(f32))            # (TGE, d)  Dx_r
    gate = dr + gs[:, :d] + ce_ref[0].reshape(TG * ET, d).astype(f32)
    sig = jax.nn.sigmoid(gate)
    msgs = sig * gs[:, d:]
    nd = _dot_tn(ohr_m, jnp.concatenate([msgs, sig], axis=1))  # (N, 2d)
    gate_ref[0] = gate.reshape(TG, ET, d).astype(gate_ref.dtype)

    @pl.when(t == 0)
    def _init():
        nd_ref[0] = nd

    @pl.when(t != 0)
    def _acc():
        nd_ref[0] += nd


def _bwd_kernel(pd_ref, peb_ref, ce_ref, s_ref, r_ref, em_ref,
                gg_ref, gnd_ref,
                dpd_ref, dpeb_ref, dce_ref, *, N, d):
    f32 = jnp.float32
    t = pl.program_id(1)
    oh_s, oh_r, ohr_m = _onehots(s_ref, r_ref, em_ref, N)
    gs = _dot(oh_s, peb_ref[0].astype(f32))
    dr = _dot(oh_r, pd_ref[0].astype(f32))
    gate = dr + gs[:, :d] + ce_ref[0].reshape(TG * ET, d).astype(f32)
    sig = jax.nn.sigmoid(gate)

    gg = gg_ref[0].reshape(TG * ET, d).astype(f32)
    gnd = gnd_ref[0].astype(f32)                       # (N, 2d)
    # nd = ohr_m^T @ [sig·Bx_s | sig] → per-edge cotangents via ohr_m
    dcat = _dot(ohr_m, gnd)                            # (TGE, 2d)
    dmsgs, dsig_den = dcat[:, :d], dcat[:, d:]
    dsig = dmsgs * gs[:, d:] + dsig_den
    dgate = dsig * sig * (1.0 - sig) + gg
    dbxs = dmsgs * sig
    dce_ref[0] = dgate.reshape(TG, ET, d).astype(dce_ref.dtype)

    dpd = _dot_tn(oh_r, dgate)                         # (N, d)
    dpeb = jnp.concatenate(
        [_dot_tn(oh_s, dgate), _dot_tn(oh_s, dbxs)], axis=1)   # (N, 2d)

    @pl.when(t == 0)
    def _init():
        dpd_ref[0] = dpd.astype(dpd_ref.dtype)
        dpeb_ref[0] = dpeb.astype(dpeb_ref.dtype)

    @pl.when(t != 0)
    def _acc():
        dpd_ref[0] += dpd.astype(dpd_ref.dtype)
        dpeb_ref[0] += dpeb.astype(dpeb_ref.dtype)


@jax.custom_vjp
def fused_edge_gate(pd, peb, ce, s_loc, r_loc, emask):
    """pd: (B, N, d) receiver projection Dx; peb: (B, N, 2d) sender
    projections [Ex|Bx]; ce: (B, T, Et, d) edge projection tiles;
    s_loc/r_loc: (B, T, Et) i32 graph-local endpoints; emask: (B, T, Et).
    T % 8 == 0, Et == 128 (callers pad; padded edges → node 0, mask 0).

    Returns (gate (B, T, Et, d), nd (B, N, 2d) = [Σσ·Bx_s | Σσ] per
    receiver, masked) — the memory-bound middle of GatedGCN; callers apply
    x_out = Ax + num/(den+ε) and the norm tails outside.
    """
    return _fwd(pd, peb, ce, s_loc, r_loc, emask)


def _specs(B, T, N, d):
    node = lambda w: pl.BlockSpec((1, N, w), lambda b, t: (b, 0, 0))
    edge4 = pl.BlockSpec((1, TG, ET, d), lambda b, t: (b, t, 0, 0))
    edge3 = pl.BlockSpec((1, TG, ET), lambda b, t: (b, t, 0))
    return node, edge4, edge3


def _fwd(pd, peb, ce, s_loc, r_loc, emask):
    B, N, d = pd.shape
    T = s_loc.shape[1]
    node, edge4, edge3 = _specs(B, T, N, d)
    kern = functools.partial(_fwd_kernel, N=N, d=d)
    return pl.pallas_call(
        kern,
        grid=(B, T // TG),
        in_specs=[node(d), node(2 * d), edge4, edge3, edge3, edge3],
        out_specs=[edge4, node(2 * d)],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, ET, d), pd.dtype),
            jax.ShapeDtypeStruct((B, N, 2 * d), jnp.float32),
        ],
        interpret=_interpret(),
    )(pd, peb, ce, s_loc, r_loc, emask.astype(pd.dtype))


def _vjp_fwd(pd, peb, ce, s_loc, r_loc, emask):
    y = _fwd(pd, peb, ce, s_loc, r_loc, emask)
    return y, (pd, peb, ce, s_loc, r_loc, emask)


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def _vjp_bwd(res, g):
    pd, peb, ce, s_loc, r_loc, emask = res
    gg, gnd = g
    B, N, d = pd.shape
    T = s_loc.shape[1]
    node, edge4, edge3 = _specs(B, T, N, d)
    kern = functools.partial(_bwd_kernel, N=N, d=d)
    dpd, dpeb, dce = pl.pallas_call(
        kern,
        grid=(B, T // TG),
        in_specs=[node(d), node(2 * d), edge4, edge3, edge3, edge3,
                  edge4, node(2 * d)],
        out_specs=[node(d), node(2 * d), edge4],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), pd.dtype),
            jax.ShapeDtypeStruct((B, N, 2 * d), peb.dtype),
            jax.ShapeDtypeStruct((B, T, ET, d), ce.dtype),
        ],
        interpret=_interpret(),
    )(pd, peb, ce, s_loc, r_loc, emask.astype(pd.dtype), gg,
      gnd.astype(jnp.float32))
    return (dpd, dpeb, dce, _f0(s_loc), _f0(r_loc),
            jnp.zeros_like(emask))


fused_edge_gate.defvjp(_vjp_fwd, _vjp_bwd)


def fused_edge_gate_spmd(pd, peb, ce, s_loc, r_loc, emask):
    """DP mesh wrapper: every argument and output is batch-leading, so the
    shard_map has no replicated operands at all (grads shard with the
    batch). Plain call single-device."""
    from .spmd import dp_mesh, dp_shard_map

    mesh = dp_mesh(pd.shape[0])
    if mesh is None:
        return fused_edge_gate(pd, peb, ce, s_loc, r_loc, emask)
    P = jax.sharding.PartitionSpec
    b = P("data")
    return dp_shard_map(
        fused_edge_gate, mesh,
        in_specs=(b, b, b, b, b, b), out_specs=(b, b),
    )(pd, peb, ce, s_loc, r_loc, emask)


def edge_gate_eligible(batch, x, e, dim: int, equivstable_pe: bool) -> bool:
    """Long-graph rung: blocked arena layout, no ES-PE, and a VMEM budget
    check on the per-step residents (node projections + one-hot tiles).
    GGPS_FUSED_EDGEGATE=0 kills it for A/B runs."""
    import os

    from .spmd import dp_compatible

    if os.environ.get("GGPS_FUSED_EDGEGATE") == "0":
        return False
    if os.environ.get("GGPS_FUSED_GGCN") == "0":
        return False   # the all-GatedGCN-kernels A/B switch covers this rung
    if not dp_compatible(batch.num_graphs):
        return False
    if (batch.edge_block is None or e is None or equivstable_pe
            or x.shape[-1] != dim or e.shape[-1] != dim or dim < 64):
        return False
    N = batch.max_nodes
    dp = -(-dim // 128) * 128
    # residents per step (f32): pd + peb + nd accum + one-hot tiles ×3 +
    # gather/gate intermediates ~6·TGE·dp
    vmem = (3 * N * dp + 2 * N * dp) * 4 + 3 * (TG * ET * N) * 4 \
        + 8 * (TG * ET * dp) * 4
    return N % 8 == 0 and vmem <= (13 << 20)