"""Fused GatedGCN layer core: 5 projections → gathers → gate → masked
segment-sum → node update, in ONE Pallas kernel (fwd + custom-VJP bwd).

Replaces the hot path of the reference's ``GatedGCNLayer``
(/root/reference/graphgps/layer/gatedgcn_layer.py:30-137: the A..E Linears,
sender/receiver gathers, sigma gate and scatter-sum) for the blocked
device-arena layout. The XLA path round-trips five (S, d)/(E, d) projection
tensors plus gather/gate/message intermediates through HBM every layer
(profiled round 4 at the pcqm-deep shape: 963 us/layer fwd+bwd, 15.4 ms of a
29 ms step — the largest single block). Here every intermediate lives in
VMEM: HBM traffic is one read of x/e, one write of the two outputs, and the
grid-resident weights.

Formulation (per graph, batched over a block of G graphs):

    proj = x @ [A|D|E|B] + b                         # ONE (N, d)x(d, 4d) MXU op
    ce   = e @ C + c
    Ex_s, Bx_s = onehot(s) @ proj[:, 2d:4d]          # sender gather, (E, 2d)
    Dx_r       = onehot(r) @ proj[:, d:2d]           # receiver gather
    gate  = Dx_r + Ex_s + ce                         # -> e output (pre-norm)
    sig   = sigmoid(gate)
    nd    = (onehot(r)·emask)^T @ [sig*Bx_s | sig]   # masked segment-sum, (N, 2d)
    x_out = proj[:, :d] + nd_num / (nd_den + 1e-6)   # -> node output (pre-norm)

The gathers/scatters are graph-local one-hot MXU contractions (exact row
selection; VJP is the transposed block matmul, no TPU scatter anywhere) —
the same trick as ops/segment.py's blocked path, but fused so the one-hots
and every intermediate never leave VMEM. BatchNorm/act/dropout/residual
stay outside (they need cross-graph batch statistics and are cheap).

Numerics: dots accumulate in f32 (preferred_element_type); sigmoid and the
num/den division in f32. Matmul passes are bf16 on TPU (the XLA path's
default single-pass class) and f32 in interpret mode so CPU parity tests
hold tight tolerances — identical policy to fused_gps_attn.py.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _params():
    """Raise the scoped-VMEM compiler limit (default 16 MB): the d=384
    GPS-medium backward block measures 18.6 MB and the chip's physical VMEM
    takes it (the wide-attention kernel already runs 17+ MB sets)."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _dot_dt():
    if _os.environ.get("GGPS_FUSED_DOT_F32") == "1":
        return jnp.float32
    return jnp.float32 if _interpret() else jnp.bfloat16


def _dot(a, b):
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """(M, K) x (N, K) → (M, N) — b used transposed, untransposed in VMEM."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """(K, M) x (K, N) → (M, N)."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot(a, b, ca, cb):
    """Batched (axis 0) contraction of a's axis ``ca`` with b's ``cb``."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _core_from_proj(proj, ce, s_ref, r_ref, em_ref, *, G, N, E, d):
    """GatedGCN gather/gate/aggregate middle from a PRECOMPUTED node
    projection ``proj`` (G·N, 4d) and edge projection ``ce`` (G·E, d) —
    shared by the standalone kernels here and the merged layer kernel
    (ops/pallas/fused_layer.py), which slices them out of a joint matmul."""
    f32 = jnp.float32
    i = pl.program_id(0)
    s = s_ref[pl.ds(i * G, G), :]                       # (G, E) i32, local ids
    r = r_ref[pl.ds(i * G, G), :]
    em = em_ref[pl.ds(i * G, G), :].astype(f32)         # (G, E) 1/0
    io = jax.lax.broadcasted_iota(jnp.int32, (G, E, N), 2)
    oh_s = (s[:, :, None] == io).astype(f32)
    oh_r = (r[:, :, None] == io).astype(f32)
    p3 = proj.reshape(G, N, 4 * d)
    gs = _bdot(oh_s, p3[:, :, 2 * d:], 2, 1)            # (G, E, 2d) [Ex|Bx]_s
    dr = _bdot(oh_r, p3[:, :, d:2 * d], 2, 1)           # (G, E, d)  Dx_r
    gate = dr + gs[:, :, :d] + ce.reshape(G, E, d)
    sig = jax.nn.sigmoid(gate)
    msgs = sig * gs[:, :, d:]
    ohr_m = oh_r * em[:, :, None]
    nd = _bdot(ohr_m, jnp.concatenate([msgs, sig], axis=2), 1, 1)  # (G, N, 2d)
    return p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd


def _fwd_core(x_ref, e_ref, s_ref, r_ref, em_ref, wn_ref, bn_ref,
              wc_ref, bc_ref, *, G, N, E, d):
    """Shared fwd recompute: returns everything the fwd/bwd kernels need."""
    f32 = jnp.float32
    x2 = x_ref[:].reshape(G * N, d).astype(f32)
    e2 = e_ref[:].reshape(G * E, d).astype(f32)
    proj = _dot(x2, wn_ref[:].astype(f32)) + bn_ref[0].astype(f32)
    ce = _dot(e2, wc_ref[:].astype(f32)) + bc_ref[0].astype(f32)
    (p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd) = _core_from_proj(
        proj, ce, s_ref, r_ref, em_ref, G=G, N=N, E=E, d=d)
    return x2, e2, p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd


def _fwd_kernel(x_ref, e_ref, s_ref, r_ref, em_ref, nm_ref, wn_ref, bn_ref,
                wc_ref, bc_ref, cx_ref, cg_ref, xo_ref, go_ref,
                px_ref, pg_ref, *, G, N, E, d):
    f32 = jnp.float32
    i = pl.program_id(0)
    (_, _, p3, _, gate, _, _, _, _, nd) = _fwd_core(
        x_ref, e_ref, s_ref, r_ref, em_ref, wn_ref, bn_ref, wc_ref, bc_ref,
        G=G, N=N, E=E, d=d)
    xo = p3[:, :, :d] + nd[:, :, :d] / (nd[:, :, d:] + 1e-6)
    xo_ref[:] = xo.astype(xo_ref.dtype)
    go_ref[:] = gate.astype(go_ref.dtype)

    # masked BatchNorm moment partials (running-mean shift for conditioning,
    # models/common.py MaskedBatchNorm): [Σ m·y | Σ m·y²], y = value − c.
    # Grid-accumulated; the (1, d)-level mean/var math stays in flax.
    nm = nm_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]     # (G, N, 1)
    em = em_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]     # (G, E, 1)
    yx = xo - cx_ref[0].astype(f32)                              # (G, N, d)
    yg = gate - cg_ref[0].astype(f32)                            # (G, E, d)
    myx = (nm * yx).reshape(G * N, d)
    myx2 = (nm * yx * yx).reshape(G * N, d)
    myg = (em * yg).reshape(G * E, d)
    myg2 = (em * yg * yg).reshape(G * E, d)
    px = jnp.concatenate(
        [jnp.sum(myx, axis=0, keepdims=True),
         jnp.sum(myx2, axis=0, keepdims=True)], axis=1)          # (1, 2d)
    pg = jnp.concatenate(
        [jnp.sum(myg, axis=0, keepdims=True),
         jnp.sum(myg2, axis=0, keepdims=True)], axis=1)

    @pl.when(i == 0)
    def _init():
        px_ref[:] = px
        pg_ref[:] = pg

    @pl.when(i != 0)
    def _acc():
        px_ref[:] += px
        pg_ref[:] += pg


def _bwd_kernel(x_ref, e_ref, s_ref, r_ref, em_ref, nm_ref, wn_ref, bn_ref,
                wc_ref, bc_ref, cx_ref, cg_ref, gx_ref, gg_ref,
                gpx_ref, gpg_ref,
                dx_ref, de_ref, dwn_ref, dbn_ref, dwc_ref, dbc_ref,
                *, G, N, E, d):
    f32 = jnp.float32
    i = pl.program_id(0)
    (x2, e2, p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd) = _fwd_core(
        x_ref, e_ref, s_ref, r_ref, em_ref, wn_ref, bn_ref, wc_ref, bc_ref,
        G=G, N=N, E=E, d=d)
    gx3 = gx_ref[:].astype(f32)                          # (G, N, d)
    gg3 = gg_ref[:].astype(f32)                          # (G, E, d)

    num, den = nd[:, :, :d], nd[:, :, d:]
    inv = 1.0 / (den + 1e-6)

    # cotangents of the moment-partial outputs fold straight into the xo /
    # gate cotangents: d/dv Σm(v−c) = m,  d/dv Σm(v−c)² = 2m(v−c)
    nm = nm_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]
    em3 = em_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]
    gpx = gpx_ref[:].astype(f32)                         # (1, 2d)
    gpg = gpg_ref[:].astype(f32)
    xo = p3[:, :, :d] + num * inv
    gx3 = gx3 + nm * (gpx[:, :d][None]
                      + 2.0 * (xo - cx_ref[0].astype(f32))
                      * gpx[:, d:][None])
    gg3 = gg3 + em3 * (gpg[:, :d][None]
                       + 2.0 * (gate - cg_ref[0].astype(f32))
                       * gpg[:, d:][None])

    dnum = gx3 * inv
    dden = -(gx3 * num) * inv * inv
    dmsgs = _bdot(ohr_m, dnum, 2, 1)                     # (G, E, d)
    dsig = dmsgs * gs[:, :, d:] + _bdot(ohr_m, dden, 2, 1)
    dgate = dsig * sig * (1.0 - sig) + gg3
    dbxs = dmsgs * sig
    # scatter-back to node rows = transposed one-hot contraction over E
    dDx = _bdot(oh_r, dgate, 1, 1)                       # (G, N, d)
    dEx = _bdot(oh_s, dgate, 1, 1)
    dBx = _bdot(oh_s, dbxs, 1, 1)
    dproj = jnp.concatenate([gx3, dDx, dEx, dBx], axis=2).reshape(G * N, 4 * d)
    dgate2 = dgate.reshape(G * E, d)

    wn = wn_ref[:].astype(f32)
    wc = wc_ref[:].astype(f32)
    dx_ref[:] = _dot_nt(dproj, wn).reshape(G, N, d).astype(dx_ref.dtype)
    de_ref[:] = _dot_nt(dgate2, wc).reshape(G, E, d).astype(de_ref.dtype)
    dwn = _dot_tn(x2, dproj)
    dbn = jnp.sum(dproj, axis=0, keepdims=True)
    dwc = _dot_tn(e2, dgate2)
    dbc = jnp.sum(dgate2, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwn_ref[:] = dwn
        dbn_ref[:] = dbn
        dwc_ref[:] = dwc
        dbc_ref[:] = dbc

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dwn_ref[:] += dwn
        dbn_ref[:] += dbn
        dwc_ref[:] += dwc
        dbc_ref[:] += dbc


def pick_block(B: int, N: int, E: int, d: int):
    """Graphs per grid step, or None when no legal block exists. Per-graph
    VMEM residents are ~(12·N + 14·E)·d·4 bytes across fwd+bwd program
    values; budget a few MB, keep G | B, and keep G a MULTIPLE OF 8 — the
    kernels' ``pl.ds(i*G, G)`` row slices of the resident (B, E)/(B, N)
    index/mask arrays need provably 8-aligned sublane offsets (measured:
    G=16 and G=8 compile, G∈{1,2,4} fail Mosaic's alignment check at the
    VOC shape). B < 8 graphs is allowed as a single full block (offset 0).
    GGPS_GGCN_G overrides for A/B tuning."""
    env = _os.environ.get("GGPS_GGCN_G")
    if env:
        G = min(int(env), B)
        while B % G:
            G -= 1
        return G
    # Byte model overestimates (Mosaic reuses buffers; dots run bf16):
    # measured at the pcqm shape (N=32, E=64, d=256), G=16 compiles and
    # is the fastest point (G=32 overflows VMEM), so the budget is set
    # to land there while still scaling down for bigger blocks.
    per_graph = (12 * N + 14 * E) * d * 4
    cap = max(1, min(B, (24 << 20) // max(per_graph, 1)))
    if B <= cap:
        return B                 # single/whole-batch blocks: offset 0 only
    G = cap - cap % 8            # largest 8-multiple under the VMEM cap
    while G >= 8 and B % G:
        G -= 8
    return G if G >= 8 else None


def _pick_block(B: int, N: int, E: int, d: int) -> int:
    G = pick_block(B, N, E, d)
    assert G is not None, "caller must gate on pick_block(...) first"
    return G


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


@jax.custom_vjp
def fused_gatedgcn(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc):
    """x: (B, N, d) nodes; e: (B, E, d) edges; s_loc/r_loc: (B, E) i32
    graph-LOCAL endpoint ids (device arenas point padded edges at a real node
    of the same graph); emask/nmask: (B, E)/(B, N) f32 1/0; cx/cg: (d,)
    moment-shift vectors (MaskedBatchNorm running means — MUST be
    stop-gradient’ed by the caller, their cotangent is dropped); wn: (d, 4d)
    columns [A|D|E|B] of the five reference Linears (C separate); bn: (4d,);
    wc: (d, d); bc: (d,).

    Returns (x_pre, gate, px, pg): the pre-norm node update
    Ax + Σσ·Bx / (Σσ + ε), the pre-norm edge update (gate), and the masked
    BatchNorm moment partials ``(1, 2d) = [Σ m·(v−c) | Σ m·(v−c)²]`` for
    each — numerically matching the unfused blocked-XLA path to matmul-pass
    rounding.
    """
    return _fwd_call(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc)


def _resident_specs(B, N, E, d):
    return [
        pl.BlockSpec((B, E), lambda i: (0, 0)),        # s_loc (full, resident)
        pl.BlockSpec((B, E), lambda i: (0, 0)),        # r_loc
        pl.BlockSpec((B, E), lambda i: (0, 0)),        # emask
        pl.BlockSpec((B, N), lambda i: (0, 0)),        # nmask
        pl.BlockSpec((d, 4 * d), lambda i: (0, 0)),    # wn
        pl.BlockSpec((1, 4 * d), lambda i: (0, 0)),    # bn
        pl.BlockSpec((d, d), lambda i: (0, 0)),        # wc
        pl.BlockSpec((1, d), lambda i: (0, 0)),        # bc
        pl.BlockSpec((1, d), lambda i: (0, 0)),        # cx
        pl.BlockSpec((1, d), lambda i: (0, 0)),        # cg
    ]


def _fwd_call(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc):
    B, N, d = x.shape
    E = e.shape[1]
    G = _pick_block(B, N, E, d)
    f32 = jnp.float32
    kern = functools.partial(_fwd_kernel, G=G, N=N, E=E, d=d)
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, d), lambda i: (i, 0, 0)),   # x
            pl.BlockSpec((G, E, d), lambda i: (i, 0, 0)),   # e
        ] + _resident_specs(B, N, E, d),
        out_specs=[
            pl.BlockSpec((G, N, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, E, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((B, E, d), e.dtype),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(x, e, s_loc, r_loc, emask.astype(x.dtype), nmask.astype(x.dtype),
      wn, bn.reshape(1, -1), wc, bc.reshape(1, -1),
      cx.reshape(1, -1), cg.reshape(1, -1))


def _vjp_fwd(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc):
    y = _fwd_call(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc)
    return y, (x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc)


def _vjp_bwd(res, g):
    x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc = res
    gx, gg, gpx, gpg = g
    B, N, d = x.shape
    E = e.shape[1]
    G = _pick_block(B, N, E, d)
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, G=G, N=N, E=E, d=d)
    dx, de, dwn, dbn, dwc, dbc = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, d), lambda i: (i, 0, 0)),   # x
            pl.BlockSpec((G, E, d), lambda i: (i, 0, 0)),   # e
        ] + _resident_specs(B, N, E, d) + [
            pl.BlockSpec((G, N, d), lambda i: (i, 0, 0)),   # gx
            pl.BlockSpec((G, E, d), lambda i: (i, 0, 0)),   # gg
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),     # gpx
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),     # gpg
        ],
        out_specs=[
            pl.BlockSpec((G, N, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, E, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, 4 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 4 * d), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((B, E, d), e.dtype),
            jax.ShapeDtypeStruct((d, 4 * d), f32),
            jax.ShapeDtypeStruct((1, 4 * d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(x, e, s_loc, r_loc, emask.astype(x.dtype), nmask.astype(x.dtype),
      wn, bn.reshape(1, -1), wc, bc.reshape(1, -1),
      cx.reshape(1, -1), cg.reshape(1, -1), gx, gg,
      gpx.reshape(1, -1), gpg.reshape(1, -1))
    return (dx, de,
            _f0(s_loc), _f0(r_loc), jnp.zeros_like(emask),
            jnp.zeros_like(nmask),
            jnp.zeros_like(cx), jnp.zeros_like(cg),  # caller stop-grads c
            dwn.astype(wn.dtype), dbn.reshape(-1).astype(bn.dtype),
            dwc.astype(wc.dtype), dbc.reshape(-1).astype(bc.dtype))


fused_gatedgcn.defvjp(_vjp_fwd, _vjp_bwd)


def fused_gatedgcn_spmd(x, e, s_loc, r_loc, emask, nmask, cx, cg,
                        wn, bn, wc, bc):
    """``fused_gatedgcn`` under an ambient mesh: plain call single-device;
    shard_map over 'data' on a pure-DP mesh (batch args sharded, weights
    replicated — their grads psum via the shard_map transpose; the moment
    partials psum inside the body so they leave replicated)."""
    from .spmd import dp_mesh, dp_shard_map

    mesh = dp_mesh(x.shape[0])
    if mesh is None:
        return fused_gatedgcn(x, e, s_loc, r_loc, emask, nmask, cx, cg,
                              wn, bn, wc, bc)
    P = jax.sharding.PartitionSpec
    b3 = P("data", None, None)
    b2 = P("data", None)
    rep = P(None)

    def body(x, e, s, r, em, nm, cx, cg, wn, bn, wc, bc):
        xo, gate, px, pg = fused_gatedgcn(x, e, s, r, em, nm, cx, cg,
                                          wn, bn, wc, bc)
        return (xo, gate, jax.lax.psum(px, "data"),
                jax.lax.psum(pg, "data"))

    return dp_shard_map(
        body, mesh,
        in_specs=(b3, b3, b2, b2, b2, b2, rep, rep, rep, rep, rep, rep),
        out_specs=(b3, b3, rep, rep),
    )(x, e, s_loc, r_loc, emask, nmask, cx, cg, wn, bn, wc, bc)


def _ceil128(d: int) -> int:
    return -(-d // 128) * 128


def _pad_last(a, dp: int):
    d = a.shape[-1]
    if d == dp:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, dp - d)])


def fused_gatedgcn_padded(x, e, s_loc, r_loc, emask, nmask, cx, cg,
                          wA, wD, wE, wB, bA, bD, bE, bB, wc, bc):
    """``fused_gatedgcn_spmd`` for ANY hidden width: non-128-multiple dims
    are zero-padded to the next lane multiple (zero lanes flow through the
    gate as exact zeros — sigmoid(0)·0 messages, 0 numerators — and are
    sliced off, incl. the moment partials). Takes the five reference
    Linears' kernels/biases separately so each (d, d) block pads square
    before packing into the kernel's [A|D|E|B] layout."""
    d = x.shape[-1]
    dp = _ceil128(d)
    pk = lambda w: jnp.pad(w, ((0, dp - d), (0, dp - d)))  # noqa: E731
    pb = lambda b: _pad_last(b, dp)                        # noqa: E731
    wn = jnp.concatenate([pk(wA), pk(wD), pk(wE), pk(wB)], axis=1)
    bn = jnp.concatenate([pb(bA), pb(bD), pb(bE), pb(bB)])
    xo, gate, px, pg = fused_gatedgcn_spmd(
        _pad_last(x, dp), _pad_last(e, dp), s_loc, r_loc, emask, nmask,
        _pad_last(cx, dp), _pad_last(cg, dp), wn, bn, pk(wc), pb(bc))
    if dp != d:
        xo = xo[..., :d]
        gate = gate[..., :d]
        px = jnp.concatenate([px[:, :d], px[:, dp:dp + d]], axis=1)
        pg = jnp.concatenate([pg[:, :d], pg[:, dp:dp + d]], axis=1)
    return xo, gate, px, pg


def fused_gatedgcn_eligible(batch, x, e, dim: int,
                            equivstable_pe: bool) -> bool:
    """Blocked arena layout present, lane-aligned square projections, no
    ES-PE message rescale (that path keeps the XLA formulation).
    GGPS_FUSED_GGCN=0 kills the path for A/B runs."""
    env = _os.environ.get("GGPS_FUSED_GGCN")
    if env == "0":
        return False
    from ..segment import _blocked_ok
    from .spmd import dp_compatible
    if not dp_compatible(batch.num_graphs):
        # pure data-parallel meshes compose via fused_gatedgcn_spmd; under
        # tensor/expert parallelism the XLA path (which the SPMD
        # partitioner handles natively) serves
        return False
    return (batch.edge_block is not None
            and e is not None
            and not equivstable_pe
            # the in-kernel one-hot contractions share the blocked-path FLOP
            # blow-up bound (ops/segment._blocked_ok, GGPS_BLOCKED_LIMIT):
            # long-graph shapes would waste ~max_nodes× MXU work per gather
            and _blocked_ok(batch.edge_block, batch.max_nodes)
            # a legal (8-aligned, VMEM-fitting) graph block must exist at
            # the PADDED width
            and pick_block(batch.num_graphs, batch.max_nodes,
                           batch.edge_block, _ceil128(dim)) is not None
            and x.shape[-1] == dim and e.shape[-1] == dim
            # any width ≥ 64: non-128 multiples run through the zero-pad
            # wrapper (≤2× lane overhead); below 64 the padding waste
            # overtakes the fusion win
            and dim >= 64
            and batch.max_nodes % 8 == 0
            and batch.edge_block % 8 == 0)
