"""Merged GPS layer front-half: GatedGCN core + global attention in ONE
Pallas launch (fwd + custom-VJP bwd).

Round 5's profile left the pcqm-deep step kernel-bound with the GatedGCN
core and the v1 attention as separate launches that each read the SAME
layer-input x, each run their own projection matmul, and whose dx outputs
XLA then adds. This kernel merges them per (graph-block) grid step:

    projall = x @ [A|D|E|B | Wq|Wk|Wv] + b      # ONE (N, d)x(d, 7d) MXU op
    core    = gather/gate/aggregate middle      # fused_gatedgcn math
    attn    = head-packed masked MHA + out-proj # fused_gps_attn math
    s_attn  = x + dropout(attn_out)             # the branch's drop_add
    + masked BatchNorm moment partials for all THREE pre-norm outputs
      (x_new, gate, s_attn) — so no XLA stats reduce remains for the
      attention branch either.

vs the unmerged pipeline this removes per layer: one x read, one dx add
(the two branches' input cotangents sum in-register), the drop_add launch,
the s_attn stats reduce, and two kernel launches fwd + two bwd. The
backward recomputes the joint projection once for both branches and emits
dx through a single (7d) transpose matmul.

Weight layout: callers pre-concatenate wnq = [wn | wqkv] (d, 7d) and
bnq = [bn | bqkv] (7d,) per call (a ~2 MB copy, invisible next to the
kernel); grads return split. Dropout sites replay via on-chip PRNG offsets
(0 = attention P, 1 = output drop). Semantics match the unmerged kernels
exactly (tests/test_fused_layer.py); reference anchor: gps_layer.py:105-221
+ gatedgcn_layer.py:30-137.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gatedgcn import (_bdot, _core_from_proj, _dot, _dot_nt, _dot_tn,
                             _f0, _interpret, _params, pick_block)
from .fused_gps_attn import _attn_fwd_all, _blk, _m1t
from .fused_tail import _keep, _seed_arr


def _moments3(v3, m3, c, rows):
    """Masked shifted moment partials from 3D blocks: v3 (G, R, d),
    m3 (G, R, 1) → (1, 2d) = [Σ m·(v−c) | Σ m·(v−c)²]. The mask stays 3D
    and the collapse keeps the lane axis intact (Mosaic has no
    column-vector reshape)."""
    y = v3 - c
    my = (m3 * y).reshape(rows, y.shape[-1])
    my2 = (m3 * y * y).reshape(rows, y.shape[-1])
    return jnp.concatenate(
        [jnp.sum(my, axis=0, keepdims=True),
         jnp.sum(my2, axis=0, keepdims=True)], axis=1)


def _fl_fwd_kernel(seed_ref, x_ref, e_ref, s_ref, r_ref, em_ref, nm_ref,
                   wnq_ref, bnq_ref, wc_ref, bc_ref, wo_ref, bo_ref,
                   cx_ref, cg_ref, ca_ref,
                   xo_ref, go_ref, sa_ref, px_ref, pg_ref, pa_ref,
                   *, G, N, E, d, H, scale, attn_rate, drop_rate):
    f32 = jnp.float32
    i = pl.program_id(0)
    x2 = x_ref[:].reshape(G * N, d).astype(f32)
    e2 = e_ref[:].reshape(G * E, d).astype(f32)
    projall = _dot(x2, wnq_ref[:].astype(f32)) + bnq_ref[0].astype(f32)
    ce = _dot(e2, wc_ref[:].astype(f32)) + bc_ref[0].astype(f32)

    # --- GatedGCN core ---------------------------------------------------
    (p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd) = _core_from_proj(
        projall[:, :4 * d], ce, s_ref, r_ref, em_ref, G=G, N=N, E=E, d=d)
    xo = p3[:, :, :d] + nd[:, :, :d] / (nd[:, :, d:] + 1e-6)
    xo_ref[:] = xo.astype(xo_ref.dtype)
    go_ref[:] = gate.astype(go_ref.dtype)

    # --- attention branch ------------------------------------------------
    qkv = projall[:, 4 * d:]
    q3 = qkv[:, :d].reshape(G, N, d)
    k3 = qkv[:, d:2 * d].reshape(G, N, d)
    v3 = qkv[:, 2 * d:].reshape(G, N, d)
    nm = nm_ref[pl.ds(i * G, G), :].astype(f32)           # (G, N)
    m1t = _m1t(d, H, N)
    keep_a, inv_a = (None, 1.0)
    if attn_rate > 0.0:
        keep_a, inv_a = _keep(seed_ref, 0, (G * H * N, N), attn_rate)
        keep_a = keep_a.reshape(G, H * N, N)
    out, _ = _attn_fwd_all(q3, k3, v3, nm, m1t, G, H, scale, keep_a, inv_a)
    y = _dot(out.reshape(G * N, d), wo_ref[:].astype(f32)) \
        + bo_ref[0].astype(f32)
    if drop_rate > 0.0:
        keep_o, inv_o = _keep(seed_ref, 1, y.shape, drop_rate)
        y = y * keep_o * inv_o
    sa = x2 + y
    sa_ref[:] = sa.reshape(G, N, d).astype(sa_ref.dtype)

    # --- moment partials -------------------------------------------------
    em3 = em_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]   # (G, E, 1)
    nm3 = nm[:, :, None]                                       # (G, N, 1)
    px = _moments3(xo, nm3, cx_ref[0].astype(f32), G * N)
    pg = _moments3(gate, em3, cg_ref[0].astype(f32), G * E)
    pa = _moments3(sa.reshape(G, N, d), nm3, ca_ref[0].astype(f32), G * N)

    @pl.when(i == 0)
    def _init():
        px_ref[:] = px
        pg_ref[:] = pg
        pa_ref[:] = pa

    @pl.when(i != 0)
    def _acc():
        px_ref[:] += px
        pg_ref[:] += pg
        pa_ref[:] += pa


def _fl_bwd_kernel(seed_ref, x_ref, e_ref, s_ref, r_ref, em_ref, nm_ref,
                   wnq_ref, bnq_ref, wc_ref, bc_ref, wo_ref, bo_ref,
                   cx_ref, cg_ref, ca_ref,
                   gx_ref, gg_ref, gsa_ref, gpx_ref, gpg_ref, gpa_ref,
                   dx_ref, de_ref, dwnq_ref, dbnq_ref, dwc_ref, dbc_ref,
                   dwo_ref, dbo_ref,
                   *, G, N, E, d, H, scale, attn_rate, drop_rate):
    f32 = jnp.float32
    i = pl.program_id(0)
    x2 = x_ref[:].reshape(G * N, d).astype(f32)
    e2 = e_ref[:].reshape(G * E, d).astype(f32)
    wnq = wnq_ref[:].astype(f32)
    projall = _dot(x2, wnq) + bnq_ref[0].astype(f32)
    ce = _dot(e2, wc_ref[:].astype(f32)) + bc_ref[0].astype(f32)

    (p3, gs, gate, sig, oh_s, oh_r, ohr_m, nd) = _core_from_proj(
        projall[:, :4 * d], ce, s_ref, r_ref, em_ref, G=G, N=N, E=E, d=d)
    num, den = nd[:, :, :d], nd[:, :, d:]
    inv = 1.0 / (den + 1e-6)
    xo = p3[:, :, :d] + num * inv

    qkv = projall[:, 4 * d:]
    q3 = qkv[:, :d].reshape(G, N, d)
    k3 = qkv[:, d:2 * d].reshape(G, N, d)
    v3 = qkv[:, 2 * d:].reshape(G, N, d)
    nm = nm_ref[pl.ds(i * G, G), :].astype(f32)
    m1t = _m1t(d, H, N)
    keep_a, inv_a = (None, 1.0)
    if attn_rate > 0.0:
        keep_a, inv_a = _keep(seed_ref, 0, (G * H * N, N), attn_rate)
        keep_a = keep_a.reshape(G, H * N, N)
    o3, P = _attn_fwd_all(q3, k3, v3, nm, m1t, G, H, scale, keep_a, inv_a)
    wo = wo_ref[:].astype(f32)
    y = _dot(o3.reshape(G * N, d), wo) + bo_ref[0].astype(f32)
    if drop_rate > 0.0:
        keep_o, inv_o = _keep(seed_ref, 1, y.shape, drop_rate)
        yd = y * keep_o * inv_o
    else:
        yd = y
    sa = x2 + yd

    # --- fold moment-partial cotangents (d/dv Σm(v−c)=m, d/dv Σm(v−c)²
    #     = 2m(v−c)) straight into the per-row cotangents -----------------
    em3 = em_ref[pl.ds(i * G, G), :].astype(f32)[:, :, None]
    nm3 = nm[:, :, None]
    gpx = gpx_ref[:].astype(f32)
    gpg = gpg_ref[:].astype(f32)
    gpa = gpa_ref[:].astype(f32)
    gx3 = gx_ref[:].astype(f32) + nm3 * (
        gpx[:, :d][None] + 2.0 * (xo - cx_ref[0].astype(f32))
        * gpx[:, d:][None])
    gg3 = gg_ref[:].astype(f32) + em3 * (
        gpg[:, :d][None] + 2.0 * (gate - cg_ref[0].astype(f32))
        * gpg[:, d:][None])
    sa3 = sa.reshape(G, N, d)
    gsa3 = gsa_ref[:].astype(f32) + nm3 * (
        gpa[:, :d][None] + 2.0 * (sa3 - ca_ref[0].astype(f32))
        * gpa[:, d:][None])

    # --- core backward (fused_gatedgcn math) -----------------------------
    dnum = gx3 * inv
    dden = -(gx3 * num) * inv * inv
    dmsgs = _bdot(ohr_m, dnum, 2, 1)
    dsig = dmsgs * gs[:, :, d:] + _bdot(ohr_m, dden, 2, 1)
    dgate = dsig * sig * (1.0 - sig) + gg3
    dbxs = dmsgs * sig
    dDx = _bdot(oh_r, dgate, 1, 1)
    dEx = _bdot(oh_s, dgate, 1, 1)
    dBx = _bdot(oh_s, dbxs, 1, 1)
    dgate2 = dgate.reshape(G * E, d)

    # --- attention backward (fused_gps_attn math, g := d(sa)) ------------
    gsa2 = gsa3.reshape(G * N, d)
    dy = gsa2 * keep_o * inv_o if drop_rate > 0.0 else gsa2
    do_merged = _dot_nt(dy, wo)
    do3 = do_merged.reshape(G, N, d)
    dout_blk = _blk(do3, m1t, G, H)
    dPd = _bdot(dout_blk, v3, 2, 2)
    Pd = P if keep_a is None else P * keep_a * inv_a
    dv = _bdot(Pd, dout_blk, 1, 1)
    dP = dPd if keep_a is None else dPd * keep_a * inv_a
    dS = P * (dP - jnp.sum(dP * P, axis=-1, keepdims=True))
    dqblk = _bdot(dS, k3, 2, 1)
    dq = jnp.sum((dqblk * m1t[None].astype(dqblk.dtype))
                 .reshape(G, H, N, d), axis=1) * scale
    qblk = _blk(q3, m1t, G, H)
    dk = _bdot(dS, qblk, 1, 1) * scale

    # --- joint input/weight gradients ------------------------------------
    dprojall = jnp.concatenate(
        [gx3.reshape(G * N, d), dDx.reshape(G * N, d),
         dEx.reshape(G * N, d), dBx.reshape(G * N, d),
         dq.reshape(G * N, d), dk.reshape(G * N, d),
         dv.reshape(G * N, d)], axis=1)                   # (G·N, 7d)
    dx = _dot_nt(dprojall, wnq) + gsa2                    # + s_attn residual
    dx_ref[:] = dx.reshape(G, N, d).astype(dx_ref.dtype)
    de_ref[:] = _dot_nt(dgate2, wc_ref[:].astype(f32)).reshape(
        G, E, d).astype(de_ref.dtype)
    dwnq = _dot_tn(x2, dprojall)
    dbnq = jnp.sum(dprojall, axis=0, keepdims=True)
    dwc = _dot_tn(e2, dgate2)
    dbc = jnp.sum(dgate2, axis=0, keepdims=True)
    o_merged = o3.reshape(G * N, d)
    dwo = _dot_tn(o_merged, dy)
    dbo = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dwnq_ref[:] = dwnq
        dbnq_ref[:] = dbnq
        dwc_ref[:] = dwc
        dbc_ref[:] = dbc
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo

    @pl.when(i != 0)
    def _acc():
        dwnq_ref[:] += dwnq
        dbnq_ref[:] += dbnq
        dwc_ref[:] += dwc
        dbc_ref[:] += dbc
        dwo_ref[:] += dwo
        dbo_ref[:] += dbo


def _pick_g(B: int, N: int, E: int, d: int, H: int):
    """Graphs per grid step for the MERGED kernel: the GatedGCN block rule
    (8-aligned slices) intersected with the attention working set.
    GGPS_LAYER_G overrides."""
    import os

    env = os.environ.get("GGPS_LAYER_G")
    if env:
        G = min(int(env), B)
        while B % G:
            G -= 1
        return G
    G = pick_block(B, N, E, d)
    if G is None:
        return None
    # attention adds ~(H·N·N + 4·N·d) f32 per graph; halve G until the
    # combined per-step estimate fits ~24 MB
    per_core = (12 * N + 14 * E) * d * 4
    per_attn = (H * N * N + 6 * N * d) * 4
    while G > 8 and G * (per_core + per_attn) > (24 << 20):
        G //= 2
    while B % G and G > 1:
        G -= 1
    return G if (G >= 8 or G == B) else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def fused_gps_front(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca,
                    wnq, bnq, wc, bc, wo, bo, seed,
                    H: int, scale: float, attn_rate: float,
                    drop_rate: float):
    """x: (B, N, d); e: (B, E, d); index/mask layout as fused_gatedgcn;
    cx/cg/ca: (d,) moment shifts (stop-gradient'ed running means for
    x_new / gate / s_attn); wnq: (d, 7d) = [A|D|E|B|Wq|Wk|Wv]; bnq: (7d,);
    wc/bc: edge Linear; wo/bo: attention out-proj; seed: () int32.

    Returns (x_new, gate, s_attn, px, pg, pa): the three pre-norm tensors
    of the GPS layer's front half and their masked moment partials.
    """
    return _fl_fwd(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca,
                   wnq, bnq, wc, bc, wo, bo, seed, H, scale, attn_rate,
                   drop_rate)


def _fl_specs(B, N, E, d):
    res = [
        pl.BlockSpec((B, E), lambda i, s: (0, 0)),        # s_loc
        pl.BlockSpec((B, E), lambda i, s: (0, 0)),        # r_loc
        pl.BlockSpec((B, E), lambda i, s: (0, 0)),        # emask
        pl.BlockSpec((B, N), lambda i, s: (0, 0)),        # nmask
        pl.BlockSpec((d, 7 * d), lambda i, s: (0, 0)),    # wnq
        pl.BlockSpec((1, 7 * d), lambda i, s: (0, 0)),    # bnq
        pl.BlockSpec((d, d), lambda i, s: (0, 0)),        # wc
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),        # bc
        pl.BlockSpec((d, d), lambda i, s: (0, 0)),        # wo
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),        # bo
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),        # cx
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),        # cg
        pl.BlockSpec((1, d), lambda i, s: (0, 0)),        # ca
    ]
    return res


def _fl_fwd(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq, wc, bc,
            wo, bo, seed, H, scale, attn_rate, drop_rate):
    B, N, d = x.shape
    E = e.shape[1]
    G = _pick_g(B, N, E, d, H)
    assert G is not None, "caller must gate on fused_front_eligible"
    f32 = jnp.float32
    kern = functools.partial(_fl_fwd_kernel, G=G, N=N, E=E, d=d, H=H,
                             scale=scale, attn_rate=attn_rate,
                             drop_rate=drop_rate)
    blkN = pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0))
    blkE = pl.BlockSpec((G, E, d), lambda i, s: (i, 0, 0))
    vec2 = pl.BlockSpec((1, 2 * d), lambda i, s: (0, 0))
    xo, go, sa, px, pg, pa = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=[blkN, blkE] + _fl_specs(B, N, E, d),
            out_specs=[blkN, blkE, blkN, vec2, vec2, vec2],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((B, E, d), e.dtype),
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x, e, s_loc, r_loc, emask.astype(x.dtype),
      nmask.astype(x.dtype), wnq, bnq.reshape(1, -1), wc,
      bc.reshape(1, -1), wo, bo.reshape(1, -1), cx.reshape(1, -1),
      cg.reshape(1, -1), ca.reshape(1, -1))
    return xo, go, sa, px, pg, pa


def _fl_vjp_fwd(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq,
                wc, bc, wo, bo, seed, H, scale, attn_rate, drop_rate):
    y = _fl_fwd(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq,
                wc, bc, wo, bo, seed, H, scale, attn_rate, drop_rate)
    return y, (x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq,
               wc, bc, wo, bo, seed)


def _fl_vjp_bwd(H, scale, attn_rate, drop_rate, res, g):
    (x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq, wc, bc,
     wo, bo, seed) = res
    gx, gg, gsa, gpx, gpg, gpa = g
    B, N, d = x.shape
    E = e.shape[1]
    G = _pick_g(B, N, E, d, H)
    f32 = jnp.float32
    kern = functools.partial(_fl_bwd_kernel, G=G, N=N, E=E, d=d, H=H,
                             scale=scale, attn_rate=attn_rate,
                             drop_rate=drop_rate)
    blkN = pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0))
    blkE = pl.BlockSpec((G, E, d), lambda i, s: (i, 0, 0))
    vec2 = pl.BlockSpec((1, 2 * d), lambda i, s: (0, 0))
    (dx, de, dwnq, dbnq, dwc, dbc, dwo, dbo) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=[blkN, blkE] + _fl_specs(B, N, E, d)
            + [blkN, blkE, blkN, vec2, vec2, vec2],
            out_specs=[
                blkN, blkE,
                pl.BlockSpec((d, 7 * d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, 7 * d), lambda i, s: (0, 0)),
                pl.BlockSpec((d, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((d, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((B, E, d), e.dtype),
            jax.ShapeDtypeStruct((d, 7 * d), f32),
            jax.ShapeDtypeStruct((1, 7 * d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x, e, s_loc, r_loc, emask.astype(x.dtype),
      nmask.astype(x.dtype), wnq, bnq.reshape(1, -1), wc,
      bc.reshape(1, -1), wo, bo.reshape(1, -1), cx.reshape(1, -1),
      cg.reshape(1, -1), ca.reshape(1, -1), gx, gg, gsa,
      gpx.reshape(1, -1), gpg.reshape(1, -1), gpa.reshape(1, -1))
    return (dx, de, _f0(s_loc), _f0(r_loc), jnp.zeros_like(emask),
            jnp.zeros_like(nmask),
            jnp.zeros_like(cx), jnp.zeros_like(cg), jnp.zeros_like(ca),
            dwnq.astype(wnq.dtype), dbnq.reshape(-1).astype(bnq.dtype),
            dwc.astype(wc.dtype), dbc.reshape(-1).astype(bc.dtype),
            dwo.astype(wo.dtype), dbo.reshape(-1).astype(bo.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_gps_front.defvjp(_fl_vjp_fwd, _fl_vjp_bwd)


def fused_gps_front_spmd(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca,
                         wnq, bnq, wc, bc, wo, bo, seed,
                         H, scale, attn_rate, drop_rate):
    """DP-mesh wrapper (batch args shard over 'data', weights/shifts
    replicate; moment partials psum inside the body so they leave
    replicated; per-shard dropout decorrelated)."""
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x.shape[0])
    if mesh is None:
        return fused_gps_front(x, e, s_loc, r_loc, emask, nmask, cx, cg,
                               ca, wnq, bnq, wc, bc, wo, bo, seed,
                               H, scale, attn_rate, drop_rate)
    P = jax.sharding.PartitionSpec
    b3 = P("data", None, None)
    b2 = P("data", None)
    rep = P(None)

    def body(x, e, s, r, em, nm, cx, cg, ca, wnq, bnq, wc, bc, wo, bo,
             seed):
        xo, go, sa, px, pg, pa = fused_gps_front(
            x, e, s, r, em, nm, cx, cg, ca, wnq, bnq, wc, bc, wo, bo,
            fold_shard_seed(seed), H, scale, attn_rate, drop_rate)
        ps = jax.lax.psum
        return xo, go, sa, ps(px, "data"), ps(pg, "data"), ps(pa, "data")

    return dp_shard_map(
        body, mesh,
        in_specs=(b3, b3, b2, b2, b2, b2, rep, rep, rep, rep, rep, rep,
                  rep, rep, rep, P()),
        out_specs=(b3, b3, b3, rep, rep, rep),
    )(x, e, s_loc, r_loc, emask, nmask, cx, cg, ca, wnq, bnq, wc, bc,
      wo, bo, jnp.asarray(seed, jnp.int32))


def fused_front_eligible(batch, x, e, dim: int, H: int,
                         equivstable_pe: bool) -> bool:
    """Merged-kernel envelope: the GatedGCN fused-core envelope at a
    LANE-ALIGNED width (no pad wrapper for the merged kernel) plus the v1
    attention envelope (N ≤ 128). GGPS_FUSED_FRONT=0 kills it for A/B."""
    import os

    from .fused_gatedgcn import fused_gatedgcn_eligible

    if os.environ.get("GGPS_FUSED_FRONT", "1") == "0":
        return False
    if not fused_gatedgcn_eligible(batch, x, e, dim, equivstable_pe):
        return False
    N = batch.max_nodes
    return (dim % 128 == 0 and dim % H == 0 and N <= 128
            and _pick_g(batch.num_graphs, N, batch.edge_block, dim, H)
            is not None)
