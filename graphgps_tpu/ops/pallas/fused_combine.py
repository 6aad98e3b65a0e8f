"""Fused GPS branch-combine + FFN kernel: local tail ∥ attention norm-apply
→ branch sum → whole FFN block, in ONE Pallas launch (fwd + custom-VJP bwd).

Round-4 left the GPS layer's elementwise tails as separate kernels/XLA
passes (profiled round 5 at the pcqm-deep shape: pre_tail x ~0.09 ms/layer
fwd+bwd, attention-branch norm-apply + branch add ~0.05 ms, plus per-launch
overhead ×16 layers). This kernel replaces, per layer:

    h_local = x_in + drop(act(bn_x(v_loc)))     # GatedGCN x-tail
              (fused_pre_tail — reference gatedgcn_layer.py:74-87)
    h_attn  = bn_a(s_attn)                      # attention-branch norm apply
              (reference gps_layer.py:138-160; s_attn = x_in + drop(attn)
               stays a separate producer — its statistics depend on the sum)
    h       = h_local + h_attn                  # branch sum
              (reference gps_layer.py:213)
    out     = h + drop2(W2·drop1(act(W1·h+b1)) + b2)   # FFN block
              (fused_ffn — reference gps_layer.py:216-221)

with every intermediate (h_local, h_attn, h, the (R, 2d) FFN hidden) living
in VMEM. HBM traffic per row block: read x_in, v_loc, s_attn (+ resident
stats/weights), write out — vs the unfused chain's three extra round trips.

Both BatchNorm statistics stay OUTSIDE (MaskedBatchNorm stats_only mode, so
masked-stats + running-stats semantics are bit-exact); the kernel receives
(mu, inv=rsqrt(var+eps), gamma, beta) per branch and returns their
cotangents, through which XLA differentiates the stats like the other tail
kernels. Dropout uses the on-chip PRNG with per-site offsets (local tail 0,
FFN inner 1, FFN outer 2); the backward reseeds identically and replays the
exact masks — no mask tensor touches HBM.

Numerics: dots accumulate f32, bf16 operand passes on TPU (f32 in interpret
mode) — the policy every fused kernel here shares.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gatedgcn import _dot, _dot_nt, _dot_tn, _interpret, _params
from .fused_tail import (SUPPORTED_ACTS, _act_df, _act_f, _ceil128,
                         _f0, _ffn_block, _keep, _pad_last, _row_specs,
                         _seed_arr, _vec_specs, tail_eligible)


def _cf_fwd_kernel(seed_ref, xin_ref, vl_ref, mux_ref, ivx_ref, gax_ref,
                   bex_ref, sa_ref, mua_ref, iva_ref, gaa_ref, bea_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, rate, act):
    f32 = jnp.float32
    x_in = xin_ref[:].astype(f32)
    v = vl_ref[:].astype(f32)
    z = ((v - mux_ref[0].astype(f32)) * ivx_ref[0].astype(f32)
         * gax_ref[0].astype(f32) + bex_ref[0].astype(f32))
    a = _act_f(act, z)
    if rate > 0.0:
        k0, s0 = _keep(seed_ref, 0, a.shape, rate)
        a = a * k0 * s0
    ha = ((sa_ref[:].astype(f32) - mua_ref[0].astype(f32))
          * iva_ref[0].astype(f32) * gaa_ref[0].astype(f32)
          + bea_ref[0].astype(f32))
    h = x_in + a + ha
    a1 = _dot(h, w1_ref[:].astype(f32)) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if rate > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, rate)
        zf = zf * k1 * s1
    a2 = _dot(zf, w2_ref[:].astype(f32)) + b2_ref[0].astype(f32)
    if rate > 0.0:
        k2, s2 = _keep(seed_ref, 2, a2.shape, rate)
        a2 = a2 * k2 * s2
    o_ref[:] = (h + a2).astype(o_ref.dtype)


def _cf_bwd_kernel(seed_ref, xin_ref, vl_ref, mux_ref, ivx_ref, gax_ref,
                   bex_ref, sa_ref, mua_ref, iva_ref, gaa_ref, bea_ref,
                   w1_ref, b1_ref, w2_ref, g_ref,
                   dxin_ref, dvl_ref, dsa_ref,
                   dmux_ref, divx_ref, dgax_ref, dbex_ref,
                   dmua_ref, diva_ref, dgaa_ref, dbea_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, *, rate, act):
    f32 = jnp.float32
    x_in = xin_ref[:].astype(f32)
    v = vl_ref[:].astype(f32)
    mux = mux_ref[0].astype(f32)
    ivx = ivx_ref[0].astype(f32)
    gax = gax_ref[0].astype(f32)
    sa = sa_ref[:].astype(f32)
    mua = mua_ref[0].astype(f32)
    iva = iva_ref[0].astype(f32)
    gaa = gaa_ref[0].astype(f32)
    w1 = w1_ref[:].astype(f32)
    w2 = w2_ref[:].astype(f32)

    # recompute forward to h / FFN intermediates (same PRNG draw order)
    z = (v - mux) * ivx * gax + bex_ref[0].astype(f32)
    a = _act_f(act, z)
    if rate > 0.0:
        k0, s0 = _keep(seed_ref, 0, a.shape, rate)
        a = a * k0 * s0
    ha = (sa - mua) * iva * gaa + bea_ref[0].astype(f32)
    h = x_in + a + ha
    a1 = _dot(h, w1) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if rate > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, rate)
        u = zf * k1 * s1
        k2, s2 = _keep(seed_ref, 2, (zf.shape[0], w2.shape[1]), rate)
    else:
        u = zf

    g = g_ref[:].astype(f32)
    da2 = g * k2 * s2 if rate > 0.0 else g
    du = _dot_nt(da2, w2)
    dzf = du * k1 * s1 if rate > 0.0 else du
    da1 = dzf * _act_df(act, a1)
    dh = g + _dot_nt(da1, w1)

    # attention branch: ha = (sa − mua)·iva·gaa + bea
    yhat_a = (sa - mua) * iva
    dsa = dh * iva * gaa
    dsa_ref[:] = dsa.astype(dsa_ref.dtype)
    dgaa = jnp.sum(dh * yhat_a, axis=0, keepdims=True)
    dbea = jnp.sum(dh, axis=0, keepdims=True)
    dmua = -jnp.sum(dsa, axis=0, keepdims=True)
    diva = jnp.sum(dh * gaa * (sa - mua), axis=0, keepdims=True)

    # local branch (fused_pre_tail backward semantics, g := dh)
    da = dh
    if rate > 0.0:
        da = da * k0 * s0
    dz = da * _act_df(act, z)
    yhat_x = (v - mux) * ivx
    dyhat = dz * gax
    dv = dyhat * ivx
    dvl_ref[:] = dv.astype(dvl_ref.dtype)
    dgax = jnp.sum(dz * yhat_x, axis=0, keepdims=True)
    dbex = jnp.sum(dz, axis=0, keepdims=True)
    dmux = -jnp.sum(dv, axis=0, keepdims=True)
    divx = jnp.sum(dyhat * (v - mux), axis=0, keepdims=True)

    dxin_ref[:] = dh.astype(dxin_ref.dtype)
    dw1 = _dot_tn(h, da1)
    db1 = jnp.sum(da1, axis=0, keepdims=True)
    dw2 = _dot_tn(u, da2)
    db2 = jnp.sum(da2, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dmux_ref[:] = dmux
        divx_ref[:] = divx
        dgax_ref[:] = dgax
        dbex_ref[:] = dbex
        dmua_ref[:] = dmua
        diva_ref[:] = diva
        dgaa_ref[:] = dgaa
        dbea_ref[:] = dbea
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dmux_ref[:] += dmux
        divx_ref[:] += divx
        dgax_ref[:] += dgax
        dbex_ref[:] += dbex
        dmua_ref[:] += dmua
        diva_ref[:] += diva
        dgaa_ref[:] += dgaa
        dbea_ref[:] += dbea
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def fused_combine_ffn(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                      s_attn, mu_a, inv_a, ga_a, be_a,
                      w1, b1, w2, b2, seed, rate: float, act: str):
    """x_in, v_loc, s_attn: (R, d); stats vectors: (d,); w1: (d, dh);
    b1: (dh,); w2: (dh, d); b2: (d,); seed: () int32.

    Returns h + drop(W2·drop(act(W1·h+b1))+b2) where
    h = x_in + drop(act(bn_x(v_loc))) + bn_a(s_attn) — the GPS layer's
    branch combine + FFN with both BatchNorm applies fused in.
    """
    return _cf_fwd(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                   s_attn, mu_a, inv_a, ga_a, be_a,
                   w1, b1, w2, b2, seed, rate, act)


def _cf_fwd(x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
            ga_a, be_a, w1, b1, w2, b2, seed, rate, act):
    R, d = x_in.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    kern = functools.partial(_cf_fwd_kernel, rate=rate, act=act)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 2) + _vec_specs(d, 4)
            + _row_specs(RB, d, 1) + _vec_specs(d, 4) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), x_in.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x_in, v_loc, mu_x.reshape(1, d), inv_x.reshape(1, d),
      ga_x.reshape(1, d), be_x.reshape(1, d), s_attn, mu_a.reshape(1, d),
      inv_a.reshape(1, d), ga_a.reshape(1, d), be_a.reshape(1, d),
      w1, b1.reshape(1, dh), w2, b2.reshape(1, d))


def _cf_vjp_fwd(x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
                ga_a, be_a, w1, b1, w2, b2, seed, rate, act):
    y = _cf_fwd(x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
                ga_a, be_a, w1, b1, w2, b2, seed, rate, act)
    return y, (x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
               ga_a, be_a, w1, b1, w2, b2, seed)


def _cf_vjp_bwd(rate, act, res, g):
    (x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
     ga_a, be_a, w1, b1, w2, b2, seed) = res
    R, d = x_in.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    f32 = jnp.float32
    kern = functools.partial(_cf_bwd_kernel, rate=rate, act=act)
    row = pl.BlockSpec((RB, d), lambda i, s: (i, 0))
    (dxin, dvl, dsa, dmux, divx, dgax, dbex, dmua, diva, dgaa, dbea,
     dw1, db1, dw2, db2) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 2) + _vec_specs(d, 4)
            + _row_specs(RB, d, 1) + _vec_specs(d, 4) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
            ] + _row_specs(RB, d, 1),
            out_specs=[row, row, row] + _vec_specs(d, 8) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, d), x_in.dtype),
                   jax.ShapeDtypeStruct((R, d), v_loc.dtype),
                   jax.ShapeDtypeStruct((R, d), s_attn.dtype)]
        + [jax.ShapeDtypeStruct((1, d), f32)] * 8
        + [jax.ShapeDtypeStruct((d, dh), f32),
           jax.ShapeDtypeStruct((1, dh), f32),
           jax.ShapeDtypeStruct((dh, d), f32),
           jax.ShapeDtypeStruct((1, d), f32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x_in, v_loc, mu_x.reshape(1, d), inv_x.reshape(1, d),
      ga_x.reshape(1, d), be_x.reshape(1, d), s_attn, mu_a.reshape(1, d),
      inv_a.reshape(1, d), ga_a.reshape(1, d), be_a.reshape(1, d),
      w1, b1.reshape(1, dh), w2, g)
    return (dxin, dvl,
            dmux.reshape(-1).astype(mu_x.dtype),
            divx.reshape(-1).astype(inv_x.dtype),
            dgax.reshape(-1).astype(ga_x.dtype),
            dbex.reshape(-1).astype(be_x.dtype),
            dsa,
            dmua.reshape(-1).astype(mu_a.dtype),
            diva.reshape(-1).astype(inv_a.dtype),
            dgaa.reshape(-1).astype(ga_a.dtype),
            dbea.reshape(-1).astype(be_a.dtype),
            dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_combine_ffn.defvjp(_cf_vjp_fwd, _cf_vjp_bwd)


def fused_combine_ffn_spmd(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                           s_attn, mu_a, inv_a, ga_a, be_a,
                           w1, b1, w2, b2, seed, rate, act):
    """DP-mesh wrapper (row tensors shard over 'data', stats/weights
    replicate — grads psum via the shard_map transpose; per-shard dropout
    decorrelated). Plain call single-device."""
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x_in.shape[0])
    if mesh is None:
        return fused_combine_ffn(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                                 s_attn, mu_a, inv_a, ga_a, be_a,
                                 w1, b1, w2, b2, seed, rate, act)
    P = jax.sharding.PartitionSpec
    row = P("data", None)
    rep = P(None)

    def body(x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a,
             ga_a, be_a, w1, b1, w2, b2, seed):
        return fused_combine_ffn(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                                 s_attn, mu_a, inv_a, ga_a, be_a, w1, b1,
                                 w2, b2, fold_shard_seed(seed), rate, act)

    return dp_shard_map(
        body, mesh,
        in_specs=(row, row, rep, rep, rep, rep, row, rep, rep, rep, rep,
                  rep, rep, rep, rep, P()),
        out_specs=row,
    )(x_in, v_loc, mu_x, inv_x, ga_x, be_x, s_attn, mu_a, inv_a, ga_a,
      be_a, w1, b1, w2, b2, jnp.asarray(seed, jnp.int32))


def fused_combine_ffn_padded(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                             s_attn, mu_a, inv_a, ga_a, be_a,
                             w1, b1, w2, b2, seed, rate, act):
    """Zero-pad non-128-multiple widths (padded stat lanes are zero →
    normalized lanes compute exact zeros; padded weight rows/cols are zero)
    and slice the output back."""
    d = x_in.shape[-1]
    dh = w1.shape[1]
    dp, dhp = _ceil128(d), _ceil128(dh)
    if dp == d and dhp == dh:
        return fused_combine_ffn_spmd(x_in, v_loc, mu_x, inv_x, ga_x, be_x,
                                      s_attn, mu_a, inv_a, ga_a, be_a,
                                      w1, b1, w2, b2, seed, rate, act)
    p = lambda t: _pad_last(t, dp)          # noqa: E731
    w1p = jnp.pad(w1, ((0, dp - d), (0, dhp - dh)))
    w2p = jnp.pad(w2, ((0, dhp - dh), (0, dp - d)))
    out = fused_combine_ffn_spmd(
        p(x_in), p(v_loc), p(mu_x), p(inv_x), p(ga_x), p(be_x),
        p(s_attn), p(mu_a), p(inv_a), p(ga_a), p(be_a),
        w1p, _pad_last(b1, dhp), w2p, p(b2), seed, rate, act)
    return out[..., :d]


# --------------------------------------------------------------------------
# fused_bn_ffn: h = bn(s); out = h + drop2(W2·drop1(act(W1·h+b1)) + b2)
# The SAN layer's attention-norm-apply + FFN block in one launch
# (reference san_layer.py:123-216: norm → FFN(residual on the NORMED
# tensor) → norm; SAN applies only the inner dropout — drop2=False there).
# --------------------------------------------------------------------------

def _bf_fwd_kernel(seed_ref, sa_ref, mua_ref, iva_ref, gaa_ref, bea_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, rate, act,
                   drop2):
    f32 = jnp.float32
    h = ((sa_ref[:].astype(f32) - mua_ref[0].astype(f32))
         * iva_ref[0].astype(f32) * gaa_ref[0].astype(f32)
         + bea_ref[0].astype(f32))
    a1 = _dot(h, w1_ref[:].astype(f32)) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if rate > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, rate)
        zf = zf * k1 * s1
    a2 = _dot(zf, w2_ref[:].astype(f32)) + b2_ref[0].astype(f32)
    if rate > 0.0 and drop2:
        k2, s2 = _keep(seed_ref, 2, a2.shape, rate)
        a2 = a2 * k2 * s2
    o_ref[:] = (h + a2).astype(o_ref.dtype)


def _bf_bwd_kernel(seed_ref, sa_ref, mua_ref, iva_ref, gaa_ref, bea_ref,
                   w1_ref, b1_ref, w2_ref, g_ref,
                   dsa_ref, dmua_ref, diva_ref, dgaa_ref, dbea_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, *, rate, act, drop2):
    f32 = jnp.float32
    sa = sa_ref[:].astype(f32)
    mua = mua_ref[0].astype(f32)
    iva = iva_ref[0].astype(f32)
    gaa = gaa_ref[0].astype(f32)
    w1 = w1_ref[:].astype(f32)
    w2 = w2_ref[:].astype(f32)
    h = (sa - mua) * iva * gaa + bea_ref[0].astype(f32)
    a1 = _dot(h, w1) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if rate > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, rate)
        u = zf * k1 * s1
        if drop2:
            k2, s2 = _keep(seed_ref, 2, (zf.shape[0], w2.shape[1]), rate)
    else:
        u = zf
    g = g_ref[:].astype(f32)
    da2 = g * k2 * s2 if (rate > 0.0 and drop2) else g
    du = _dot_nt(da2, w2)
    dzf = du * k1 * s1 if rate > 0.0 else du
    da1 = dzf * _act_df(act, a1)
    dh = g + _dot_nt(da1, w1)

    yhat = (sa - mua) * iva
    dsa = dh * iva * gaa
    dsa_ref[:] = dsa.astype(dsa_ref.dtype)
    dgaa = jnp.sum(dh * yhat, axis=0, keepdims=True)
    dbea = jnp.sum(dh, axis=0, keepdims=True)
    dmua = -jnp.sum(dsa, axis=0, keepdims=True)
    diva = jnp.sum(dh * gaa * (sa - mua), axis=0, keepdims=True)
    dw1 = _dot_tn(h, da1)
    db1 = jnp.sum(da1, axis=0, keepdims=True)
    dw2 = _dot_tn(u, da2)
    db2 = jnp.sum(da2, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dmua_ref[:] = dmua
        diva_ref[:] = diva
        dgaa_ref[:] = dgaa
        dbea_ref[:] = dbea
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dmua_ref[:] += dmua
        diva_ref[:] += diva
        dgaa_ref[:] += dgaa
        dbea_ref[:] += dbea
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_bn_ffn(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed,
                 rate: float, act: str, drop2: bool = False):
    """s: (R, d); stats vectors (d,); FFN weights as in fused_ffn.
    Returns h + drop2?(W2·drop1(act(W1·h+b1))+b2) with h = BN-apply(s) —
    the residual rides the NORMED tensor (SAN semantics)."""
    return _bf_fwd(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed, rate,
                   act, drop2)


def _bf_fwd(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed, rate, act,
            drop2):
    R, d = s.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    kern = functools.partial(_bf_fwd_kernel, rate=rate, act=act, drop2=drop2)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1) + _vec_specs(d, 4) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), s.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), s, mu.reshape(1, d), inv.reshape(1, d),
      gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, dh),
      w2, b2.reshape(1, d))


def _bf_vjp_fwd(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed, rate, act,
                drop2):
    y = _bf_fwd(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed, rate, act,
                drop2)
    return y, (s, mu, inv, gamma, beta, w1, b1, w2, b2, seed)


def _bf_vjp_bwd(rate, act, drop2, res, g):
    s, mu, inv, gamma, beta, w1, b1, w2, b2, seed = res
    R, d = s.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    f32 = jnp.float32
    kern = functools.partial(_bf_bwd_kernel, rate=rate, act=act, drop2=drop2)
    row = pl.BlockSpec((RB, d), lambda i, s: (i, 0))
    (dsa, dmua, diva, dgaa, dbea, dw1, db1, dw2, db2) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1) + _vec_specs(d, 4) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
            ] + _row_specs(RB, d, 1),
            out_specs=[row] + _vec_specs(d, 4) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, d), s.dtype)]
        + [jax.ShapeDtypeStruct((1, d), f32)] * 4
        + [jax.ShapeDtypeStruct((d, dh), f32),
           jax.ShapeDtypeStruct((1, dh), f32),
           jax.ShapeDtypeStruct((dh, d), f32),
           jax.ShapeDtypeStruct((1, d), f32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), s, mu.reshape(1, d), inv.reshape(1, d),
      gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, dh),
      w2, g)
    return (dsa,
            dmua.reshape(-1).astype(mu.dtype),
            diva.reshape(-1).astype(inv.dtype),
            dgaa.reshape(-1).astype(gamma.dtype),
            dbea.reshape(-1).astype(beta.dtype),
            dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_bn_ffn.defvjp(_bf_vjp_fwd, _bf_vjp_bwd)


def fused_bn_ffn_spmd(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed,
                      rate, act, drop2=False):
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(s.shape[0])
    if mesh is None:
        return fused_bn_ffn(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed,
                            rate, act, drop2)
    P = jax.sharding.PartitionSpec
    row = P("data", None)
    rep = P(None)

    def body(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed):
        return fused_bn_ffn(s, mu, inv, gamma, beta, w1, b1, w2, b2,
                            fold_shard_seed(seed), rate, act, drop2)

    return dp_shard_map(
        body, mesh,
        in_specs=(row, rep, rep, rep, rep, rep, rep, rep, rep, P()),
        out_specs=row,
    )(s, mu, inv, gamma, beta, w1, b1, w2, b2,
      jnp.asarray(seed, jnp.int32))


def fused_bn_ffn_padded(s, mu, inv, gamma, beta, w1, b1, w2, b2, seed,
                        rate, act, drop2=False):
    d = s.shape[-1]
    dh = w1.shape[1]
    dp, dhp = _ceil128(d), _ceil128(dh)
    if dp == d and dhp == dh:
        return fused_bn_ffn_spmd(s, mu, inv, gamma, beta, w1, b1, w2, b2,
                                 seed, rate, act, drop2)
    p = lambda t: _pad_last(t, dp)          # noqa: E731
    w1p = jnp.pad(w1, ((0, dp - d), (0, dhp - dh)))
    w2p = jnp.pad(w2, ((0, dhp - dh), (0, dp - d)))
    out = fused_bn_ffn_spmd(p(s), p(mu), p(inv), p(gamma), p(beta),
                            w1p, _pad_last(b1, dhp), w2p, p(b2),
                            seed, rate, act, drop2)
    return out[..., :d]


# --------------------------------------------------------------------------
# fused_ln_ffn: out = h0 + drop2(W2·drop1(act(W1·LN(h0)+b1)) + b2)
# Graphormer's pre-LN MLP block (reference graphormer_layer.py:30-38) in one
# launch. LayerNorm is per-ROW, so the whole block fuses with no
# cross-batch statistics barrier; two independent dropout rates
# (mlp_dropout inner, dropout outer).
# --------------------------------------------------------------------------

def _ln(h0, ga, be, eps, dt):
    """LayerNorm over the first ``dt`` lanes (rows arrive zero-padded to the
    lane width; statistics divide by the TRUE width so padding is exact)."""
    lanes = (jax.lax.broadcasted_iota(jnp.int32, h0.shape, 1)
             < dt).astype(jnp.float32)
    mu = jnp.sum(h0 * lanes, axis=1, keepdims=True) / dt
    xc = (h0 - mu) * lanes
    inv = jax.lax.rsqrt(jnp.sum(xc * xc, axis=1, keepdims=True) / dt + eps)
    yh = xc * inv
    return yh, inv, lanes, yh * ga + be


def _lf_fwd_kernel(seed_ref, h0_ref, ga_ref, be_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, o_ref, *, r1, r2, act, eps, dt):
    f32 = jnp.float32
    h0 = h0_ref[:].astype(f32)
    _, _, _, h = _ln(h0, ga_ref[0].astype(f32), be_ref[0].astype(f32),
                     eps, dt)
    a1 = _dot(h, w1_ref[:].astype(f32)) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if r1 > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, r1)
        zf = zf * k1 * s1
    a2 = _dot(zf, w2_ref[:].astype(f32)) + b2_ref[0].astype(f32)
    if r2 > 0.0:
        k2, s2 = _keep(seed_ref, 2, a2.shape, r2)
        a2 = a2 * k2 * s2
    o_ref[:] = (h0 + a2).astype(o_ref.dtype)


def _lf_bwd_kernel(seed_ref, h0_ref, ga_ref, be_ref, w1_ref, b1_ref,
                   w2_ref, g_ref,
                   dh0_ref, dga_ref, dbe_ref, dw1_ref, db1_ref,
                   dw2_ref, db2_ref, *, r1, r2, act, eps, dt):
    f32 = jnp.float32
    h0 = h0_ref[:].astype(f32)
    ga = ga_ref[0].astype(f32)
    w1 = w1_ref[:].astype(f32)
    w2 = w2_ref[:].astype(f32)
    yh, inv, lanes, h = _ln(h0, ga, be_ref[0].astype(f32), eps, dt)
    a1 = _dot(h, w1) + b1_ref[0].astype(f32)
    zf = _act_f(act, a1)
    if r1 > 0.0:
        k1, s1 = _keep(seed_ref, 1, zf.shape, r1)
        u = zf * k1 * s1
    else:
        u = zf
    if r2 > 0.0:
        k2, s2 = _keep(seed_ref, 2, (zf.shape[0], w2.shape[1]), r2)

    g = g_ref[:].astype(f32)
    da2 = g * k2 * s2 if r2 > 0.0 else g
    du = _dot_nt(da2, w2)
    dzf = du * k1 * s1 if r1 > 0.0 else du
    da1 = dzf * _act_df(act, a1)
    dh = _dot_nt(da1, w1)              # cotangent of LN OUTPUT (no residual)

    dga = jnp.sum(dh * yh, axis=0, keepdims=True)
    dbe = jnp.sum(dh * lanes, axis=0, keepdims=True)
    dyh = dh * ga
    # LayerNorm backward (per row, over the dt true lanes):
    # inv·(dyh − mean(dyh) − yh·mean(dyh·yh))
    m1 = jnp.sum(dyh * lanes, axis=1, keepdims=True) / dt
    m2 = jnp.sum(dyh * yh, axis=1, keepdims=True) / dt
    dh0 = g + inv * (dyh - lanes * m1 - yh * m2)
    dh0_ref[:] = dh0.astype(dh0_ref.dtype)
    dw1 = _dot_tn(h, da1)
    db1 = jnp.sum(da1, axis=0, keepdims=True)
    dw2 = _dot_tn(u, da2)
    db2 = jnp.sum(da2, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dga_ref[:] = dga
        dbe_ref[:] = dbe
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dga_ref[:] += dga
        dbe_ref[:] += dbe
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_ln_ffn(h0, ga, be, w1, b1, w2, b2, seed,
                 r1: float, r2: float, act: str, eps: float = 1e-6,
                 dt: int = 0):
    """h0: (R, dp); ga/be: (dp,) LayerNorm params; FFN weights as
    fused_ffn. ``dt``: the TRUE feature width (0 → dp) — rows may arrive
    zero-padded to the lane width; LN statistics divide by dt so padding
    is exact. Returns h0 + drop_r2(W2·drop_r1(act(W1·LN(h0)+b1)) + b2)."""
    return _lf_fwd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act, eps, dt)


def _lf_fwd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act, eps, dt):
    R, d = h0.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    kern = functools.partial(_lf_fwd_kernel, r1=r1, r2=r2, act=act, eps=eps,
                             dt=dt or d)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1) + _vec_specs(d, 2) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), h0.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), h0, ga.reshape(1, d), be.reshape(1, d),
      w1, b1.reshape(1, dh), w2, b2.reshape(1, d))


def _lf_vjp_fwd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act, eps, dt):
    y = _lf_fwd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act, eps, dt)
    return y, (h0, ga, be, w1, b1, w2, b2, seed)


def _lf_vjp_bwd(r1, r2, act, eps, dt, res, g):
    h0, ga, be, w1, b1, w2, b2, seed = res
    R, d = h0.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    f32 = jnp.float32
    kern = functools.partial(_lf_bwd_kernel, r1=r1, r2=r2, act=act, eps=eps,
                             dt=dt or d)
    row = pl.BlockSpec((RB, d), lambda i, s: (i, 0))
    (dh0, dga, dbe, dw1, db1, dw2, db2) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1) + _vec_specs(d, 2) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
            ] + _row_specs(RB, d, 1),
            out_specs=[row] + _vec_specs(d, 2) + [
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, d), h0.dtype)]
        + [jax.ShapeDtypeStruct((1, d), f32)] * 2
        + [jax.ShapeDtypeStruct((d, dh), f32),
           jax.ShapeDtypeStruct((1, dh), f32),
           jax.ShapeDtypeStruct((dh, d), f32),
           jax.ShapeDtypeStruct((1, d), f32)],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), h0, ga.reshape(1, d), be.reshape(1, d),
      w1, b1.reshape(1, dh), w2, g)
    return (dh0,
            dga.reshape(-1).astype(ga.dtype),
            dbe.reshape(-1).astype(be.dtype),
            dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_ln_ffn.defvjp(_lf_vjp_fwd, _lf_vjp_bwd)


def fused_ln_ffn_spmd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act,
                      eps=1e-6, dt=0):
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(h0.shape[0])
    if mesh is None:
        return fused_ln_ffn(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act,
                            eps, dt)
    P = jax.sharding.PartitionSpec
    row = P("data", None)
    rep = P(None)

    def body(h0, ga, be, w1, b1, w2, b2, seed):
        return fused_ln_ffn(h0, ga, be, w1, b1, w2, b2,
                            fold_shard_seed(seed), r1, r2, act, eps, dt)

    return dp_shard_map(
        body, mesh, in_specs=(row, rep, rep, rep, rep, rep, rep, P()),
        out_specs=row,
    )(h0, ga, be, w1, b1, w2, b2, jnp.asarray(seed, jnp.int32))


def fused_ln_ffn_padded(h0, ga, be, w1, b1, w2, b2, seed, r1, r2, act,
                        eps=1e-6):
    """Zero-pad non-lane-aligned widths; LN statistics stay EXACT because
    the kernel divides by the true width dt (masked-lane stats)."""
    d = h0.shape[-1]
    dh = w1.shape[1]
    dp, dhp = _ceil128(d), _ceil128(dh)
    if dp == d and dhp == dh:
        return fused_ln_ffn_spmd(h0, ga, be, w1, b1, w2, b2, seed, r1, r2,
                                 act, eps, 0)
    p = lambda t: _pad_last(t, dp)          # noqa: E731
    w1p = jnp.pad(w1, ((0, dp - d), (0, dhp - dh)))
    w2p = jnp.pad(w2, ((0, dhp - dh), (0, dp - d)))
    out = fused_ln_ffn_spmd(p(h0), p(ga), p(be), w1p, _pad_last(b1, dhp),
                            w2p, p(b2), seed, r1, r2, act, eps, d)
    return out[..., :d]


def ln_ffn_eligible(R: int, d: int, act: str) -> bool:
    """Graphormer pre-LN MLP fusion gate: the shared tail envelope (padding
    is exact — masked-lane LN statistics). GGPS_FUSED_COMBINE=0 kills it
    with the rest of the family."""
    import os

    if os.environ.get("GGPS_FUSED_COMBINE") == "0":
        return False
    return tail_eligible(R, d, act)


def combine_eligible(R: int, d: int, act: str) -> bool:
    """Gate for the combine kernel: shared tail envelope + the FFN row
    block must exist at the padded width. GGPS_FUSED_COMBINE=0 kills it
    for A/B runs."""
    import os

    if os.environ.get("GGPS_FUSED_COMBINE") == "0":
        return False
    if not tail_eligible(R, d, act):
        return False
    from .spmd import dp_mesh
    mesh = dp_mesh(R)
    r_local = R // mesh.shape["data"] if mesh is not None else R
    dp = _ceil128(d)
    return _ffn_block(r_local, dp, _ceil128(2 * d)) is not None
