"""Fused layer-tail Pallas kernels: the elementwise chains around every GPS
block that XLA runs as separate RNG + select + add + normalize passes.

Three kernels (all custom-VJP, all operating on flat (R, d) row tensors,
grid over row blocks, dropout via the on-chip PRNG exactly like
fused_gps_attn.py — the backward reseeds and regenerates the keep mask, so
no mask tensor ever touches HBM):

- ``fused_pre_tail``: out = x_in + drop(act(γ·(v−μ)·inv + β)) — the
  norm-first tail of GatedGCN (reference gatedgcn_layer.py:74-87: BN → act
  → dropout → residual). μ/σ statistics stay OUTSIDE (MaskedBatchNorm
  stats_only mode keeps masked-stats + running-stats semantics bit-exact).
- ``fused_drop_add``: out = x_in + drop(v) — the dropout+residual step of
  the attention/local branches (reference gps_layer.py:138-160); the
  post-norm that follows stays in XLA (its statistics depend on this sum).
- ``fused_ffn``: out = h + drop2(W2·drop1(act(W1·h + b1)) + b2) — the whole
  FFN block (reference gps_layer.py:216-221) in one kernel: both matmuls,
  activation and both dropouts without materializing the (R, 2d)
  intermediate in HBM.

Numerics: dots accumulate f32; bf16 operand passes on TPU, f32 in interpret
mode (CPU tests) — the same policy as the other fused kernels. Activation
derivatives are closed-form (relu / exact-erf gelu, matching
models/common.py act_dict).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gatedgcn import _dot, _dot_nt, _dot_tn, _interpret, _params


_SQRT2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf, |err| < 1.5e-7 — Mosaic has no
    erf lowering; this keeps the exact-erf GELU (models/common.py act_dict)
    to well inside the bf16-pass tolerance the fused kernels already carry."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _act_f(name, z):
    if name == "relu":
        return jnp.maximum(z, 0.0)
    if name == "gelu":  # exact erf form (models/common.py act_dict)
        return 0.5 * z * (1.0 + _erf(z / _SQRT2))
    return z  # identity


def _act_df(name, z):
    if name == "relu":
        return (z > 0.0).astype(jnp.float32)
    if name == "gelu":
        phi = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
        return 0.5 * (1.0 + _erf(z / _SQRT2)) + z * phi
    return jnp.ones_like(z)


SUPPORTED_ACTS = ("relu", "gelu", "identity")


def _bits(seed, shape):
    """Random u32 bits. TPU: the on-chip PRNG (stateful; sequential draws
    differ). Interpret (CPU tests): a splitmix-style counter hash — same
    replayability, no pltpu dependency (prng_seed has no CPU lowering)."""
    if not _interpret():
        pltpu.prng_seed(seed)
        return pltpu.prng_random_bits(shape).astype(jnp.uint32)
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(shape[1]) + c
         + seed.astype(jnp.uint32) * jnp.uint32(2654435761))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846ca68b)
    return x ^ (x >> 16)


def _keep(seed_ref, offset, shape, rate):
    """PRNG keep mask (u8-grid semantics, ops/mha.keep_mask_u8): seeded per
    (run seed, grid step, site offset). Returns (keep f32 0/1, 1/keep_prob).
    Call sites must draw in the SAME order in fwd and bwd."""
    t = min(max(int(round(rate * 256)), 1), 255)
    seed = seed_ref[0] + pl.program_id(0) * 7 + offset
    bits = _bits(seed, shape)
    keep = ((bits & jnp.uint32(255)) >= jnp.uint32(t)).astype(jnp.float32)
    return keep, 1.0 / (1.0 - t / 256.0)


def tail_block(R: int, cap: int = 1024, d: int = 128):
    """Largest row-block ≤ cap dividing R (multiple of 8), or None. Wide
    rows shrink the cap so per-value VMEM stays ~512 KB (the d=384
    GPS-medium backward block overflowed the 16 MB scope at 1024 rows)."""
    cap = min(cap, max(8, (1 << 19) // (d * 4) // 8 * 8))
    best = None
    for rb in range(8, min(R, cap) + 1, 8):
        if R % rb == 0:
            best = rb
    if best is None and R <= cap and R % 8 == 0:
        best = R
    return best


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def _seed_arr(seed):
    return jnp.asarray(seed, jnp.int32).reshape(1)


# --------------------------------------------------------------------------
# fused_pre_tail: x_in + drop(act(bn_apply(v)))
# --------------------------------------------------------------------------

def _pre_fwd_kernel(seed_ref, x_ref, v_ref, mu_ref, iv_ref, ga_ref, be_ref,
                    o_ref, *, rate, act):
    f32 = jnp.float32
    v = v_ref[:].astype(f32)
    z = ((v - mu_ref[0].astype(f32)) * iv_ref[0].astype(f32)
         * ga_ref[0].astype(f32) + be_ref[0].astype(f32))
    a = _act_f(act, z)
    if rate > 0.0:
        keep, s = _keep(seed_ref, 0, a.shape, rate)
        a = a * keep * s
    o_ref[:] = (x_ref[:].astype(f32) + a).astype(o_ref.dtype)


def _pre_bwd_kernel(seed_ref, v_ref, mu_ref, iv_ref, ga_ref, be_ref, g_ref,
                    dv_ref, dmu_ref, div_ref, dga_ref, dbe_ref, *, rate, act):
    f32 = jnp.float32
    v = v_ref[:].astype(f32)
    mu = mu_ref[0].astype(f32)
    iv = iv_ref[0].astype(f32)
    ga = ga_ref[0].astype(f32)
    z = (v - mu) * iv * ga + be_ref[0].astype(f32)
    da = g_ref[:].astype(f32)
    if rate > 0.0:
        keep, s = _keep(seed_ref, 0, da.shape, rate)
        da = da * keep * s
    dz = da * _act_df(act, z)
    y = (v - mu) * iv
    dyhat = dz * ga
    dv = dyhat * iv
    dv_ref[:] = dv.astype(dv_ref.dtype)
    dbe = jnp.sum(dz, axis=0, keepdims=True)
    dga = jnp.sum(dz * y, axis=0, keepdims=True)
    dmu = -jnp.sum(dv, axis=0, keepdims=True)
    div = jnp.sum(dyhat * (v - mu), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dmu_ref[:] = dmu
        div_ref[:] = div
        dga_ref[:] = dga
        dbe_ref[:] = dbe

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dmu_ref[:] += dmu
        div_ref[:] += div
        dga_ref[:] += dga
        dbe_ref[:] += dbe


def _row_specs(RB, d, n):
    return [pl.BlockSpec((RB, d), lambda i, s: (i, 0)) for _ in range(n)]


def _vec_specs(d, n):
    return [pl.BlockSpec((1, d), lambda i, s: (0, 0)) for _ in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_pre_tail(x_in, v, mu, inv, gamma, beta, seed,
                   rate: float, act: str):
    """x_in, v: (R, d); mu/inv/gamma/beta: (d,); seed: () int32.
    Returns x_in + dropout(act(gamma*(v-mu)*inv + beta))."""
    return _pre_fwd(x_in, v, mu, inv, gamma, beta, seed, rate, act)


def _pre_fwd(x_in, v, mu, inv, gamma, beta, seed, rate, act):
    R, d = v.shape
    RB = tail_block(R, d=d)
    kern = functools.partial(_pre_fwd_kernel, rate=rate, act=act)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 2) + _vec_specs(d, 4),
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), x_in.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x_in, v, mu.reshape(1, d), inv.reshape(1, d),
      gamma.reshape(1, d), beta.reshape(1, d))


def _pre_vjp_fwd(x_in, v, mu, inv, gamma, beta, seed, rate, act):
    y = _pre_fwd(x_in, v, mu, inv, gamma, beta, seed, rate, act)
    return y, (v, mu, inv, gamma, beta, seed)


def _pre_vjp_bwd(rate, act, res, g):
    v, mu, inv, gamma, beta, seed = res
    R, d = v.shape
    RB = tail_block(R, d=d)
    f32 = jnp.float32
    kern = functools.partial(_pre_bwd_kernel, rate=rate, act=act)
    dv, dmu, dinv, dga, dbe = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1) + _vec_specs(d, 4)
            + _row_specs(RB, d, 1),
            out_specs=[pl.BlockSpec((RB, d), lambda i, s: (i, 0))]
            + _vec_specs(d, 4),
        ),
        out_shape=[jax.ShapeDtypeStruct((R, d), v.dtype)]
        + [jax.ShapeDtypeStruct((1, d), f32)] * 4,
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), v, mu.reshape(1, d), inv.reshape(1, d),
      gamma.reshape(1, d), beta.reshape(1, d), g)
    return (g, dv, dmu.reshape(-1).astype(mu.dtype),
            dinv.reshape(-1).astype(inv.dtype),
            dga.reshape(-1).astype(gamma.dtype),
            dbe.reshape(-1).astype(beta.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_pre_tail.defvjp(_pre_vjp_fwd, _pre_vjp_bwd)


# --------------------------------------------------------------------------
# fused_drop_add: x_in + drop(v)
# --------------------------------------------------------------------------

def _da_fwd_kernel(seed_ref, x_ref, v_ref, o_ref, *, rate):
    f32 = jnp.float32
    v = v_ref[:].astype(f32)
    keep, s = _keep(seed_ref, 0, v.shape, rate)
    o_ref[:] = (x_ref[:].astype(f32) + v * keep * s).astype(o_ref.dtype)


def _da_bwd_kernel(seed_ref, g_ref, dv_ref, *, rate):
    g = g_ref[:].astype(jnp.float32)
    keep, s = _keep(seed_ref, 0, g.shape, rate)
    dv_ref[:] = (g * keep * s).astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_drop_add(x_in, v, seed, rate: float):
    """x_in + dropout(v) with on-chip PRNG. rate must be > 0 (callers use a
    plain add when the rate is 0)."""
    return _da_fwd(x_in, v, seed, rate)


def _da_fwd(x_in, v, seed, rate):
    R, d = v.shape
    RB = tail_block(R, d=d)
    kern = functools.partial(_da_fwd_kernel, rate=rate)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 2),
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), x_in.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), x_in, v)


def _da_vjp_fwd(x_in, v, seed, rate):
    return _da_fwd(x_in, v, seed, rate), (seed,)


def _da_vjp_bwd(rate, res, g):
    (seed,) = res
    R, d = g.shape   # out/x_in/v all share shape; dv dtype follows g
    vdtype = g.dtype
    RB = tail_block(R, d=d)
    kern = functools.partial(_da_bwd_kernel, rate=rate)
    dv = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=_row_specs(RB, d, 1),
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), vdtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), g)
    return (g, dv,
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_drop_add.defvjp(_da_vjp_fwd, _da_vjp_bwd)


# --------------------------------------------------------------------------
# fused_ffn: h + drop2(W2 @ drop1(act(W1 @ h + b1)) + b2)
# --------------------------------------------------------------------------

def _ffn_fwd_kernel(seed_ref, h_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                    *, rate, act, drop2=True):
    f32 = jnp.float32
    h = h_ref[:].astype(f32)
    a1 = _dot(h, w1_ref[:].astype(f32)) + b1_ref[0].astype(f32)
    z = _act_f(act, a1)
    if rate > 0.0:
        k1, s1 = _keep(seed_ref, 0, z.shape, rate)
        z = z * k1 * s1
    a2 = _dot(z, w2_ref[:].astype(f32)) + b2_ref[0].astype(f32)
    if rate > 0.0 and drop2:
        k2, s2 = _keep(seed_ref, 1, a2.shape, rate)
        a2 = a2 * k2 * s2
    o_ref[:] = (h + a2).astype(o_ref.dtype)


def _ffn_bwd_kernel(seed_ref, h_ref, w1_ref, b1_ref, w2_ref, g_ref,
                    dh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    *, rate, act, drop2=True):
    f32 = jnp.float32
    h = h_ref[:].astype(f32)
    w1 = w1_ref[:].astype(f32)
    w2 = w2_ref[:].astype(f32)
    a1 = _dot(h, w1) + b1_ref[0].astype(f32)
    z = _act_f(act, a1)
    if rate > 0.0:
        # draw in the SAME order as the forward so the bits replay
        k1, s1 = _keep(seed_ref, 0, z.shape, rate)
        u = z * k1 * s1
        if drop2:
            k2, s2 = _keep(seed_ref, 1, (z.shape[0], w2.shape[1]), rate)
    else:
        u = z
    g = g_ref[:].astype(f32)
    da2 = g * k2 * s2 if (rate > 0.0 and drop2) else g
    du = _dot_nt(da2, w2)
    dz = du * k1 * s1 if rate > 0.0 else du
    da1 = dz * _act_df(act, a1)
    dh_ref[:] = (g + _dot_nt(da1, w1)).astype(dh_ref.dtype)
    dw1 = _dot_tn(h, da1)
    db1 = jnp.sum(da1, axis=0, keepdims=True)
    dw2 = _dot_tn(u, da2)
    db2 = jnp.sum(da2, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_ffn(h, w1, b1, w2, b2, seed, rate: float, act: str,
              drop2: bool = True):
    """h: (R, d); w1: (d, dh); b1: (dh,); w2: (dh, d); b2: (d,).
    The GPS FFN block with residual: h + drop2(W2·drop(act(W1·h+b1))+b2).
    ``drop2=False`` skips the post-projection dropout (SAN's FFN,
    san.py:143-147, applies only the inner one)."""
    return _ffn_fwd(h, w1, b1, w2, b2, seed, rate, act, drop2)


def _ffn_block(R, d, dh):
    """Row block: the (RB, dh) intermediate is the VMEM driver."""
    cap = max(8, min(2048, (4 << 20) // max(dh * 4 * 6, 1) // 8 * 8))
    return tail_block(R, cap, d=dh)


def _ffn_fwd(h, w1, b1, w2, b2, seed, rate, act, drop2=True):
    R, d = h.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    kern = functools.partial(_ffn_fwd_kernel, rate=rate, act=act,
                             drop2=drop2)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec((RB, d), lambda i, s: (i, 0)),     # h
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),     # w1
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),     # b1
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),     # w2
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),      # b2
            ],
            out_specs=pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, d), h.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), h, w1, b1.reshape(1, dh), w2, b2.reshape(1, d))


def _ffn_vjp_fwd(h, w1, b1, w2, b2, seed, rate, act, drop2=True):
    y = _ffn_fwd(h, w1, b1, w2, b2, seed, rate, act, drop2)
    return y, (h, w1, b1, w2, b2, seed)


def _ffn_vjp_bwd(rate, act, drop2, res, g):
    h, w1, b1, w2, b2, seed = res
    R, d = h.shape
    dh = w1.shape[1]
    RB = _ffn_block(R, d, dh)
    f32 = jnp.float32
    kern = functools.partial(_ffn_bwd_kernel, rate=rate, act=act,
                             drop2=drop2)
    dhout, dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec((RB, d), lambda i, s: (i, 0)),     # h
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),     # w1
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),     # b1
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),     # w2
                pl.BlockSpec((RB, d), lambda i, s: (i, 0)),     # g
            ],
            out_specs=[
                pl.BlockSpec((RB, d), lambda i, s: (i, 0)),
                pl.BlockSpec((d, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((1, dh), lambda i, s: (0, 0)),
                pl.BlockSpec((dh, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, d), h.dtype),
            jax.ShapeDtypeStruct((d, dh), f32),
            jax.ShapeDtypeStruct((1, dh), f32),
            jax.ShapeDtypeStruct((dh, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_seed_arr(seed), h, w1, b1.reshape(1, dh), w2, g)
    return (dhout, dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_ffn.defvjp(_ffn_vjp_fwd, _ffn_vjp_bwd)


def tail_eligible(R: int, d: int, act: str = "identity") -> bool:
    """Shared gate for the tail kernels: lane-aligned width, a valid row
    block, supported activation, and either no mesh or a pure-DP mesh that
    divides the rows (the shard_map wrappers below; tensor-parallel meshes
    keep the XLA paths, whose weights they shard)."""
    import os

    from .spmd import dp_compatible, dp_mesh

    if os.environ.get("GGPS_FUSED_TAIL") == "0":
        return False
    if not dp_compatible(R):
        return False
    mesh = dp_mesh(R)
    r_local = R // mesh.shape["data"] if mesh is not None else R
    # widths below 64 pay >2x lane padding — the fusion win inverts there
    return (d >= 64 and act in SUPPORTED_ACTS
            and tail_block(r_local) is not None)


def _ceil128(d: int) -> int:
    return -(-d // 128) * 128


def _pad_last(a, dp: int):
    d = a.shape[-1]
    if d == dp:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, dp - d)])


def fused_pre_tail_padded(x_in, v, mu, inv, gamma, beta, seed, rate, act):
    """Zero-pad a non-128-multiple width to the next lane multiple (padded
    lanes compute exact zeros through norm·act: γ=β=μ=inv=0) and slice."""
    d = v.shape[-1]
    dp = _ceil128(d)
    if dp == d:
        return fused_pre_tail_spmd(x_in, v, mu, inv, gamma, beta, seed,
                                   rate, act)
    out = fused_pre_tail_spmd(
        _pad_last(x_in, dp), _pad_last(v, dp), _pad_last(mu, dp),
        _pad_last(inv, dp), _pad_last(gamma, dp), _pad_last(beta, dp),
        seed, rate, act)
    return out[..., :d]


def fused_ffn_padded(h, w1, b1, w2, b2, seed, rate, act, drop2=True):
    d = h.shape[-1]
    dh = w1.shape[1]
    dp, dhp = _ceil128(d), _ceil128(dh)
    if dp == d and dhp == dh:
        return fused_ffn_spmd(h, w1, b1, w2, b2, seed, rate, act, drop2)
    w1p = jnp.pad(w1, ((0, dp - d), (0, dhp - dh)))
    w2p = jnp.pad(w2, ((0, dhp - dh), (0, dp - d)))
    out = fused_ffn_spmd(_pad_last(h, dp), w1p, _pad_last(b1, dhp), w2p,
                         _pad_last(b2, dp), seed, rate, act, drop2)
    return out[..., :d]


def fused_pre_tail_spmd(x_in, v, mu, inv, gamma, beta, seed, rate, act):
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x_in.shape[0])
    if mesh is None:
        return fused_pre_tail(x_in, v, mu, inv, gamma, beta, seed, rate, act)
    P = jax.sharding.PartitionSpec
    row = P("data", None)
    rep = P(None)

    def body(x_in, v, mu, inv, gamma, beta, seed):
        return fused_pre_tail(x_in, v, mu, inv, gamma, beta,
                              fold_shard_seed(seed), rate, act)

    return dp_shard_map(body, mesh,
                        in_specs=(row, row, rep, rep, rep, rep, P()),
                        out_specs=row)(x_in, v, mu, inv, gamma, beta,
                                       jnp.asarray(seed, jnp.int32))


def fused_drop_add_spmd(x_in, v, seed, rate):
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x_in.shape[0])
    if mesh is None:
        return fused_drop_add(x_in, v, seed, rate)
    P = jax.sharding.PartitionSpec
    row = P("data", None)

    def body(x_in, v, seed):
        return fused_drop_add(x_in, v, fold_shard_seed(seed), rate)

    return dp_shard_map(body, mesh, in_specs=(row, row, P()),
                        out_specs=row)(x_in, v,
                                       jnp.asarray(seed, jnp.int32))


def fused_ffn_spmd(h, w1, b1, w2, b2, seed, rate, act, drop2=True):
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(h.shape[0])
    if mesh is None:
        return fused_ffn(h, w1, b1, w2, b2, seed, rate, act, drop2)
    P = jax.sharding.PartitionSpec
    row = P("data", None)
    rep = P(None)

    def body(h, w1, b1, w2, b2, seed):
        return fused_ffn(h, w1, b1, w2, b2, fold_shard_seed(seed),
                         rate, act, drop2)

    return dp_shard_map(body, mesh,
                        in_specs=(row, rep, rep, rep, rep, P()),
                        out_specs=row)(h, w1, b1, w2, b2,
                                       jnp.asarray(seed, jnp.int32))
