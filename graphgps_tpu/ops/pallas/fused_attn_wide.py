"""Fused GPS attention for WIDE graphs (N up to ~768): head-packed flash.

``fused_gps_attn`` holds the full (G, H·N, N) logits block in VMEM — fine at
molecule scale (N≤128), impossible at superpixel scale (N=512 → 8 MB per
graph just for logits, ×P ×keep). The XLA fallbacks both hurt there: dense
materializes the (B, H, N, N) scores in HBM (268 MB at the VOC recipe), and
chunked online-softmax runs per-head einsums whose Dh=12 contraction wastes
~90% of the MXU's 128 lanes.

This kernel keeps the v1 head-packing (ONE d-lane contraction computes every
head) and adds an inner ``fori_loop`` over KEY chunks with the online-softmax
recurrence, so VMEM holds only (H·N, Ck) logits tiles. One graph per grid
step; the key-padding mask comes from per-graph REAL-NODE COUNTS via scalar
prefetch (arena masks are prefix-true by construction) — no (B, N) resident
array, no sub-8 sublane slicing.

Head-dim padding is the caller's job (ops/pallas/fused_gps_attn.pad_heads):
Dh pads per-head inside the packed d axis (12→16 at VOC) with an explicit
``scale`` argument carrying the REAL 1/√Dh.

Attention dropout uses the on-chip PRNG seeded per (seed, graph, chunk); the
backward replays it exactly. Reference capability: torch MHA + attn_dropout
(/root/reference/graphgps/layer/gps_layer.py:105,199-210).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gps_attn import _dot, _dot_nt, _dot_tn, _m1t, _blk
from .fused_gatedgcn import _dot_dt, _interpret

import os as _os

NEG_INF = -1e30


def _pick_ck(N: int, d_padded: int, H: int):
    """Key-chunk width: the largest of 512/256/128 that divides N and keeps
    the packed working set under the VMEM cap. Round-5 device sweep at the
    VOC shape (N=512, dp=128, H=8): ck=256/512 beat 128 by ~8%
    (10.6 → 9.8 ms/step — fewer online-softmax iterations and correction
    passes); the old fixed ck=128 + 12 MB cap forced the slower point.
    GGPS_WIDE_CK / GGPS_WIDE_VMEM_MB override for A/B."""
    env = _os.environ.get("GGPS_WIDE_CK")
    cap = int(_os.environ.get("GGPS_WIDE_VMEM_MB", "20")) << 20
    for ck in ([int(env)] if env else [512, 256, 128]):
        if N % ck == 0 and (H * N) * (3 * d_padded + 2 * ck) * 4 <= cap:
            return ck
    return None


def _params():
    """Raise the scoped-VMEM compiler limit for these kernels: the N=512
    packed working set (~17-24 MB) exceeds the 16 MB default but fits the
    chip's physical VMEM comfortably."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _keep_bits(seed, shape, rate):
    t = min(max(int(round(rate * 256)), 1), 255)
    if not _interpret():
        pltpu.prng_seed(seed)
        bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    else:
        r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        x = (r * jnp.uint32(shape[1]) + c
             + seed.astype(jnp.uint32) * jnp.uint32(2654435761))
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7feb352d)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846ca68b)
        bits = x ^ (x >> 16)
    keep = ((bits & jnp.uint32(255)) >= jnp.uint32(t)).astype(jnp.float32)
    return keep, 1.0 / (1.0 - t / 256.0)


def _qkv(x_ref, wqkv_ref, bqkv_ref, N, d):
    f32 = jnp.float32
    x2 = x_ref[:].reshape(N, d).astype(f32)
    qkv = _dot(x2, wqkv_ref[:].astype(f32)) + bqkv_ref[0].astype(f32)
    return x2, qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]


def _fwd_kernel(scal_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                o_ref, *, N, d, H, scale, rate, ck):
    f32 = jnp.float32
    b = pl.program_id(0)
    seed = scal_ref[0]
    cnt = scal_ref[1 + b]                       # real nodes of this graph
    _, q, k, v = _qkv(x_ref, wqkv_ref, bqkv_ref, N, d)
    # packed tensors in the DOT dtype (bf16 on TPU): the matmuls cast to it
    # anyway, and halving qblk/m1t keeps the N=512 envelope inside VMEM
    dt = _dot_dt()
    m1t = _m1t(d, H, N).astype(dt)
    qblk = (_blk(q[None].astype(dt), m1t, 1, H)[0]
            * jnp.asarray(scale, dt))                     # (H·N, d)

    C = N // ck

    # STATIC unroll over key chunks (C ≤ 6 inside the eligibility envelope):
    # Mosaic lowers neither fori_loop-carried dynamic_slice of VALUES nor
    # pl.ds on values, and dead per-chunk tiles free as SSA values die.
    m = jnp.full((H * N, 1), NEG_INF, f32)
    l = jnp.zeros((H * N, 1), f32)
    acc = jnp.zeros((H * N, d), f32)
    for c in range(C):
        ks = k[c * ck:(c + 1) * ck, :]
        vs = v[c * ck:(c + 1) * ck, :]
        logits = _dot_nt(qblk, ks)                         # (H·N, ck)
        col = jax.lax.broadcasted_iota(jnp.int32, (H * N, ck), 1) + c * ck
        logits = jnp.where(col < cnt, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep, inv = _keep_bits(seed + b * 131071 + c, p.shape, rate)
            p = p * keep * inv
        acc = acc * corr + _dot(p, vs)                     # (H·N, d)
        m = m_new
    out_blk = acc / jnp.maximum(l, 1e-30)
    out = jnp.sum((out_blk * m1t.astype(f32)).reshape(H, N, d),
                  axis=0)                                  # heads merged
    y = _dot(out, wo_ref[:].astype(f32)) + bo_ref[0].astype(f32)
    o_ref[:] = y.reshape(1, N, d).astype(o_ref.dtype)


def _bwd_kernel(scal_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, g_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, N, d, H, scale, rate, ck):
    f32 = jnp.float32
    b = pl.program_id(0)
    seed = scal_ref[0]
    cnt = scal_ref[1 + b]
    x2, q, k, v = _qkv(x_ref, wqkv_ref, bqkv_ref, N, d)
    dt = _dot_dt()
    m1t = _m1t(d, H, N).astype(dt)
    qblk = (_blk(q[None].astype(dt), m1t, 1, H)[0]
            * jnp.asarray(scale, dt))
    gout = g_ref[:].reshape(N, d).astype(f32)
    wo = wo_ref[:].astype(f32)
    do_merged = _dot_nt(gout, wo)                          # (N, d)
    dout_blk = _blk(do_merged[None].astype(dt), m1t, 1, H)[0]  # (H·N, d)

    C = N // ck

    # pass 1: softmax statistics (m, l); static unroll (see fwd note)
    m = jnp.full((H * N, 1), NEG_INF, f32)
    l = jnp.zeros((H * N, 1), f32)
    for c in range(C):
        ks = k[c * ck:(c + 1) * ck, :]
        logits = _dot_nt(qblk, ks)
        col = jax.lax.broadcasted_iota(jnp.int32, (H * N, ck), 1) + c * ck
        logits = jnp.where(col < cnt, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=-1, keepdims=True)
        m = m_new
    linv = 1.0 / jnp.maximum(l, 1e-30)

    # pass 2: accumulate O and the dropped-P·dO row-dot D in one sweep
    o_blk = jnp.zeros((H * N, d), f32)
    D = jnp.zeros((H * N, 1), f32)
    for c in range(C):
        ks = k[c * ck:(c + 1) * ck, :]
        vs = v[c * ck:(c + 1) * ck, :]
        logits = _dot_nt(qblk, ks)
        col = jax.lax.broadcasted_iota(jnp.int32, (H * N, ck), 1) + c * ck
        logits = jnp.where(col < cnt, logits, NEG_INF)
        p = jnp.exp(logits - m) * linv                     # true P
        pd = p
        if rate > 0.0:
            keep, inv = _keep_bits(seed + b * 131071 + c, p.shape, rate)
            pd = p * keep * inv
        o_blk = o_blk + _dot(pd, vs)
        # dPd[r, c] = <dO_blk[r], V[c]> ; D = rowsum(dPd·Pd)
        dpd = _dot_nt(dout_blk, vs)                        # (H·N, ck)
        D = D + jnp.sum(dpd * pd, axis=-1, keepdims=True)

    # pass 3: dq (accumulated) and per-chunk dk/dv (each key chunk appears
    # only in its own chunk — the blocks concatenate, no accumulation)
    dqblk = jnp.zeros((H * N, d), f32)
    dk_blocks, dv_blocks = [], []
    for c in range(C):
        ks = k[c * ck:(c + 1) * ck, :]
        vs = v[c * ck:(c + 1) * ck, :]
        logits = _dot_nt(qblk, ks)
        col = jax.lax.broadcasted_iota(jnp.int32, (H * N, ck), 1) + c * ck
        logits = jnp.where(col < cnt, logits, NEG_INF)
        p = jnp.exp(logits - m) * linv
        dpd = _dot_nt(dout_blk, vs)
        if rate > 0.0:
            keep, inv = _keep_bits(seed + b * 131071 + c, p.shape, rate)
            pd = p * keep * inv
            dp = dpd * keep * inv
        else:
            pd, dp = p, dpd
        dS = p * dp - p * D
        # NOTE: with dropout, softmax bwd is dS = P∘(dP_dropped) − P·D where
        # D = Σ dPd∘Pd — the dropped path's exact gradient (matches the
        # unfused masked-dropout formulation in ops/mha.py).
        dqblk = dqblk + _dot(dS, ks)
        dk_blocks.append(_dot_tn(dS, qblk))
        dv_blocks.append(_dot_tn(pd, dout_blk))
    dk = jnp.concatenate(dk_blocks, axis=0)
    dv = jnp.concatenate(dv_blocks, axis=0)
    dq = jnp.sum((dqblk * m1t.astype(f32)).reshape(H, N, d),
                 axis=0) * scale
    o_merged = jnp.sum((o_blk * m1t.astype(f32)).reshape(H, N, d), axis=0)

    dqkv = jnp.concatenate([dq, dk, dv], axis=1)           # (N, 3d)
    wqkv = wqkv_ref[:].astype(f32)
    dx_ref[:] = _dot_nt(dqkv, wqkv).reshape(1, N, d).astype(dx_ref.dtype)
    dwqkv = _dot_tn(x2, dqkv)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dwo = _dot_tn(o_merged, gout)
    dbo = jnp.sum(gout, axis=0, keepdims=True)

    @pl.when(b == 0)
    def _init():
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[:] = dbqkv
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo

    @pl.when(b != 0)
    def _acc():
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwo_ref[:] += dwo
        dbo_ref[:] += dbo


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_wide_attention(x, counts, wqkv, bqkv, wo, bo, seed,
                         num_heads: int, scale: float,
                         dropout_rate: float = 0.0):
    """x: (B, N, d); counts: (B,) i32 real-node counts (prefix masks);
    wqkv: (d, 3d); wo: (d, d); seed: () int32; scale: the REAL 1/√Dh
    (callers pad Dh per head — ops/pallas/fused_gps_attn.pad_heads).
    Returns (B, N, d) = outProj(MHA(qkvProj(x)))."""
    return _fwd_call(x, counts, wqkv, bqkv, wo, bo, seed, num_heads, scale,
                     dropout_rate)


def _scal(seed, counts):
    return jnp.concatenate([jnp.asarray(seed, jnp.int32).reshape(1),
                            counts.astype(jnp.int32).reshape(-1)])


def _w_specs(d):
    return [
        pl.BlockSpec((d, 3 * d), lambda b, s: (0, 0)),
        pl.BlockSpec((1, 3 * d), lambda b, s: (0, 0)),
        pl.BlockSpec((d, d), lambda b, s: (0, 0)),
    ]


def _fwd_call(x, counts, wqkv, bqkv, wo, bo, seed, H, scale, rate):
    B, N, d = x.shape
    kern = functools.partial(_fwd_kernel, N=N, d=d, H=H, scale=scale,
                             rate=rate, ck=_pick_ck(N, d, H))
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N, d), lambda b, s: (b, 0, 0))]
            + _w_specs(d) + [pl.BlockSpec((1, d), lambda b, s: (0, 0))],
            out_specs=pl.BlockSpec((1, N, d), lambda b, s: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, d), x.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(_scal(seed, counts), x, wqkv, bqkv.reshape(1, -1), wo,
      bo.reshape(1, -1))


def _vjp_fwd(x, counts, wqkv, bqkv, wo, bo, seed, H, scale, rate):
    y = _fwd_call(x, counts, wqkv, bqkv, wo, bo, seed, H, scale, rate)
    return y, (x, counts, wqkv, bqkv, wo, bo, seed)


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def _vjp_bwd(H, scale, rate, res, g):
    x, counts, wqkv, bqkv, wo, bo, seed = res
    B, N, d = x.shape
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, N=N, d=d, H=H, scale=scale,
                             rate=rate, ck=_pick_ck(N, d, H))
    dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N, d), lambda b, s: (b, 0, 0))]
            + _w_specs(d)
            + [pl.BlockSpec((1, N, d), lambda b, s: (b, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, N, d), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((d, 3 * d), lambda b, s: (0, 0)),
                pl.BlockSpec((1, 3 * d), lambda b, s: (0, 0)),
                pl.BlockSpec((d, d), lambda b, s: (0, 0)),
                pl.BlockSpec((1, d), lambda b, s: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), x.dtype),
            jax.ShapeDtypeStruct((d, 3 * d), f32),
            jax.ShapeDtypeStruct((1, 3 * d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=_interpret(),
        compiler_params=_params(),
    )(_scal(seed, counts), x, wqkv, bqkv.reshape(1, -1), wo, g)
    return (dx, _f0(counts) if jnp.issubdtype(counts.dtype, jnp.integer)
            else jnp.zeros_like(counts),
            dwqkv.astype(wqkv.dtype), dbqkv.reshape(-1).astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo.reshape(-1).astype(bo.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_wide_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fused_wide_attention_spmd(x, counts, wqkv, bqkv, wo, bo, seed,
                              num_heads: int, scale: float,
                              dropout_rate: float = 0.0):
    """DP mesh wrapper (same rules as the other fused kernels)."""
    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x.shape[0])
    if mesh is None:
        return fused_wide_attention(x, counts, wqkv, bqkv, wo, bo, seed,
                                    num_heads, scale, dropout_rate)
    P = jax.sharding.PartitionSpec
    b3 = P("data", None, None)
    rep = P(None)

    def body(x, counts, wqkv, bqkv, wo, bo, seed):
        return fused_wide_attention(x, counts, wqkv, bqkv, wo, bo,
                                    fold_shard_seed(seed), num_heads,
                                    scale, dropout_rate)

    return dp_shard_map(
        body, mesh,
        in_specs=(b3, P("data"), rep, rep, rep, rep, P()),
        out_specs=b3,
    )(x, counts, wqkv, bqkv, wo, bo, jnp.asarray(seed, jnp.int32))


def wide_eligible(B: int, N: int, d_padded: int, H: int) -> bool:
    """128 < N ≤ 768 (above the v1 envelope, VMEM-bounded packed rows),
    lane-aligned packed width, chunk-divisible N, prefix masks assumed
    (device arenas/collation guarantee). DP-mesh rules via spmd."""
    from .spmd import dp_compatible

    if not dp_compatible(B):
        return False
    return (128 < N <= 768 and d_padded % 128 == 0
            and d_padded // H >= 8 and _pick_ck(N, d_padded, H) is not None)
