"""Fused GPS attention: QKV projection → masked MHA → output projection in
ONE Pallas kernel (fwd + custom-VJP bwd).

Replaces the hot path of the reference's ``torch.nn.MultiheadAttention`` call
(/root/reference/graphgps/layer/gps_layer.py:105,199-210) for the SMALL-graph
recipe shapes (ZINC N≤36, PCQM4Mv2 N≤32/52 — the reference's headline
benchmarks), where the XLA path is bandwidth-bound: per layer it round-trips
q/k/v/attn/out through HBM with layout-transpose copies at every step
(profiled round 4: 396 us/layer fwd+bwd at the pcqm-deep shape, ~6.3 ms of a
24 ms step). Here every intermediate lives in VMEM; HBM traffic is one read
of x, one write of out, and the (grid-resident) weights.

Head packing — the trick that makes tiny head dims MXU-friendly
----------------------------------------------------------------
At Dh=16..32 a per-head ``q @ k^T`` pads the 128-lane contraction 4-8x and
the output tile up to 16x. Instead, for each graph build the vertically
tiled, block-masked key matrix

    Kblk[(h,n), (h',dh)] = K[n, h', dh] * (h == h')       # (H*N, d)

so ONE dense (N, d) x (H*N, d) MXU contraction (over the full d = H*Dh
lanes) computes every head's logits at once:

    logits[n, (h,m)] = sum_c Q[n, c] Kblk[(h,m), c] = <Q_h[n], K_h[m]>.

The zero blocks waste (H-1)/H of the FLOPs — irrelevant at 9% MFU — and the
same tiling merges heads for free on the value side:

    Vblk[(h,n), (h',dh)] = V[n, h', dh] * (h == h')
    out = P @ Vblk                                        # (N, d), heads merged

Dropout uses the on-chip PRNG (pltpu.prng_*), seeded per (kernel seed, grid
step): the backward kernel reseeds identically and regenerates the exact keep
mask, so nothing but x and the weights is ever read back between fwd and bwd.

Numerics: dots accumulate in f32 (preferred_element_type); softmax in f32.
Matmul passes follow the ambient precision like the XLA path does, so fused
vs dense agree to the usual bf16-pass tolerance (tests/test_fused_attn.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# Matmul input dtype inside the kernel. On TPU, bf16 matches the XLA path's
# single-pass-bf16 DEFAULT matmul precision (measured identical speed here —
# Mosaic's f32 dots were not the bottleneck — but keeps fused vs unfused in
# the same rounding class). In interpret mode (CPU tests) dots stay f32 so
# parity tests hold tight tolerances. GGPS_FUSED_DOT_F32=1 forces exact f32.
import os as _os


def _dot_dt():
    if _os.environ.get("GGPS_FUSED_DOT_F32") == "1":
        return jnp.float32
    return jnp.float32 if _interpret() else jnp.bfloat16


def _dot_nt(a, b):
    """(M, K) x (N, K) → (M, N): contraction over axis 1 of both (b is used
    transposed without materializing the transpose)."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """(K, M) x (K, N) → (M, N): contraction over axis 0 of both."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _m1t(d: int, H: int, N: int):
    """(H*N, d) block-diag head mask ([(h,n),(h',dh)] == (h == h')) in the
    DOT dtype (bf16 on TPU — the packed operands feed bf16 matmul passes
    anyway, and halving them cuts VMEM pressure; f32 in interpret mode)."""
    Dh = d // H
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H * N, d), 0) // N
    colh = jax.lax.broadcasted_iota(jnp.int32, (H * N, d), 1) // Dh
    return (rowh == colh).astype(_dot_dt())


def _vtile(t, H):
    """(N, d) → (H*N, d): vertical tile [t; t; ...] H times."""
    N, d = t.shape
    return jnp.broadcast_to(t[None], (H, N, d)).reshape(H * N, d)


def _bdot(a, b, ca, cb):
    """Batched (over axis 0) contraction of a's axis ``ca`` with b's ``cb``,
    f32 accumulation, bf16 (or f32, see _DOT_DT) operand passes."""
    return jax.lax.dot_general(a.astype(_dot_dt()), b.astype(_dot_dt()),
                               (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _blk(t3, m1t, G, H):
    """(G, N, d) → (G, H*N, d): vertical head tile masked block-diagonal,
    in m1t's (dot) dtype."""
    _, N, d = t3.shape
    t3 = t3.astype(m1t.dtype)
    return (jnp.broadcast_to(t3[:, None], (G, H, N, d)).reshape(G, H * N, d)
            * m1t[None])


def _attn_fwd_all(q3, k3, v3, maskg, m1t, G, H, scale, keep, inv_keep):
    """All G graphs, all heads, head-packed with heads on the SUBLANE axis.

    q3,k3,v3 (G, N, d); maskg (G, N) 0/1; m1t (H*N, d) block-diag head mask.
    Logits live as (G, H*N, N): row (h,n), column m — a plain row softmax
    (no lane-splitting reshape, which Mosaic cannot compile), and ONE batched
    (G, H*N, d) x (G, N, d) MXU contraction computes all heads of all
    graphs:

        logits[g, (h,n), m] = sum_c Q[g,n,c]·1[head(c)=h] · K[g,m,c]
                            = <Q_h[n], K_h[m]> within graph g.

    keep: optional (G, H*N, N) dropout keep mask.
    Returns (out (G, N, d) f32 heads-merged, P (G, H*N, N) f32 pre-dropout).
    """
    _, N, d = q3.shape
    qblk = _blk(q3, m1t, G, H)                                 # (G, H*N, d)
    logits = _bdot(qblk, k3, 2, 2) * scale                     # (G, H*N, N)
    logits = jnp.where(maskg[:, None, :] > 0, logits, NEG_INF)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - mx)
    P = ex / jnp.sum(ex, axis=-1, keepdims=True)
    Pd = P if keep is None else P * keep * inv_keep
    out_blk = _bdot(Pd, v3, 2, 1)                              # (G, H*N, d)
    out = jnp.sum((out_blk * m1t[None].astype(out_blk.dtype))
                  .reshape(G, H, N, d), axis=1)
    return out, P


def _keep_mask(seed_ref, shape, rate):
    """On-chip PRNG keep mask on the u8 grid (ops/mha.keep_mask_u8
    semantics): returns (keep f32 0/1, inv_keep_prob)."""
    t = min(max(int(round(rate * 256)), 1), 255)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(shape)
    keep = ((bits.astype(jnp.uint32) & jnp.uint32(255))
            >= jnp.uint32(t)).astype(jnp.float32)
    return keep, 1.0 / (1.0 - t / 256.0)


def _fwd_kernel(seed_ref, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                o_ref, *, G, H, scale, rate):
    N, d = x_ref.shape[1], x_ref.shape[2]
    f32 = jnp.float32
    x2 = x_ref[:].reshape(G * N, d).astype(f32)
    qkv = _dot(x2, wqkv_ref[:].astype(f32)) + bqkv_ref[0].astype(f32)
    m1t = _m1t(d, H, N)
    keep, inv_keep = (None, 1.0)
    if rate > 0.0:
        keep, inv_keep = _keep_mask(seed_ref, (G * H * N, N), rate)
        keep = keep.reshape(G, H * N, N)
    q3 = qkv[:, :d].reshape(G, N, d)
    k3 = qkv[:, d:2 * d].reshape(G, N, d)
    v3 = qkv[:, 2 * d:].reshape(G, N, d)
    maskg = mask_ref[pl.ds(pl.program_id(0) * G, G), :]        # (G, N)
    out, _ = _attn_fwd_all(q3, k3, v3, maskg, m1t, G, H, scale,
                           keep, inv_keep)
    y = _dot(out.reshape(G * N, d), wo_ref[:].astype(f32)) \
        + bo_ref[0].astype(f32)
    o_ref[:] = y.reshape(G, N, d).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref,
                g_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, G, H, scale, rate):
    N, d = x_ref.shape[1], x_ref.shape[2]
    f32 = jnp.float32
    x2 = x_ref[:].reshape(G * N, d).astype(f32)
    gout = g_ref[:].reshape(G * N, d).astype(f32)
    wqkv = wqkv_ref[:].astype(f32)
    qkv = _dot(x2, wqkv) + bqkv_ref[0].astype(f32)
    m1t = _m1t(d, H, N)
    keep, inv_keep = (None, 1.0)
    if rate > 0.0:
        keep, inv_keep = _keep_mask(seed_ref, (G * H * N, N), rate)
        keep = keep.reshape(G, H * N, N)
    q3 = qkv[:, :d].reshape(G, N, d)
    k3 = qkv[:, d:2 * d].reshape(G, N, d)
    v3 = qkv[:, 2 * d:].reshape(G, N, d)
    maskg = mask_ref[pl.ds(pl.program_id(0) * G, G), :]        # (G, N)

    # out = O @ Wo + bo  →  dO = g @ Wo^T
    do_merged = _dot_nt(gout, wo_ref[:].astype(f32))           # (G*N, d)
    o3, P = _attn_fwd_all(q3, k3, v3, maskg, m1t, G, H, scale,
                          keep, inv_keep)
    do3 = do_merged.reshape(G, N, d)
    dout_blk = _blk(do3, m1t, G, H)                            # (G, H*N, d)
    dPd = _bdot(dout_blk, v3, 2, 2)                            # (G, H*N, N)
    Pd = P if keep is None else P * keep * inv_keep
    # dV[g,m,(h,dh)] = Σ_n Pd[g,(h,n),m]·dO[g,n,(h,dh)] — the head mask in
    # dout_blk keeps exactly the matching-head terms
    dv = _bdot(Pd, dout_blk, 1, 1)                             # (G, N, d)
    dP = dPd if keep is None else dPd * keep * inv_keep
    dS = P * (dP - jnp.sum(dP * P, axis=-1, keepdims=True))    # (G, H*N, N)
    dqblk = _bdot(dS, k3, 2, 1)                                # (G, H*N, d)
    dq = jnp.sum((dqblk * m1t[None].astype(dqblk.dtype))
                 .reshape(G, H, N, d), axis=1) * scale
    qblk = _blk(q3, m1t, G, H)
    dk = _bdot(dS, qblk, 1, 1) * scale                         # (G, N, d)
    o_merged = o3.reshape(G * N, d)
    dqkv = jnp.concatenate(
        [dq.reshape(G * N, d), dk.reshape(G * N, d),
         dv.reshape(G * N, d)], axis=1)                        # (G*N, 3d)

    dx_ref[:] = _dot_nt(dqkv, wqkv).reshape(G, N, d).astype(dx_ref.dtype)
    dwqkv = _dot_tn(x2, dqkv)                                  # (d, 3d)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dwo = _dot_tn(o_merged, gout)                              # (d, d)
    dbo = jnp.sum(gout, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[:] = dbqkv
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwo_ref[:] += dwo
        dbo_ref[:] += dbo


def _pick_block(B: int, N: int, d: int) -> int:
    """Graphs per grid step: keep the block's VMEM footprint a few MB.
    GGPS_FUSED_G overrides (A/B + compile-time bisection)."""
    import os
    env = os.environ.get("GGPS_FUSED_G")
    if env:
        G = min(int(env), B)
    else:
        per_graph = N * d * 4 * 8  # x/q/k/v/o/dq... f32 residents
        G = max(1, min(B, (2 << 20) // max(per_graph, 1)))
    while B % G:
        G -= 1
    return G


def _params():
    """Raise the scoped-VMEM compiler limit (default 16 MB) — the chip's
    physical VMEM accommodates larger blocks (measured: the wide-attention
    kernel runs 17+ MB working sets); lets _pick_block choose bigger G."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, seed,
                        num_heads: int, dropout_rate: float = 0.0):
    """x: (B, N, d); kmask: (B, N) f32 1/0; wqkv: (d, 3d); bqkv: (3d,);
    wo: (d, d); bo: (d,); seed: () int32 (ignored when dropout_rate == 0).

    Returns (B, N, d): outProj(MHA(qkvProj(x))) with key-padding masking and
    attention dropout, numerically matching the unfused path (the dropout
    bit pattern excepted — the kernel draws its own on-chip PRNG bits).
    """
    return _fwd_call(x, kmask, wqkv, bqkv, wo, bo, seed, num_heads,
                     dropout_rate)


def _common_in_specs(B, G, N, d):
    return [
        pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0)),   # x
        pl.BlockSpec((B, N), lambda i, s: (0, 0)),         # mask (full,
        # resident: a (G, N) block would violate the (8,128) min tile)
        pl.BlockSpec((d, 3 * d), lambda i, s: (0, 0)),     # wqkv (grid-resident)
        pl.BlockSpec((1, 3 * d), lambda i, s: (0, 0)),     # bqkv
        pl.BlockSpec((d, d), lambda i, s: (0, 0)),         # wo
    ]


def _fwd_call(x, kmask, wqkv, bqkv, wo, bo, seed, H, rate):
    B, N, d = x.shape
    G = _pick_block(B, N, d)
    scale = 1.0 / float(d // H) ** 0.5
    kern = functools.partial(_fwd_kernel, G=G, H=H, scale=scale, rate=rate)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=_common_in_specs(B, G, N, d) + [
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),  # bo
            ],
            out_specs=pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, d), x.dtype),
        interpret=_interpret(),
        compiler_params=_params(),
    )(jnp.asarray([seed], jnp.int32).reshape(1), x,
      kmask.astype(x.dtype), wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1))


def _vjp_fwd(x, kmask, wqkv, bqkv, wo, bo, seed, H, rate):
    y = _fwd_call(x, kmask, wqkv, bqkv, wo, bo, seed, H, rate)
    return y, (x, kmask, wqkv, bqkv, wo, bo, seed)


def _vjp_bwd(H, rate, res, g):
    x, kmask, wqkv, bqkv, wo, bo, seed = res
    B, N, d = x.shape
    G = _pick_block(B, N, d)
    scale = 1.0 / float(d // H) ** 0.5
    kern = functools.partial(_bwd_kernel, G=G, H=H, scale=scale, rate=rate)
    f32 = jnp.float32
    dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=_common_in_specs(B, G, N, d) + [
                pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0)),  # g
            ],
            out_specs=[
                pl.BlockSpec((G, N, d), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((d, 3 * d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, 3 * d), lambda i, s: (0, 0)),
                pl.BlockSpec((d, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
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
    )(jnp.asarray([seed], jnp.int32).reshape(1), x, kmask.astype(x.dtype),
      wqkv, bqkv.reshape(1, -1), wo, g)
    return (dx, _f0(kmask) if kmask.dtype == jnp.bool_
            else jnp.zeros_like(kmask),
            dwqkv.astype(wqkv.dtype), dbqkv.reshape(-1).astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo.reshape(-1).astype(bo.dtype),
            _f0(seed) if jnp.issubdtype(seed.dtype, jnp.integer) else None)


fused_gps_attention.defvjp(_vjp_fwd, _vjp_bwd)


def pad_heads(wqkv3, bqkv2, wo, bo, H: int):
    """Per-HEAD Dh padding for the packed attention kernels: pads each
    head's Dh slot inside the packed d axis to Dhp = ceil128(d)/H (so the
    packed width is lane-aligned and the head-mask layout stays exact),
    zero-extends input rows, and returns
    (wqkv (dp,3dp), bqkv (3dp,), wo (dp,dp), bo (dp,), dp) or None when
    ceil128(d) is not divisible by H. Exact: padded q/k lanes contribute 0
    to logits, padded v lanes produce 0 outputs, padded wo rows are zero.
    Callers pass the REAL 1/√Dh as the kernel's scale."""
    d = wo.shape[0]
    Dh = d // H
    dp = -(-d // 128) * 128
    if dp == d:
        return (wqkv3.reshape(d, 3 * d), bqkv2.reshape(3 * d), wo,
                bo, d)
    if dp % H:
        return None
    Dhp = dp // H

    def scat_cols(w):  # (rows, d) → (rows, dp), per-head zero-extension
        r = w.reshape(w.shape[0], H, Dh)
        return jnp.pad(r, ((0, 0), (0, 0), (0, Dhp - Dh))).reshape(
            w.shape[0], dp)

    parts = [scat_cols(wqkv3[:, i, :]) for i in range(3)]
    wqkv_p = jnp.pad(jnp.concatenate(parts, axis=1),
                     ((0, dp - d), (0, 0)))                 # (dp, 3dp)
    bqkv_p = jnp.concatenate([scat_cols(bqkv2[i].reshape(1, d))[0]
                              for i in range(3)])           # (3dp,)
    wo_p = jnp.pad(scat_cols(wo.T).T, ((0, 0), (0, dp - d)))  # (dp, dp)
    bo_p = jnp.pad(bo, (0, dp - d))
    return wqkv_p, bqkv_p, wo_p, bo_p, dp


def fused_gps_attention_spmd(x, kmask, wqkv, bqkv, wo, bo, seed,
                             num_heads: int, dropout_rate: float = 0.0):
    """``fused_gps_attention`` under an ambient mesh: plain call
    single-device; shard_map over 'data' on a pure-DP mesh (graphs sharded,
    weights replicated — their grads psum via the shard_map transpose;
    per-shard dropout streams decorrelated)."""
    import jax.numpy as jnp

    from .spmd import dp_mesh, dp_shard_map, fold_shard_seed

    mesh = dp_mesh(x.shape[0])
    if mesh is None:
        return fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, seed,
                                   num_heads, dropout_rate)
    P = jax.sharding.PartitionSpec
    b3 = P("data", None, None)
    b2 = P("data", None)
    rep = P(None)

    def body(x, kmask, wqkv, bqkv, wo, bo, seed):
        return fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo,
                                   fold_shard_seed(seed), num_heads,
                                   dropout_rate)

    return dp_shard_map(body, mesh,
                        in_specs=(b3, b2, rep, rep, rep, rep, P()),
                        out_specs=b3)(x, kmask, wqkv, bqkv, wo, bo,
                                      jnp.asarray(seed, jnp.int32))


def fused_eligible(N: int, d: int, H: int, *, bias, return_attn: bool) -> bool:
    """Shape/feature envelope of the fused kernel: small sequences (the
    (N, H*N) logits block must sit in VMEM), merged head dims lane-aligned,
    no additive bias, no attention-weight capture."""
    return (bias is None and not return_attn and N <= 128
            and d % H == 0 and N % 8 == 0 and d % 128 == 0)


# 'auto' dispatch gate: on for envelopes where the round-4 device-clock A/B
# showed the kernel beating the XLA dense path (tools/ab_fused_attn.py:
# pcqm shape B256·N32·d256 — 1.89x, 2.04x with attn dropout; B32·N40·d128 a
# wash → size-gated). GGPS_FUSED_AUTO=0/1 forces it off/on for A/B runs.
def fused_auto_wins(B: int, N: int, d: int) -> bool:
    import os
    env = os.environ.get("GGPS_FUSED_AUTO")
    if env is not None:
        return env == "1"
    return B * N >= 8192
