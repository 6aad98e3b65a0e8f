"""Tiled sorted segment-sum — the long-graph aggregation kernel.

Replaces XLA's scatter-add for segment reductions ABOVE the blocked one-hot
cutoff (ops/segment._blocked_ok), where the per-graph block matmul would
waste ~max_nodes× MXU FLOPs and the reference's answer is torch_scatter's
CUDA segment kernels (/root/reference/graphgps/layer/gatedgcn_layer.py:8,
118-123). TPU has no fast scatter: XLA's sorted scatter-add serializes, and
round-3/4 profiles put ~28 ms of MalNet-5k's 72.6 ms step in these ops.

Design — scatter → block-aligned one-hot contractions:

1. Sort edges by segment id (one argsort per batch, CSE'd across every
   segment op in the step since the id vector is shared).
2. Partition the S output rows into blocks of NB; each block owns a
   contiguous slice of the sorted edges (CSR row pointers via searchsorted).
3. Re-tile the sorted edge rows so every W-row tile belongs to EXACTLY one
   output block (each block's edge slice zero-padded up to a multiple of W;
   ≥1 tile per block so empty blocks still initialize). The re-tiling is a
   single gather with arithmetic indices — no scatter.
4. Pallas grid over tiles. The OUTPUT BlockSpec's index map reads the
   tile→block table from scalar prefetch, so consecutive tiles of one block
   revisit the same (NB, d) output block while it stays resident in VMEM:
   per tile, one (W, NB) local one-hot and one MXU contraction
   oh^T @ rows accumulate the block — f32 operands end to end, so the
   result is exactly a sum of the input rows (matching the XLA scatter's
   f32 adds up to reassociation).

FLOPs: ~1.15·E·NB·d vs the blocked path's E·max_nodes·d — at MalNet
(NB=256, max_nodes≈80k global rows) a ~300× reduction, turned from serial
scatter into systolic matmul.

VJP: d(data)[i] = g[ids[i]] — one row gather on the ORIGINAL edge order;
the sort/re-tile never appears in the backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gatedgcn import _interpret, _params

import os as _os

W = int(_os.environ.get("GGPS_TILED_W", "1024"))
# Edge rows per tile — a multiple of 1024: the per-tile local-id table
# ships as a (T, 8, W//8) i32 array whose (1, 8, W//8) blocks satisfy
# Mosaic's (8, 128-divisible) last-two-dims rule.
assert W % 1024 == 0


def _pick_nb(S: int) -> int | None:
    """Output rows per block: largest divisor of S that is a multiple of 8
    and ≤ 512. Bigger NB costs FLOPs (∝ NB per edge) but shrinks the
    per-block tile floor (grid ≥ S/NB steps) — at MalNet-like degrees the
    floor dominates. GGPS_TILED_NB overrides for A/B tuning."""
    import os

    env = os.environ.get("GGPS_TILED_NB")
    cap = int(env) if env else 512
    best = None
    for nb in range(8, min(S, cap) + 1, 8):
        if S % nb == 0:
            best = nb
    return best


def _kernel(b_ref, first_ref, loc_ref, rows_ref, out_ref, *, NB, d):
    t = pl.program_id(0)
    f32 = jnp.float32
    loc2 = loc_ref[0]                                  # (8, W//8) i32
    C = W // 8
    io = jax.lax.broadcasted_iota(jnp.int32, (NB, C), 0)
    # eight 128-row one-hot contractions (no W-collapsing reshape — Mosaic
    # has no such relayout). The one-hot is built PRE-TRANSPOSED (NB, C) so
    # every dot is a plain NN-layout MXU matmul — a (C, NB) operand
    # contracted over its sublane axis would cost a Mosaic transpose per
    # chunk.
    part = jnp.zeros((NB, d), f32)
    for i in range(8):
        ohT = (io == loc2[i][None, :]).astype(f32)     # (NB, C); pads → 0
        rows = rows_ref[pl.ds(i * C, C), :].astype(f32)
        part += jax.lax.dot_general(ohT, rows, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)

    @pl.when(first_ref[t] == 1)
    def _init():
        out_ref[:] = part

    @pl.when(first_ref[t] != 1)
    def _acc():
        out_ref[:] += part


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tiled_segment_sum(data, segment_ids, num_segments: int):
    """data: (E, d) f32; segment_ids: (E,) i32 in [0, num_segments) (masked
    rows must be pre-zeroed — every id still contributes its row, zeros sum
    harmlessly). Returns (num_segments, d) sums. Caller gates via
    ``tiled_eligible``."""
    return _fwd(data, segment_ids, num_segments)


def _prep(segment_ids, S, NB):
    """Sorted order + tile tables (all XLA vector ops, no scatter).

    Returns (perm, src, loc, t2b, first) where src[t*W+j] indexes the
    SORTED edge order (E = pad row), loc is the block-local output row
    (NB = pad), t2b maps tile→output block (monotone), first flags each
    block's first tile."""
    E = segment_ids.shape[0]
    nblocks = S // NB
    T = -(-E // W) + nblocks          # ≥ Σ ceil(cnt_b / W), every block ≥ 1
    perm = jnp.argsort(segment_ids)
    ids_s = jnp.take(segment_ids, perm)
    # CSR block pointers over the sorted ids
    bounds = (jnp.arange(nblocks + 1, dtype=jnp.int32) * NB).astype(
        segment_ids.dtype)
    ptr = jnp.searchsorted(ids_s, bounds, side="left").astype(jnp.int32)
    cnt = ptr[1:] - ptr[:-1]                            # (nblocks,)
    tb = jnp.maximum(-(-cnt // W), 1)                   # tiles per block ≥ 1
    tstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(tb, dtype=jnp.int32)])
    # tile → block: monotone step function (dummy tail tiles → last block)
    t_ids = jnp.arange(T, dtype=jnp.int32)
    t2b = jnp.clip(jnp.searchsorted(tstart, t_ids, side="right") - 1,
                   0, nblocks - 1).astype(jnp.int32)
    first = (t_ids == tstart[t2b]).astype(jnp.int32)
    # padded slot (t, j) → sorted-edge index (E = pad row)
    j = jnp.arange(W, dtype=jnp.int32)
    k = (t_ids[:, None] - tstart[t2b][:, None]) * W + j[None, :]  # (T, W)
    real_tile = (t_ids < tstart[t2b] + tb[t2b])                   # (T,)
    valid = (k >= 0) & (k < cnt[t2b][:, None]) & real_tile[:, None]
    src = jnp.where(valid, ptr[:-1][t2b][:, None] + k, E).reshape(-1)
    ids_pad = jnp.concatenate([ids_s, jnp.zeros((1,), ids_s.dtype)])
    taken = jnp.take(ids_pad, src).reshape(T, W).astype(jnp.int32)
    loc = jnp.where(valid, taken - t2b[:, None] * NB, NB).astype(jnp.int32)
    return perm, src, loc, t2b, first, T, nblocks


def _fwd(data, segment_ids, S):
    E, d = data.shape
    NB = _pick_nb(S)
    assert NB is not None, "caller must gate on tiled_eligible"
    perm, src, loc, t2b, first, T, nblocks = _prep(segment_ids, S, NB)
    rows_s = jnp.take(data, perm, axis=0)
    rows_pad = jnp.concatenate([rows_s, jnp.zeros((1, d), data.dtype)])
    rows_t = jnp.take(rows_pad, src, axis=0)            # (T*W, d), tiled
    loc3 = loc.reshape(T, 8, W // 8)
    kern = functools.partial(_kernel, NB=NB, d=d)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                      # t2b, first
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 8, W // 8), lambda t, b, f: (t, 0, 0)),
                pl.BlockSpec((W, d), lambda t, b, f: (t, 0)),      # rows
            ],
            out_specs=pl.BlockSpec((NB, d), lambda t, b, f: (b[t], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((S, d), jnp.float32),
        interpret=_interpret(),
        compiler_params=_params(),
    )(t2b, first, loc3, rows_t.astype(jnp.float32))
    return out.astype(data.dtype)


def _vjp_fwd(data, segment_ids, S):
    return _fwd(data, segment_ids, S), segment_ids


def _vjp_bwd(S, segment_ids, g):
    return jnp.take(g, segment_ids, axis=0), None


tiled_segment_sum.defvjp(_vjp_fwd, _vjp_bwd)


def tiled_eligible(E: int, S: int, d: int) -> bool:
    """OPT-IN (GGPS_TILED_SEGMENT=1): the device A/B at the MalNet shape
    (E=313k, S=80k, d=64; tools/bench_segment_tiled.py, round 5) measured
    this kernel at 14.6 ms/op vs XLA's sorted scatter at 2.34 ms — the
    one-hot contraction pays ~NB× multiplicative work per edge and the
    re-tile gather alone exceeds the scatter's total time at d=64 (full
    W/NB sweep in docs/RESULTS.md round 5). Kept as the starting point for
    wider-d shapes where the ×NB term amortizes; the default long-graph
    path stays XLA's sorted scatter."""
    import os

    if os.environ.get("GGPS_TILED_SEGMENT", "0") != "1":
        return False
    if _interpret() and os.environ.get("GGPS_TILED_FORCE") != "1":
        return False     # CPU tests exercise it explicitly via FORCE
    return E >= 16384 and d >= 16 and S >= 512 and _pick_nb(S) is not None
