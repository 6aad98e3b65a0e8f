"""Pallas CSR segment-sum kernel: the large-scale torch_scatter replacement.

Edges arrive sorted by receiver (collation guarantees this — data/batching.py,
native/collate.cpp), so each tile of 128 segments owns a contiguous edge range
given by ``row_ptr``. Each grid program DMAs its edge range chunk-by-chunk from
HBM into VMEM and accumulates with a (CHUNK, TILE_S) one-hot matmul — the
reduction runs on the MXU instead of the serialized scatter unit, which is the
speed-of-light design for segment reductions on TPU (SURVEY.md §7.2.2).

Used by ops.segment.segment_sum when the flat one-hot would not fit
(num_edges × num_segments above GGPS_DENSE_SEGMENT_LIMIT — e.g. ogbg-code2
batches with 32k node slots). Backward = gather (jnp.take) via custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 128     # segments per grid program (lane width)
CHUNK = 512      # edge rows DMA'd per inner step


def _kernel(row_ptr_ref,           # scalar prefetch: (S//TILE_S + 1,) edge bounds
            data_ref,              # HBM (E, D)
            rec_ref,               # HBM (E, 1) int32, sorted
            out_ref,               # VMEM block (TILE_S, D)
            acc_ref,               # VMEM scratch (TILE_S, D) f32
            data_buf, rec_buf,     # VMEM scratch (CHUNK, D), (CHUNK, 1)
            sem_d, sem_r):
    i = pl.program_id(0)
    seg_lo = i * TILE_S
    e_start = row_ptr_ref[i]
    e_end = row_ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    n_chunks = pl.cdiv(e_end - e_start, CHUNK)

    def body(c, _):
        off = e_start + c * CHUNK
        d_dma = pltpu.make_async_copy(data_ref.at[pl.ds(off, CHUNK), :],
                                      data_buf, sem_d)
        r_dma = pltpu.make_async_copy(rec_ref.at[pl.ds(off, CHUNK), :],
                                      rec_buf, sem_r)
        d_dma.start()
        r_dma.start()
        d_dma.wait()
        r_dma.wait()
        eidx = off + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        valid = eidx < e_end
        local = rec_buf[:] - seg_lo                        # (CHUNK, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_S), 1)
        onehot = jnp.where(jnp.logical_and(local == lanes, valid),
                           1.0, 0.0).astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            onehot, data_buf[:].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _segment_sum_csr_fwd_impl(data: jax.Array, receivers: jax.Array,
                              row_ptr: jax.Array, num_segments: int,
                              interpret: bool = False) -> jax.Array:
    E, D = data.shape
    S = num_segments
    assert S % TILE_S == 0, f"num_segments {S} must be a multiple of {TILE_S}"
    # pad edge arrays so chunked DMA never reads out of bounds
    epad = ((E + CHUNK - 1) // CHUNK) * CHUNK
    if epad != E:
        data = jnp.pad(data, ((0, epad - E), (0, 0)))
        receivers = jnp.pad(receivers, (0, epad - E),
                            constant_values=S)  # out-of-tile ⇒ never matches
    rec2d = receivers.reshape(-1, 1).astype(jnp.int32)

    grid = (S // TILE_S,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE_S, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_S, D), jnp.float32),
            pltpu.VMEM((CHUNK, D), data.dtype),
            pltpu.VMEM((CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # tile edge bounds: row_ptr at tile granularity, padded edges appended to
    # the last tile (their receiver ids never match a lane, contributing 0)
    tile_ptr = row_ptr[::TILE_S]
    tile_ptr = jnp.concatenate([tile_ptr, jnp.array([epad], row_ptr.dtype)])
    tile_ptr = tile_ptr.astype(jnp.int32)

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, D), data.dtype),
        interpret=interpret,
    )(tile_ptr, data, rec2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_csr(data, receivers, row_ptr, num_segments: int):
    return _segment_sum_csr_fwd_impl(data, receivers, row_ptr, num_segments)


def _fwd(data, receivers, row_ptr, num_segments):
    out = _segment_sum_csr_fwd_impl(data, receivers, row_ptr, num_segments)
    return out, receivers


def _bwd(num_segments, receivers, g):
    # d(data)[e] = g[receivers[e]] — an XLA gather, fast on TPU
    return jnp.take(g, receivers, axis=0), None, None


segment_sum_csr.defvjp(_fwd, _bwd)


def row_ptr_from_sorted(receivers: jax.Array, num_segments: int) -> jax.Array:
    """CSR row offsets from a sorted receiver array (device-side)."""
    return jnp.searchsorted(receivers, jnp.arange(num_segments + 1),
                            side="left").astype(jnp.int32)
