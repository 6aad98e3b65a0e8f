"""Pallas CSR segment-sum kernel: the large-scale torch_scatter replacement.

Edges arrive sorted by receiver (collation guarantees this — data/batching.py,
native/collate.cpp), so each tile of 128 segments owns a contiguous edge range
bounded by ``row_ptr``. Each grid program DMAs its edge range chunk-by-chunk
from HBM into VMEM and accumulates with a (TILE_S, CHUNK) one-hot matmul — the
reduction runs on the MXU instead of the serialized scatter unit, which is the
speed-of-light design for segment reductions on TPU (SURVEY.md §7.2.2).

Layout notes (Mosaic tiling constraints):
- receivers are carried as a single lane-major row (1, E) so chunk slices are
  lane-aligned; the one-hot is built by comparing a sublane iota against the
  broadcast receiver row — no relayout;
- chunk starts are floor-aligned to CHUNK: edges outside the tile's true
  [row_ptr[t], row_ptr[t+1]) range fail the ``0 ≤ rec − tile_base < TILE_S``
  lane test and contribute zero, so alignment slack is self-masking;
- feature dim is padded to the 128-lane multiple by the wrapper.

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

TILE_S = 512     # max segments per grid program (sublane extent of the one-hot)
CHUNK = 1024     # edge rows DMA'd per inner step (multiple of 128)


def _pick_tile(S: int) -> int:
    for t in (512, 256, 128):
        if S % t == 0:
            return t
    raise ValueError(f"num_segments {S} must be a multiple of 128")


def _kernel(tile_s,          # static: segments per tile
            starts_ref,            # scalar prefetch: (T,) CHUNK-aligned starts
            ends_ref,              # scalar prefetch: (T,) CHUNK-aligned ends
            data_ref,              # HBM (E_pad, D)
            rec_ref,               # HBM (1, E_pad) int32, sorted + sentinel pad
            out_ref,               # VMEM block (TILE_S, D)
            acc_ref,               # VMEM scratch (TILE_S, D) f32
            data_buf,              # VMEM scratch (CHUNK, D)
            rec_buf,               # VMEM scratch (1, CHUNK) int32
            sem_d, sem_r):
    i = pl.program_id(0)
    seg_lo = i * tile_s
    start = starts_ref[i]          # CHUNK-aligned; ranges of adjacent tiles
    end = ends_ref[i]              # may overlap — overlap is self-masking
    acc_ref[:] = jnp.zeros_like(acc_ref)

    n_chunks = (end - start) // CHUNK

    def dma_pair(slot, c):
        off = pl.multiple_of(start + c * CHUNK, CHUNK)
        return (pltpu.make_async_copy(data_ref.at[pl.ds(off, CHUNK), :],
                                      data_buf.at[slot], sem_d.at[slot]),
                pltpu.make_async_copy(rec_ref.at[:, pl.ds(off, CHUNK)],
                                      rec_buf.at[slot], sem_r.at[slot]))

    @pl.when(n_chunks > 0)
    def _():
        d0, r0 = dma_pair(0, 0)
        d0.start()
        r0.start()

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                dn, rn = dma_pair(nxt, c + 1)
                dn.start()
                rn.start()

            dc, rc = dma_pair(slot, c)
            rc.wait()
            local = rec_buf[slot, 0, :] - seg_lo             # (CHUNK,) lanes
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_s, CHUNK), 0)
            onehot = jnp.where(rows == local[None, :], 1.0, 0.0
                               ).astype(jnp.float32)
            dc.wait()
            acc_ref[:] += jax.lax.dot_general(
                onehot, data_buf[slot].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _segment_sum_csr_fwd_impl(data: jax.Array, receivers: jax.Array,
                              row_ptr: jax.Array, num_segments: int,
                              interpret: bool = False) -> jax.Array:
    E, D = data.shape
    S = num_segments
    tile_s = _pick_tile(S)
    lane = 128
    d_pad = ((D + lane - 1) // lane) * lane
    if d_pad != D:
        data = jnp.pad(data, ((0, 0), (0, d_pad - D)))
    epad = ((E + CHUNK - 1) // CHUNK) * CHUNK
    if epad != E:
        data = jnp.pad(data, ((0, epad - E), (0, 0)))
        receivers = jnp.pad(receivers, (0, epad - E),
                            constant_values=S)  # sentinel: never matches a tile
    rec_row = receivers.reshape(1, -1).astype(jnp.int32)

    grid = (S // tile_s,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_s, d_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_s, d_pad), jnp.float32),
            pltpu.VMEM((2, CHUNK, d_pad), data.dtype),   # double buffer
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # CHUNK-aligned per-tile edge bounds: floor the starts, ceil the ends.
    # Adjacent tiles' ranges may overlap by one chunk; edges outside a tile's
    # true segment range fail the lane test and contribute zero.
    starts = ((row_ptr[:-1:tile_s] // CHUNK) * CHUNK).astype(jnp.int32)
    ends_exact = row_ptr[tile_s::tile_s]   # (S//tile_s,) — last entry is E
    ends = (((ends_exact + CHUNK - 1) // CHUNK) * CHUNK).astype(jnp.int32)
    ends = jnp.minimum(ends, jnp.int32(epad))
    ends = jnp.maximum(ends, starts)

    import functools as _ft
    return pl.pallas_call(
        _ft.partial(_kernel, tile_s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, d_pad), data.dtype),
        interpret=interpret,
    )(starts, ends, data, rec_row)[:, :D]


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
