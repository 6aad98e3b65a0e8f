"""Pallas CSR segment-sum kernel logic, validated in interpreter mode on CPU.
The compiled-TPU path and its performance are exercised by the TPU benchmarks."""
import numpy as np
import pytest
import jax.numpy as jnp

from graphgps_tpu.ops.pallas.segment_csr import (_segment_sum_csr_fwd_impl,
                                                 row_ptr_from_sorted)


@pytest.mark.parametrize("E,S,D", [(600, 256, 8), (1024, 128, 16)])
def test_csr_kernel_interpret_parity(rng, E, S, D):
    ids = np.sort(rng.integers(0, S, E)).astype(np.int32)
    data = rng.normal(size=(E, D)).astype(np.float32)
    row_ptr = row_ptr_from_sorted(jnp.asarray(ids), S)
    out = np.asarray(_segment_sum_csr_fwd_impl(
        jnp.asarray(data), jnp.asarray(ids), row_ptr, S, interpret=True))
    ref = np.zeros((S, D), np.float32)
    np.add.at(ref, ids, data)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_csr_kernel_empty_segments(rng):
    E, S, D = 128, 128, 8
    # all edges into segment 5 — everything else empty
    ids = np.full(E, 5, np.int32)
    data = rng.normal(size=(E, D)).astype(np.float32)
    row_ptr = row_ptr_from_sorted(jnp.asarray(ids), S)
    out = np.asarray(_segment_sum_csr_fwd_impl(
        jnp.asarray(data), jnp.asarray(ids), row_ptr, S, interpret=True))
    np.testing.assert_allclose(out[5], data.sum(0), rtol=1e-5)
    assert np.abs(out[np.arange(S) != 5]).max() == 0.0


def test_row_ptr():
    ids = jnp.asarray(np.array([0, 0, 2, 2, 2, 3], np.int32))
    rp = np.asarray(row_ptr_from_sorted(ids, 4))
    np.testing.assert_array_equal(rp, [0, 2, 2, 5, 6])
