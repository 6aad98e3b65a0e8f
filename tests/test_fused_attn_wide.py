"""Wide-graph head-packed flash kernel (ops/pallas/fused_attn_wide.py) vs
the dense reference: fwd + all grads in interpret mode, including the
per-head Dh-padding path (pad_heads) at the VOC width d=96."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_fused_attn import _ref_attention


def _setup(B, N, d, H, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    wqkv3 = jnp.asarray(rng.standard_normal((d, 3, d)) / np.sqrt(d),
                        jnp.float32)
    bqkv2 = jnp.asarray(rng.standard_normal((3, d)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.float32)
    bo = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    nreal = rng.integers(max(1, N // 4), N + 1, size=(B,))
    nreal[0] = max(1, N // 8)
    kmask = jnp.asarray((np.arange(N)[None, :] < nreal[:, None])
                        .astype(np.float32))
    counts = jnp.asarray(nreal.astype(np.int32))
    return x, wqkv3, bqkv2, wo, bo, kmask, counts


@pytest.mark.parametrize("shape", [
    (3, 256, 128, 8),    # lane-aligned
    (2, 512, 96, 8),     # VOC: Dh=12 → per-head pad to 16
    (2, 256, 96, 4),     # Dh=24 → pad to 32
])
def test_wide_matches_reference(shape):
    from graphgps_tpu.ops.pallas.fused_attn_wide import fused_wide_attention
    from graphgps_tpu.ops.pallas.fused_gps_attn import pad_heads

    B, N, d, H = shape
    x, wqkv3, bqkv2, wo, bo, kmask, counts = _setup(B, N, d, H)
    seed = jnp.zeros((), jnp.int32)
    scale_ok = 1.0 / float(d // H) ** 0.5

    padded = pad_heads(wqkv3, bqkv2, wo, bo, H)
    assert padded is not None
    wq_p, bq_p, wo_p, bo_p, dp = padded
    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d))) if dp != d else x

    y = fused_wide_attention(x_p, counts, wq_p, bq_p, wo_p, bo_p, seed, H,
                             scale_ok, 0.0)[..., :d]
    y_ref = _ref_attention(x, kmask, wqkv3.reshape(d, 3 * d),
                           bqkv2.reshape(3 * d), wo, bo, H)
    m = np.asarray(kmask) > 0
    np.testing.assert_allclose(np.asarray(y)[m], np.asarray(y_ref)[m],
                               rtol=3e-4, atol=3e-4)

    # grads wrt x and every weight, masked-row loss
    def loss_fused(x, wqkv3, bqkv2, wo, bo):
        p = pad_heads(wqkv3, bqkv2, wo, bo, H)
        wq_p, bq_p, wo_p, bo_p, dp = p
        xp = (jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
              if dp != d else x)
        out = fused_wide_attention(xp, counts, wq_p, bq_p, wo_p, bo_p,
                                   seed, H, scale_ok, 0.0)[..., :d]
        return jnp.sum((out * kmask[..., None]) ** 2)

    def loss_ref(x, wqkv3, bqkv2, wo, bo):
        out = _ref_attention(x, kmask, wqkv3.reshape(d, 3 * d),
                             bqkv2.reshape(3 * d), wo, bo, H)
        return jnp.sum((out * kmask[..., None]) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, wqkv3, bqkv2, wo, bo)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, wqkv3, bqkv2, wo, bo)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_wide_dropout_replay():
    """Backward regenerates the exact forward keep masks: with dropout on,
    grad of sum(out) wrt v-ish inputs must be deterministic across calls."""
    from graphgps_tpu.ops.pallas.fused_attn_wide import fused_wide_attention

    B, N, d, H = 2, 256, 128, 8
    x, wqkv3, bqkv2, wo, bo, kmask, counts = _setup(B, N, d, H, seed=3)
    wq = wqkv3.reshape(d, 3 * d)
    bq = bqkv2.reshape(3 * d)
    seed = jnp.asarray(11, jnp.int32)
    scale = 1.0 / float(d // H) ** 0.5

    def f(x):
        return jnp.sum(fused_wide_attention(x, counts, wq, bq, wo, bo,
                                            seed, H, scale, 0.3)
                       * kmask[..., None])

    y1, y2 = f(x), f(x)
    np.testing.assert_allclose(float(y1), float(y2), rtol=1e-6)
    g1 = jax.grad(f)(x)
    g2 = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
    # dropout actually drops: differs from the rate-0 output
    y0 = jnp.sum(fused_wide_attention(x, counts, wq, bq, wo, bo, seed, H,
                                      scale, 0.0) * kmask[..., None])
    assert abs(float(y1) - float(y0)) > 1e-3
