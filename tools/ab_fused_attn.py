#!/usr/bin/env python
"""TPU A/B of the fused GPS attention kernel vs the XLA dense path.

Checks numerical parity of the compiled (Mosaic) kernel, dropout determinism,
then device-times fwd+bwd of both paths at recipe shapes with the in-jit
lax.scan methodology (tools/micro_ab.timeit).

  python tools/ab_fused_attn.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from micro_ab import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from graphgps_tpu.ops.pallas.fused_gps_attn import fused_gps_attention

    assert jax.default_backend() == "tpu", jax.default_backend()

    def ref(x, kmask, wqkv, bqkv, wo, bo, H):
        B, N, d = x.shape
        Dh = d // H
        qkv = x @ wqkv + bqkv
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        hs = lambda t: t.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)  # noqa
        q, k, v = hs(q), hs(k), hs(v)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q / np.sqrt(Dh), k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(kmask[:, None, None, :] > 0, logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        return o.transpose(0, 2, 1, 3).reshape(B, N, d) @ wo + bo

    for (B, N, d, H, label) in [(256, 32, 256, 8, "pcqm"),
                                (32, 40, 128, 4, "zinc128")]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) / np.sqrt(d),
                           jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * d,)) * .1, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.float32)
        bo = jnp.asarray(rng.standard_normal((d,)) * .1, jnp.float32)
        nreal = rng.integers(N // 2, N + 1, size=(B,))
        kmask = jnp.asarray((np.arange(N)[None] < nreal[:, None])
                            .astype(np.float32))
        seed = jnp.zeros((), jnp.int32)

        # --- compiled parity ---
        y_ref = jax.jit(lambda x: ref(x, kmask, wqkv, bqkv, wo, bo, H))(x)
        y_fus = jax.jit(lambda x: fused_gps_attention(
            x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0))(x)
        m = np.asarray(kmask) > 0
        sc_y = max(1e-6, float(np.abs(np.asarray(y_ref)[m]).max()))
        err = np.max(np.abs(np.asarray(y_fus)[m]
                            - np.asarray(y_ref)[m])) / sc_y
        print(f"[{label}] fwd rel max|Δ| = {err:.3e} "
              "(both paths single-pass bf16 MXU; eps 7.8e-3)")
        assert err < 2e-2, err

        gfun_r = jax.jit(jax.grad(lambda x: jnp.sum(
            (ref(x, kmask, wqkv, bqkv, wo, bo, H) * kmask[..., None]) ** 2)))
        gfun_f = jax.jit(jax.grad(lambda x: jnp.sum(
            (fused_gps_attention(x, kmask, wqkv, bqkv, wo, bo, seed, H, 0.0)
             * kmask[..., None]) ** 2)))
        gr, gf = np.asarray(gfun_r(x)), np.asarray(gfun_f(x))
        sc = max(1e-6, np.abs(gr).max())
        gerr = np.max(np.abs(gf - gr)) / sc
        print(f"[{label}] dx rel max|Δ| = {gerr:.3e}")
        assert gerr < 2e-2, gerr

        # --- dropout determinism on-device ---
        s17 = jnp.asarray(17, jnp.int32)
        f = jax.jit(lambda x, s: fused_gps_attention(
            x, kmask, wqkv, bqkv, wo, bo, s, H, 0.5))
        y1, y2 = np.asarray(f(x, s17)), np.asarray(f(x, s17))
        assert np.array_equal(y1, y2), "dropout not deterministic"
        y3 = np.asarray(f(x, jnp.asarray(18, jnp.int32)))
        assert not np.allclose(y1, y3), "seed ignored"
        zfrac = float((np.asarray(jax.jit(lambda x: fused_gps_attention(
            x, kmask, wqkv, bqkv, wo, bo, s17, H, 0.5))(x)) == 0).mean())
        print(f"[{label}] dropout deterministic; ok")

        # --- device timing fwd+bwd ---
        t_ref = timeit(lambda xx: gfun_r(xx), x, iters=50)
        t_fus = timeit(lambda xx: gfun_f(xx), x, iters=50)
        # with dropout (the pcqm recipe trains with attn_dropout=0.5)
        gdrop_f = jax.jit(jax.grad(lambda x: jnp.sum(fused_gps_attention(
            x, kmask, wqkv, bqkv, wo, bo, s17, H, 0.5) ** 2)))
        from graphgps_tpu.ops.mha import mha_core, split_heads, merge_heads

        def ref_drop(x, key):
            B, N, d = x.shape
            qkv = x @ wqkv + bqkv
            q = split_heads(qkv[..., :d], H)
            k = split_heads(qkv[..., d:2 * d], H)
            v = split_heads(qkv[..., 2 * d:], H)
            o = mha_core(q, k, v, kmask > 0, dropout_rate=0.5,
                         dropout_rng=key)
            return merge_heads(o) @ wo + bo
        key = jax.random.PRNGKey(0)
        gdrop_r = jax.jit(jax.grad(lambda x: jnp.sum(
            ref_drop(x, key) ** 2)))
        t_ref_d = timeit(lambda xx: gdrop_r(xx), x, iters=50)
        t_fus_d = timeit(lambda xx: gdrop_f(xx), x, iters=50)
        print(f"[{label}] fwd+bwd us/call:  dense {t_ref:8.1f}  "
              f"fused {t_fus:8.1f}  ({t_ref / t_fus:.2f}x)")
        print(f"[{label}] +dropout us/call: dense {t_ref_d:8.1f}  "
              f"fused {t_fus_d:8.1f}  ({t_ref_d / t_fus_d:.2f}x)")


if __name__ == "__main__":
    main()
