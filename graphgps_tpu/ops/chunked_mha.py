"""Chunked (memory-efficient) masked MHA with dropout support.

The Pallas flash kernel never materializes attention weights, so it cannot
apply attention dropout; the dense path materializes the full (B, H, N, N)
matrix — prohibitive at VOC/COCO node counts in training. This is the middle
rung: the Rabe–Staats online-softmax recurrence expressed as a ``lax.scan``
over KEY chunks with a rematerialized body, giving O(N·chunk) activation
memory, exact softmax, additive-bias support, and per-chunk Bernoulli
attention dropout whose randomness is a pure function of (rng, chunk index) —
so the remat replay in the backward pass regenerates identical masks and
gradients stay exact for the sampled mask.

Numerics: logits and accumulators in f32 regardless of input dtype (same
policy as ops/mha.py); output cast back to the value dtype.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def chunked_mha(q: jax.Array, k: jax.Array, v: jax.Array,
                key_mask: jax.Array, bias: Optional[jax.Array] = None,
                dropout_rate: float = 0.0,
                dropout_rng: Optional[jax.Array] = None,
                chunk: int = 128) -> jax.Array:
    """q, k, v: (B, H, N, Dh); key_mask: (B, N) bool; bias: (B, H, N, N).

    Returns (B, H, N, Dh). Scaling (1/√Dh) is applied internally like
    mha_core. N must be divisible by ``chunk`` (callers pad to lane-friendly
    sizes already; assert otherwise).
    """
    B, H, N, Dh = q.shape
    assert N % chunk == 0, (N, chunk)
    C = N // chunk
    scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)
    qs = q * scale

    kc = k.reshape(B, H, C, chunk, Dh).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, H, C, chunk, Dh).transpose(2, 0, 1, 3, 4)
    mc = key_mask.reshape(B, C, chunk).transpose(1, 0, 2)
    bc = (bias.reshape(B, H, N, C, chunk).transpose(3, 0, 1, 2, 4)
          if bias is not None else None)

    use_drop = dropout_rate > 0.0 and dropout_rng is not None
    # quantized-u8 keep mask, same generator as the dense path (ops/mha.py)
    keep_t = min(max(int(round(dropout_rate * 256)), 1), 255)
    keep_p = 1.0 - keep_t / 256.0

    def body(carry, inp):
        m, l, acc = carry
        if bc is not None:
            kk, vv, mm, bb, ci = inp
        else:
            (kk, vv, mm, ci), bb = inp, None
        logits = jnp.einsum("bhnd,bhmd->bhnm", qs, kk,
                            preferred_element_type=jnp.float32)
        if bb is not None:
            logits = logits + bb.astype(logits.dtype)
        logits = jnp.where(mm[:, None, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(-1, keepdims=True))
        p = jnp.exp(logits - m_new)                     # (B, H, N, chunk) f32
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(-1, keepdims=True)
        if use_drop:
            # pure function of (rng, chunk idx) → remat replays identically
            keep = jax.random.bits(
                jax.random.fold_in(dropout_rng, ci), p.shape,
                dtype=jnp.uint8) >= jnp.uint8(keep_t)
            p_v = jnp.where(keep, p / keep_p, 0.0)
        else:
            p_v = p
        acc_new = acc * corr + jnp.einsum(
            "bhnm,bhmd->bhnd", p_v, vv.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    init = (jnp.full((B, H, N, 1), NEG_INF, jnp.float32),
            jnp.zeros((B, H, N, 1), jnp.float32),
            jnp.zeros((B, H, N, Dh), jnp.float32))
    xs = ((kc, vc, mc, bc, jnp.arange(C)) if bc is not None
          else (kc, vc, mc, jnp.arange(C)))
    (m, l, acc), _ = jax.lax.scan(jax.checkpoint(body), init, xs)
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(v.dtype)
