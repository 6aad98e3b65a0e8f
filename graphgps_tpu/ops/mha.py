"""Dense masked multi-head attention for padded graph batches.

TPU-native replacement for torch.nn.MultiheadAttention as used by the GPS global
block and Graphormer (/root/reference/graphgps/layer/gps_layer.py:105,199-210,
graphormer_layer.py:5-49). Operates on the canonical dense view (B, N, d) with a
key-padding mask and an optional additive per-head bias (Graphormer spatial bias).

Pure XLA einsums — the MXU path; a Pallas flash-attention kernel for large N lives
in ops/pallas/flash_mha.py and is dispatched by ``mha`` when profitable.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def keep_mask_u8(rng: jax.Array, rate: float, shape) -> tuple:
    """Dropout keep-mask from uint8 random bits: (keep_bool, keep_prob).

    A quarter of the RNG bandwidth of f32-uniform bernoulli (the per-layer
    (B,H,N,N) attention masks showed up as ~2 µs copies in the flagship
    profile). The rate is quantized to the 1/256 grid, and the inverted-
    dropout rescale must use the RETURNED actual keep probability, so
    E[mask / keep_prob] == 1 exactly despite the quantization.
    """
    t = min(max(int(round(rate * 256)), 1), 255)
    bits = jax.random.bits(rng, shape, dtype=jnp.uint8)
    return bits >= jnp.uint8(t), 1.0 - t / 256.0


def mha_core(q: jax.Array, k: jax.Array, v: jax.Array,
             key_mask: jax.Array,
             bias: Optional[jax.Array] = None,
             dropout_rate: float = 0.0,
             dropout_rng: Optional[jax.Array] = None,
             return_attn: bool = False):
    """q,k,v: (B, H, N, Dh); key_mask: (B, N) bool; bias: (B, H, N, N) additive.

    Returns (B, H, N, Dh); with ``return_attn`` also the (B, H, N, N) attention
    matrix (the reference's log_attn_weights capability, gps_layer.py:242-250).
    Softmax is computed in f32 regardless of input dtype.
    """
    B, H, N, Dh = q.shape
    scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    mask = key_mask[:, None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    # rows whose query is padded produce garbage — harmless, masked downstream.
    attn_drop = attn
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep, keep_p = keep_mask_u8(dropout_rng, dropout_rate, attn.shape)
        attn_drop = jnp.where(keep, attn / keep_p, 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn_drop.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_attn:
        return out, attn
    return out


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    B, H, N, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)
