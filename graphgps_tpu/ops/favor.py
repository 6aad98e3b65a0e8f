"""Performer FAVOR+ linear attention — pure XLA einsums.

TPU-native re-derivation of the math vendored by the reference
(/root/reference/graphgps/layer/performer_layer.py:119-205: softmax_kernel with
orthogonal gaussian random features + non-causal linear_attention). Only the
non-causal path is exercised by GPS. Projection "redraw every k steps"
(ProjectionUpdater, performer_layer.py:323-352) is reproduced functionally: the
projection is drawn in-graph from ``fold_in(key, step // redraw_interval)`` so the
behavior class (fresh orthogonal features every k training steps) is preserved
with explicit PRNG state and no Python-side mutation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def orthogonal_gaussian(key: jax.Array, nb_rows: int, nb_cols: int) -> jax.Array:
    """Random features matrix with orthogonal blocks, gaussian-norm rescaled."""
    nb_blocks = -(-nb_rows // nb_cols)  # ceil
    keys = jax.random.split(key, nb_blocks + 1)
    blocks = []
    for i in range(nb_blocks):
        g = jax.random.normal(keys[i], (nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    W = jnp.concatenate(blocks, axis=0)[:nb_rows]
    # rescale rows to chi-distributed norms of gaussian vectors
    norms = jnp.linalg.norm(jax.random.normal(keys[-1], (nb_rows, nb_cols)), axis=1)
    return W * norms[:, None]


def softmax_kernel(x: jax.Array, projection: jax.Array, is_query: bool,
                   eps: float = 1e-4) -> jax.Array:
    """FAVOR+ positive softmax features. x: (..., N, d); projection: (m, d)."""
    d = x.shape[-1]
    m = projection.shape[0]
    x = x.astype(jnp.float32)
    ratio = m ** -0.5
    data_normalizer = d ** -0.25
    proj = jnp.einsum("...nd,md->...nm", x * data_normalizer, projection)
    diag = jnp.sum(x ** 2, axis=-1, keepdims=True) / 2.0 * data_normalizer ** 2
    if is_query:
        stab = jnp.max(proj, axis=-1, keepdims=True)
    else:
        stab = jnp.max(proj, axis=(-2, -1), keepdims=True)
    return ratio * (jnp.exp(proj - diag - stab) + eps)


def favor_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_mask: jax.Array, projection: jax.Array) -> jax.Array:
    """Non-causal FAVOR+ attention. q,k,v: (B,H,N,Dh); key_mask (B,N).

    O(N·m·Dh) — a chain of two MXU matmuls instead of the N×N score matrix.
    """
    qp = softmax_kernel(q, projection, is_query=True)    # (B,H,N,m)
    kp = softmax_kernel(k, projection, is_query=False)   # (B,H,N,m)
    kp = kp * key_mask[:, None, :, None]
    kv = jnp.einsum("bhnm,bhnd->bhmd", kp, v.astype(jnp.float32))
    out = jnp.einsum("bhnm,bhmd->bhnd", qp, kv)
    denom = jnp.einsum("bhnm,bhm->bhn", qp, kp.sum(axis=2))
    return (out / (denom[..., None] + 1e-6)).astype(v.dtype)


def draw_projection(key: jax.Array, step: Optional[jax.Array], redraw_interval: int,
                    nb_features: int, dim_head: int) -> jax.Array:
    """Projection for the current step; redrawn every ``redraw_interval`` steps."""
    if step is not None and redraw_interval > 0:
        key = jax.random.fold_in(key, step // redraw_interval)
    return orthogonal_gaussian(key, nb_features, dim_head)
