"""bf16 mixed-precision policy (``cfg.mixed_precision``).

TPU analog of the reference's tf32 matmul policy
(/root/reference/main.py:30-31), but a full storage policy rather than a
matmul flag: master params and optimizer state stay float32; inside the jitted
step both params and batch float features are cast to bfloat16, so every
matmul runs on the MXU in bf16 with f32 accumulation and activations move
through HBM at half the bandwidth. Reductions that need range/precision stay
f32 by construction: softmax logits (ops/mha.py), segment-sum accumulation
(ops/segment.py, preferred_element_type=f32), and Batch/LayerNorm statistics
(models/common.py). Loss is computed on f32-cast predictions; the cast's
transpose returns f32 gradients for the f32 master params, so no loss scaling
is needed (bf16 keeps f32's exponent range).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# batch.extras entries that are loss targets / metric inputs, never features —
# keep full precision
_PRESERVE_EXTRA_SUBSTR = ("label",)


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast float leaves of a pytree to ``dtype``; ints/bools untouched."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def cast_batch(batch, dtype=jnp.bfloat16):
    """Cast a GraphBatch's float FEATURE arrays (node/edge features, PEs,
    non-label extras). Targets (y, *label* extras) and masks keep their dtype.
    """
    def fcast(x):
        return (x.astype(dtype)
                if x is not None and jnp.issubdtype(x.dtype, jnp.floating)
                else x)

    extras = {k: (v if any(s in k for s in _PRESERVE_EXTRA_SUBSTR)
                  else fcast(v))
              for k, v in batch.extras.items()}
    return batch.replace(
        node_feat=fcast(batch.node_feat),
        edge_feat=fcast(batch.edge_feat),
        pe={k: fcast(v) for k, v in batch.pe.items()},
        extras=extras)


def apply_policy(params, batch, enabled: bool):
    """(params, batch) → bf16-cast views when the policy is on."""
    if not enabled:
        return params, batch
    return cast_floating(params), cast_batch(batch)
