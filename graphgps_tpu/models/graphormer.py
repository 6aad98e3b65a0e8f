"""Graphormer layer: pre-LN MHA with additive spatial bias + MLP.

Parity with /root/reference/graphgps/layer/graphormer_layer.py:5-49; the bias
comes from the GraphormerBias encoder (encoders.py) via batch.extras['attn_bias'].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch
from ..ops.mha import mha_core, merge_heads, split_heads


class GraphormerLayer(nn.Module):
    dim_h: int
    num_heads: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    mlp_dropout: float = 0.0

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool, step=None):
        d, H = self.dim_h, self.num_heads
        # pre-LN attention
        h = nn.LayerNorm()(x)
        xd = batch.dense_view(h)
        kmask = batch.dense_view(batch.node_mask)
        q = split_heads(nn.Dense(d)(xd), H)
        k = split_heads(nn.Dense(d)(xd), H)
        v = split_heads(nn.Dense(d)(xd), H)
        bias = batch.extras.get("attn_bias")
        rng = (self.make_rng("dropout") if train and self.attn_dropout > 0 else None)
        o = mha_core(q, k, v, kmask, bias=bias,
                     dropout_rate=self.attn_dropout if train else 0.0,
                     dropout_rng=rng)
        h = batch.flat_view(merge_heads(o))
        h = nn.Dense(d)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        # pre-LN MLP
        h = nn.LayerNorm()(x)
        h = nn.gelu(nn.Dense(d)(h))
        h = nn.Dropout(self.mlp_dropout, deterministic=not train)(h)
        h = nn.Dense(d)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        x = jnp.where(batch.node_mask[:, None], x, 0.0)
        return x, e
