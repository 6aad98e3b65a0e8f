"""Graphormer layer: pre-LN MHA with additive spatial bias + MLP.

Parity with /root/reference/graphgps/layer/graphormer_layer.py:5-49; the bias
comes from the GraphormerBias encoder (encoders.py) via batch.extras['attn_bias'].
"""
from __future__ import annotations

import jax
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
        tok = batch.extras.get("graph_token_state")  # (B, d) [CLS] or None
        seq = batch.dense_view(x)                    # (B, N, d)
        kmask = batch.dense_view(batch.node_mask)
        if tok is not None:
            # the learned graph token is sequence position 0 through the whole
            # stack (reference add_graph_token, graphormer_encoder.py:188-208)
            seq = jnp.concatenate([tok[:, None, :], seq], axis=1)
            kmask = jnp.concatenate(
                [jnp.ones((seq.shape[0], 1), bool), kmask], axis=1)
        # pre-LN attention
        h = nn.LayerNorm()(seq)
        q = split_heads(nn.Dense(d)(h), H)
        k = split_heads(nn.Dense(d)(h), H)
        v = split_heads(nn.Dense(d)(h), H)
        bias = batch.extras.get("attn_bias")  # already token-padded if tok
        rng = (self.make_rng("dropout") if train and self.attn_dropout > 0 else None)
        o = mha_core(q, k, v, kmask, bias=bias,
                     dropout_rate=self.attn_dropout if train else 0.0,
                     dropout_rng=rng)
        h = merge_heads(o)
        h = nn.Dense(d)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        seq = seq + h
        # pre-LN MLP — LayerNorm is per-row, so the whole block (LN + both
        # Denses + GELU + both dropouts + residual) fuses into ONE Pallas
        # launch when eligible (ops/pallas/fused_combine.fused_ln_ffn;
        # masked-lane LN statistics keep non-128 widths exact)
        from ..ops.pallas.fused_combine import (fused_ln_ffn_padded,
                                                ln_ffn_eligible)
        B2, N2, _ = seq.shape
        ln2 = nn.LayerNorm()
        dense1, dense2 = nn.Dense(d), nn.Dense(d)
        if ln_ffn_eligible(B2 * N2, d, "gelu"):
            _ = ln2(seq[:1, :1])
            _ = dense1(seq[:1, :1])
            _ = dense2(seq[:1, :1])
            pv = lambda m, n: m.variables["params"][n]      # noqa: E731
            r1 = self.mlp_dropout if train else 0.0
            r2 = self.dropout if train else 0.0
            if r1 > 0.0 or r2 > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), (),
                                       jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            seq = fused_ln_ffn_padded(
                seq.reshape(B2 * N2, d), pv(ln2, "scale"), pv(ln2, "bias"),
                pv(dense1, "kernel"), pv(dense1, "bias"),
                pv(dense2, "kernel"), pv(dense2, "bias"),
                seed, r1, r2, "gelu").reshape(B2, N2, d)
        else:
            h = ln2(seq)
            # exact erf GELU (torch nn.GELU() default, reference
            # graphormer_layer.py:33; jax defaults to tanh approximation)
            h = jax.nn.gelu(dense1(h), approximate=False)
            h = nn.Dropout(self.mlp_dropout, deterministic=not train)(h)
            h = dense2(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            seq = seq + h
        if tok is not None:
            batch.extras["graph_token_state"] = seq[:, 0, :]
            seq = seq[:, 1:, :]
        x = batch.flat_view(seq)
        x = jnp.where(batch.node_mask[:, None], x, 0.0)
        return x, e
