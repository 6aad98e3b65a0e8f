"""Prediction heads + pooling.

Capability parity with /root/reference/graphgps/head/* and pooling/graph_token.py.
All pooling is masked over the flat padded node layout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch

from ..registry import register_head, register_pooling
from .common import MLP, get_act


# Node slots are per-graph contiguous by construction (GraphBatch flat
# layout), so graph pooling is a FREE dense reshape + masked axis-reduction —
# no segment op (scatter/one-hot) needed at all.

def _masked_dense(x: jax.Array, batch: GraphBatch, fill=0.0):
    xd = batch.dense_view(x)                        # (B, Nmax, d...)
    m = batch.dense_view(batch.node_mask)
    m = m.reshape(m.shape + (1,) * (xd.ndim - m.ndim))
    return jnp.where(m, xd, fill), m


@register_pooling("add")
def global_add_pool(x: jax.Array, batch: GraphBatch) -> jax.Array:
    xd, _ = _masked_dense(x, batch)
    return xd.sum(axis=1)


@register_pooling("mean")
def global_mean_pool(x: jax.Array, batch: GraphBatch) -> jax.Array:
    xd, m = _masked_dense(x, batch)
    cnt = m.sum(axis=1)
    return xd.sum(axis=1) / jnp.maximum(cnt, 1e-6)


@register_pooling("max")
def global_max_pool(x: jax.Array, batch: GraphBatch) -> jax.Array:
    xd, m = _masked_dense(x, batch, fill=-jnp.inf)
    out = xd.max(axis=1)
    return jnp.where(jnp.isneginf(out), 0.0, out)  # empty graphs → 0


@register_pooling("graph_token")
def graph_token_pool(x: jax.Array, batch: GraphBatch) -> jax.Array:
    """The Graphormer [CLS] token (reference pooling/graph_token.py:5-12).
    With ``graphormer.use_graph_token`` the learned token state threaded
    through the layer stack is used; otherwise dense node 0 of each graph."""
    tok = batch.extras.get("graph_token_state")
    if tok is not None:
        return tok
    return batch.dense_view(x)[:, 0, :]


def get_pooling(name: str):
    from ..registry import pooling_dict
    return pooling_dict[name]


@register_head("san_graph")
class SANGraphHead(nn.Module):
    """Pool → L× halving linears with activation → out
    (reference head/san_graph.py:8-42)."""

    dim_in: int
    dim_out: int
    pooling: str = "add"
    layers: int = 3
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        g = get_pooling(self.pooling)(x, batch)
        a = get_act(self.act)
        d = self.dim_in
        for l in range(self.layers - 1):
            g = a(nn.Dense(d // 2)(g))
            d = d // 2
        pred = nn.Dense(self.dim_out)(g)
        return pred, batch.y


@register_head("default")
@register_head("graph")
class GNNGraphHead(nn.Module):
    """GraphGym default graph head: pool → MLP (used by molpcba/peptides configs,
    reference configs/GPS/ogbg-molpcba-GPS+RWSE.yaml:45)."""

    dim_in: int
    dim_out: int
    pooling: str = "mean"
    layers: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        g = get_pooling(self.pooling)(x, batch)
        pred = MLP(hidden_dim=self.dim_in, out_dim=self.dim_out,
                   num_layers=max(1, self.layers), act=self.act)(g)
        return pred, batch.y


@register_head("node")  # transductive alias: split masking rides _loss_mask
@register_head("inductive_node")
class InductiveNodeHead(nn.Module):
    """Node-level MLP head (reference head/inductive_node.py:7-29)."""

    dim_in: int
    dim_out: int
    layers: int = 3
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        pred = MLP(hidden_dim=self.dim_in, out_dim=self.dim_out,
                   num_layers=max(1, self.layers), act=self.act)(x)
        return pred, batch.y


@register_head("graphormer_graph")
class GraphormerGraphHead(nn.Module):
    """LN → graph-token pool → linear (reference head/graphormer_graph.py:8-37)."""

    dim_in: int
    dim_out: int
    pooling: str = "graph_token"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        x = nn.LayerNorm()(x)
        g = get_pooling(self.pooling)(x, batch)
        return nn.Dense(self.dim_out)(g), batch.y


@register_head("inductive_edge")
class InductiveEdgeHead(nn.Module):
    """Link prediction with dot/cosine/concat decoders
    (reference head/inductive_edge.py:9-155). Expects
    batch.extras['edge_label_index'] (B?, 2, P) flat node indices and
    batch.extras['edge_label'] targets."""

    dim_in: int
    dim_out: int
    layers: int = 2
    decoding: str = "dot"
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        x = MLP(hidden_dim=self.dim_in, out_dim=self.dim_in,
                num_layers=max(1, self.layers), act=self.act)(x)
        eli = batch.extras["edge_label_index"].astype(jnp.int32)
        if eli.ndim == 3:  # (B, 2, P) graph-local → flat node-slot indices
            off = (jnp.arange(batch.num_graphs) * batch.max_nodes)[:, None]
            src_idx = (eli[:, 0] + off).reshape(-1)
            dst_idx = (eli[:, 1] + off).reshape(-1)
        else:  # already-flat (2, P)
            src_idx, dst_idx = eli[0], eli[1]
        src, dst = x[src_idx], x[dst_idx]
        if self.decoding == "dot":
            pred = (src * dst).sum(-1)
        elif self.decoding == "cosine_similarity":
            pred = (src * dst).sum(-1) / (
                jnp.linalg.norm(src, axis=-1) * jnp.linalg.norm(dst, axis=-1) + 1e-8)
        else:  # concat
            pred = nn.Dense(1)(jnp.concatenate([src, dst], axis=-1))[..., 0]
        label = batch.extras.get("edge_label")
        if label is not None:
            label = label.reshape(-1)
        return pred, label


@register_head("ogb_code_graph")
class OGBCodeGraphHead(nn.Module):
    """5 parallel vocab classifiers for ogbg-code2 subtoken prediction
    (reference head/ogb_code_graph.py:8-45)."""

    dim_in: int
    dim_out: int = 5002
    seq_len: int = 5
    pooling: str = "mean"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        g = get_pooling(self.pooling)(x, batch)
        preds = jnp.stack([nn.Dense(self.dim_out)(g) for _ in range(self.seq_len)],
                          axis=1)  # (B, seq, vocab)
        return preds, batch.y


@register_head("infer_links")
class InferLinksHead(nn.Module):
    """Link-inference probe over the complete edge index
    (reference head/infer_links.py:6-29)."""

    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        cei = batch.extras["complete_edge_index"].astype(jnp.int32)  # (B, 2, P)
        B = cei.shape[0]
        off = (jnp.arange(B) * batch.max_nodes)[:, None]
        src = x[(cei[:, 0] + off).reshape(-1)]
        dst = x[(cei[:, 1] + off).reshape(-1)]
        pred = MLP(hidden_dim=self.dim_in, out_dim=self.dim_out,
                   num_layers=2)(jnp.concatenate([src, dst], axis=-1))
        return pred, batch.extras.get("link_label")
