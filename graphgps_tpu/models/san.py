"""SAN graph-transformer layers.

Parity with /root/reference/graphgps/layer/san_layer.py:10-216 and
san2_layer.py:36-238. TPU-first redesign of the complement-graph ("fake edge")
branch: instead of materializing the complement edge list per batch
(negate_edge_index, reference utils.py:12-65) and scattering over it, the fake
branch is computed DENSELY over the padded (B,N,N) pair grid with a mask
(valid ∧ ¬adjacent ∧ off-diagonal) — a pure MXU computation. The real-edge branch
stays sparse via segment ops. Math (exp-clamped scores, γ mixing, ε-normalized
output) matches the reference exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch
from ..ops.segment import segment_sum
from .common import MLP, Norm, get_act


def dense_adjacency(batch: GraphBatch) -> jax.Array:
    """(B, N, N) bool adjacency built once from the padded edge list."""
    B, N = batch.num_graphs, batch.max_nodes
    s_local = batch.senders % N
    r_local = batch.receivers % N
    g = batch.senders // N
    flat = g * (N * N) + s_local * N + r_local
    adj = jnp.zeros((B * N * N,), dtype=bool)
    adj = adj.at[flat].set(batch.edge_mask, mode="drop")
    return adj.reshape(B, N, N)


class SANAttention(nn.Module):
    """Multi-head SAN attention: real edges sparse + complement dense."""

    out_dim: int          # per-head dim
    num_heads: int
    gamma: float
    full_graph: bool
    gamma_learnable: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        H, Dh = self.num_heads, self.out_dim
        S = batch.num_node_slots
        proj = lambda name: nn.DenseGeneral((H, Dh), use_bias=self.use_bias,
                                            name=name)
        q = proj("Q")(x)  # (S, H, Dh)
        k = proj("K")(x)
        v = proj("V")(x)
        eh = proj("E")(e)  # (E, H, Dh)

        if self.gamma_learnable:
            gamma = nn.sigmoid(self.param("gamma", nn.initializers.constant(
                jnp.log(self.gamma / (1 - self.gamma)) if 0 < self.gamma < 1
                else 0.0), ()))
        else:
            gamma = self.gamma

        si, ri = batch.senders, batch.receivers
        # real-edge scores: exp(clamp(Σ_d q_dst·k_src·e, ±5)) (reference :39-70)
        score = (k[si] * q[ri] * eh).sum(-1) / jnp.sqrt(float(Dh))  # (E, H)
        score = jnp.exp(jnp.clip(score, -5.0, 5.0))
        if self.full_graph:
            score = score / (gamma + 1.0)
        score = score * batch.edge_mask[:, None]
        msg = v[si] * score[..., None]
        kw = dict(edge_block=batch.edge_block, max_nodes=batch.max_nodes)
        wV = segment_sum(msg, ri, S, **kw)  # (S, H, Dh)
        Z = segment_sum(score, ri, S, **kw)  # (S, H)

        if self.full_graph:
            q2 = proj("Q2")(x)
            k2 = proj("K2")(x)
            fake_edge = self.param("fake_edge_emb", nn.initializers.normal(1.0),
                                   (e.shape[-1],))
            e2 = nn.DenseGeneral((H, Dh), use_bias=self.use_bias,
                                 name="E2")(fake_edge)  # (H, Dh)
            B, N = batch.num_graphs, batch.max_nodes
            q2d = batch.dense_view(q2)   # (B, N, H, Dh)
            k2d = batch.dense_view(k2)
            vd = batch.dense_view(v)
            s2 = jnp.einsum("bjhd,hd,bihd->bhji", q2d, e2, k2d,
                            preferred_element_type=jnp.float32)
            s2 = jnp.exp(jnp.clip(s2 / jnp.sqrt(float(Dh)), -5.0, 5.0))
            s2 = s2 * (gamma / (gamma + 1.0))
            vmask = batch.dense_view(batch.node_mask)  # (B, N)
            adj = dense_adjacency(batch)               # adj[b, s, r] = s→r
            eye = jnp.eye(N, dtype=bool)
            # fake_mask[b, j, i]: message i→j allowed ⟺ real edge i→j absent
            # ⟺ ¬adj[b, i, j] — note the transpose. (Caught by the
            # reference-extracted fixtures on a graph with asymmetric edges,
            # tests/test_reference_fixtures.py; invisible on undirected data.)
            fake_mask = (vmask[:, :, None] & vmask[:, None, :]
                         & ~jnp.swapaxes(adj, 1, 2) & ~eye[None])
            s2 = s2 * fake_mask[:, None, :, :]
            wV2 = jnp.einsum("bhji,bihd->bjhd", s2, vd.astype(s2.dtype))
            Z2 = s2.sum(axis=-1).transpose(0, 2, 1)    # (B, N, H)
            wV = wV + batch.flat_view(wV2).astype(wV.dtype)
            Z = Z + batch.flat_view(Z2).astype(Z.dtype)

        out = wV / (Z[..., None] + 1e-6)
        return out.reshape(S, H * Dh)


class SANLayer(nn.Module):
    """Full SAN block: attention → O → residual+norm → FFN → residual+norm
    (reference san_layer.py:123-216; san2 variant via gamma_learnable)."""

    dim_h: int
    num_heads: int
    gamma: float = 1e-5
    full_graph: bool = True
    gamma_learnable: bool = False
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool,
                 step=None):
        h_in = x
        attn = SANAttention(out_dim=self.dim_h // self.num_heads,
                            num_heads=self.num_heads, gamma=self.gamma,
                            full_graph=self.full_graph,
                            gamma_learnable=self.gamma_learnable)(
                                batch, x, e, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(attn)
        h = nn.Dense(self.dim_h)(h)
        if self.residual:
            h = h_in + h
        a = get_act(self.act)
        from ..ops.pallas.fused_combine import (combine_eligible,
                                               fused_bn_ffn_padded)
        from ..ops.pallas.fused_tail import (fused_ffn_padded, tail_eligible)
        dense1, dense2 = nn.Dense(self.dim_h * 2), nn.Dense(self.dim_h)
        use_bnffn = (self.residual and self.batch_norm
                     and not self.layer_norm and h.ndim == 2
                     and combine_eligible(h.shape[0], self.dim_h, self.act)
                     and (self.dim_h % 128 == 0
                          or (train and self.dropout > 0)))
        if use_bnffn:
            # attention-branch BN-apply + whole FFN in ONE kernel
            # (ops/pallas/fused_combine.fused_bn_ffn): statistics stay in
            # MaskedBatchNorm stats_only (same params/variables); SAN's
            # residual rides the NORMED tensor and only the inner dropout
            # applies (reference san_layer.py FFN → drop2=False).
            mu, va, sc, bi = Norm(batch_norm=True, stats_only=True)(
                h, batch.node_mask, train)
            _ = dense1(h[:1])
            _ = dense2(jnp.zeros((1, self.dim_h * 2), h.dtype))
            k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
            b = lambda m: m.variables["params"]["bias"]     # noqa: E731
            rate = self.dropout if train else 0.0
            if rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), (),
                                       jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            h2 = fused_bn_ffn_padded(
                h, mu, jax.lax.rsqrt(va + 1e-5), sc, bi,
                k(dense1), b(dense1), k(dense2), b(dense2), seed, rate,
                self.act, drop2=False)
        else:
            h = Norm(batch_norm=self.batch_norm, layer_norm=self.layer_norm)(
                h, batch.node_mask, train)
            h_in2 = h
            if (self.residual and h.ndim == 2
                    and tail_eligible(h.shape[0], self.dim_h, self.act)
                    and (self.dim_h % 128 == 0
                         or (train and self.dropout > 0))):
                # SAN FFN through the fused kernel (drop2=False: SAN applies
                # only the inner dropout, reference san_layer.py FFN)
                _ = dense1(h[:1])
                _ = dense2(jnp.zeros((1, self.dim_h * 2), h.dtype))
                k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
                b = lambda m: m.variables["params"]["bias"]     # noqa: E731
                rate = self.dropout if train else 0.0
                if rate > 0.0:
                    seed = jax.random.bits(self.make_rng("dropout"), (),
                                           jnp.uint32).astype(jnp.int32)
                else:
                    seed = jnp.zeros((), jnp.int32)
                h2 = fused_ffn_padded(h, k(dense1), b(dense1), k(dense2),
                                      b(dense2), seed, rate, self.act,
                                      drop2=False)
            else:
                h2 = dense1(h)
                h2 = nn.Dropout(self.dropout, deterministic=not train)(a(h2))
                h2 = dense2(h2)
                if self.residual:
                    h2 = h_in2 + h2
        h2 = Norm(batch_norm=self.batch_norm, layer_norm=self.layer_norm)(
            h2, batch.node_mask, train)
        h2 = jnp.where(batch.node_mask[:, None], h2, 0.0)
        return h2, e
