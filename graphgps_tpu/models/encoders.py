"""Node/edge feature + PE encoders.

Capability parity with /root/reference/graphgps/encoder/* (SURVEY.md §2.5). All
encoders are flax modules over the flat padded node space (B*Nmax, ·); composed
"DS+PE1+PE2" encoder names (composed_encoders.py:19-156) are resolved by
``FeatureEncoder`` in networks.py: the dataset encoder embeds raw features into
``dim_emb - Σ dim_pe`` channels and each PE encoder appends its ``dim_pe``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch
from ..registry import register_edge_encoder, register_node_encoder
from .common import MLP, Embed, MaskedBatchNorm, dropout, get_act

# OGB molecule feature cardinalities (ogb.utils.features get_atom/bond_feature_dims)
ATOM_FEATURE_DIMS = [119, 5, 12, 12, 10, 6, 6, 2, 2]
BOND_FEATURE_DIMS = [5, 6, 2]


# --- dataset node encoders ---------------------------------------------------------

@register_node_encoder("TypeDictNode")
class TypeDictNodeEncoder(nn.Module):
    """Single-embedding integer-type encoder (reference type_dict_encoder.py:85-99;
    ZINC: 28 types, AQSOL: 65)."""

    dim_emb: int
    num_types: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        codes = batch.node_feat[:, 0].astype(jnp.int32)
        return Embed(self.num_types, self.dim_emb)(codes)


@register_node_encoder("Atom")
class AtomEncoder(nn.Module):
    """OGB AtomEncoder: sum of per-feature embeddings (GraphGym external dep,
    reference composed_encoders.py:3)."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        feats = batch.node_feat.astype(jnp.int32)
        out = 0.0
        for i, card in enumerate(ATOM_FEATURE_DIMS[:feats.shape[1]]):
            out = out + Embed(card, self.dim_emb)(jnp.clip(feats[:, i], 0, card - 1))
        return out


@register_node_encoder("LinearNode")
class LinearNodeEncoder(nn.Module):
    """reference linear_node_encoder.py:6-15."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        return nn.Dense(self.dim_emb)(batch.node_feat.astype(jnp.float32))


@register_node_encoder("VOCNode")
class VOCNodeEncoder(nn.Module):
    """reference voc_superpixels_encoder.py:19-34 (Linear 14→d)."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        return nn.Dense(self.dim_emb)(batch.node_feat.astype(jnp.float32))


@register_node_encoder("COCONode")
class COCONodeEncoder(nn.Module):
    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        return nn.Dense(self.dim_emb)(batch.node_feat.astype(jnp.float32))


@register_node_encoder("PPANode")
class PPANodeEncoder(nn.Module):
    """ogbg-ppa: uniform zero node features → single learned embedding
    (reference ppa_encoder.py:6-16)."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        emb = self.param("emb", nn.initializers.normal(0.02), (self.dim_emb,))
        return jnp.broadcast_to(emb, (batch.num_node_slots, self.dim_emb))


# --- dataset edge encoders ---------------------------------------------------------

@register_edge_encoder("TypeDictEdge")
class TypeDictEdgeEncoder(nn.Module):
    dim_emb: int
    num_types: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        codes = batch.edge_feat[:, 0].astype(jnp.int32)
        return Embed(self.num_types, self.dim_emb)(codes)


@register_edge_encoder("Bond")
class BondEncoder(nn.Module):
    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        feats = batch.edge_feat.astype(jnp.int32)
        out = 0.0
        for i, card in enumerate(BOND_FEATURE_DIMS[:feats.shape[1]]):
            out = out + Embed(card, self.dim_emb)(jnp.clip(feats[:, i], 0, card - 1))
        return out


@register_edge_encoder("LinearEdge")
@register_edge_encoder("VOCEdge")
class LinearEdgeEncoder(nn.Module):
    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        return nn.Dense(self.dim_emb)(batch.edge_feat.astype(jnp.float32))


@register_edge_encoder("DummyEdge")
class DummyEdgeEncoder(nn.Module):
    """Single learned embedding for featureless edges (reference
    dummy_edge_encoder.py:5-17)."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        emb = self.param("emb", nn.initializers.normal(0.02), (self.dim_emb,))
        return jnp.broadcast_to(emb, (batch.max_edges, self.dim_emb))


@register_edge_encoder("PPAEdge")
class PPAEdgeEncoder(nn.Module):
    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        return nn.Dense(self.dim_emb)(batch.edge_feat.astype(jnp.float32))


@register_node_encoder("ASTNode")
class ASTNodeEncoder(nn.Module):
    """ogbg-code2 AST nodes: type + attribute + depth embeddings
    (reference ast_encoder.py:34-68). node_feat columns: [type, attr, depth]."""

    dim_emb: int
    num_node_types: int = 98
    num_node_attr: int = 10030
    max_depth: int = 20

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        f = batch.node_feat.astype(jnp.int32)
        t = Embed(self.num_node_types, self.dim_emb)(
            jnp.clip(f[:, 0], 0, self.num_node_types - 1))
        a = Embed(self.num_node_attr, self.dim_emb)(
            jnp.clip(f[:, 1], 0, self.num_node_attr - 1))
        d = Embed(self.max_depth + 1, self.dim_emb)(
            jnp.clip(f[:, 2], 0, self.max_depth))
        return t + a + d


@register_edge_encoder("ASTEdge")
class ASTEdgeEncoder(nn.Module):
    """ogbg-code2 edges: type (AST/next-token) + direction embeddings
    (reference ast_encoder.py:70-84)."""

    dim_emb: int

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool):
        f = batch.edge_feat.astype(jnp.int32)
        t = Embed(2, self.dim_emb)(jnp.clip(f[:, 0], 0, 1))
        d = Embed(2, self.dim_emb)(jnp.clip(f[:, 1], 0, 1))
        return t + d


# --- PE encoders (append dim_pe channels to x) -------------------------------------

class KernelPENodeEncoder(nn.Module):
    """RWSE/HKdiagSE/ElstaticSE: raw-norm → Linear/MLP → concat
    (reference kernel_pos_encoder.py:8-124)."""

    kernel_type: str = "RWSE"  # pestat key
    dim_pe: int = 16
    model: str = "Linear"     # Linear / mlp
    layers: int = 2
    raw_norm_type: str = "BatchNorm"
    pass_as_var: bool = False  # reference kernel_pos_encoder.py:101

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        pos = batch.pe[f"pestat_{self.kernel_type}"].astype(jnp.float32)
        if self.raw_norm_type.lower() == "batchnorm":
            pos = MaskedBatchNorm()(pos, batch.node_mask, train)
        if self.model == "Linear":
            pe = nn.Dense(self.dim_pe)(pos)
        else:
            pe = MLP(hidden_dim=self.dim_pe, out_dim=self.dim_pe,
                     num_layers=max(1, self.layers), act="relu",
                     with_final_act=True)(pos)
        if self.pass_as_var:
            batch.pe[f"pe_{self.kernel_type}"] = pe  # host-side side-channel
        return jnp.concatenate([x, pe], axis=-1) if x is not None else pe


@register_node_encoder("RWSE")
class RWSENodeEncoder(KernelPENodeEncoder):
    kernel_type: str = "RWSE"


@register_node_encoder("HKdiagSE")
class HKdiagSENodeEncoder(KernelPENodeEncoder):
    kernel_type: str = "HKdiagSE"


@register_node_encoder("ElstaticSE")
class ElstaticSENodeEncoder(KernelPENodeEncoder):
    kernel_type: str = "ElstaticSE"


@register_node_encoder("LapPE")
class LapPENodeEncoder(nn.Module):
    """LapPE with training-time random sign flip + DeepSet/Transformer over the
    frequency axis (reference laplace_pos_encoder.py:8-144). NaN-padded
    frequencies are masked.

    Fidelity notes (VERDICT r2 missing #2):
    - ``raw_norm_type='BatchNorm'`` applies ``nn.BatchNorm1d(max_freqs)`` to
      the raw (eigvec, eigval) pairs — per-FREQUENCY statistics pooled over
      (nodes × 2), reference laplace_pos_encoder.py:46-49 — restricted here
      to real (unpadded) nodes;
    - the Transformer variant is a full post-norm
      ``nn.TransformerEncoderLayer``: MHA + dropout + residual + LayerNorm,
      then FFN(ffn_dim, default torch 2048) + residual + LayerNorm
      (laplace_pos_encoder.py:55-60);
    - the DeepSet variant uses the reference's 2*dim_pe hidden widths
      (laplace_pos_encoder.py:62-75), as does the post-pool MLP (:77-92).
    """

    dim_pe: int
    model: str = "DeepSet"    # DeepSet / Transformer
    layers: int = 2
    n_heads: int = 4
    post_layers: int = 0
    max_freqs: int = 10
    raw_norm_type: str = "none"
    # torch nn.TransformerEncoderLayer defaults the reference relies on
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    pass_as_var: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        evecs = batch.pe["EigVecs"].astype(jnp.float32)          # (S, K)
        evals = batch.extras["EigVals"].astype(jnp.float32)       # (B, 1, K)
        K = evecs.shape[1]
        freq_mask = ~jnp.isnan(evecs)                             # (S, K)
        evecs = jnp.nan_to_num(evecs)
        if train:
            sign = jnp.where(
                jax.random.bernoulli(self.make_rng("signflip"), 0.5, (K,)), 1.0, -1.0)
            evecs = evecs * sign[None, :]
        ev = jnp.nan_to_num(evals).reshape(batch.num_graphs, K)
        ev_nodes = jnp.repeat(ev, batch.max_nodes, axis=0)        # (S, K)
        h = jnp.stack([evecs, ev_nodes], axis=-1)                 # (S, K, 2)
        if self.raw_norm_type.lower() == "batchnorm":
            # torch BatchNorm1d(C=max_freqs) on (N, K, 2): stats per frequency
            # over (nodes × 2); padded-freq zeros enter the stats exactly as
            # in the reference (pos_enc[empty_mask]=0 precedes the norm)
            S = h.shape[0]
            h2 = h.transpose(0, 2, 1).reshape(S * 2, K)
            h2 = MaskedBatchNorm()(h2, jnp.repeat(batch.node_mask, 2), train)
            h = h2.reshape(S, 2, K).transpose(0, 2, 1)
        det = not train
        if self.model == "Transformer":
            h = nn.Dense(self.dim_pe)(h)                          # linear_A
            Dh = self.dim_pe // self.n_heads
            for _ in range(self.layers):
                # --- MHA sublayer (post-norm) ---
                q = nn.DenseGeneral((self.n_heads, Dh))(h)
                k = nn.DenseGeneral((self.n_heads, Dh))(h)
                v = nn.DenseGeneral((self.n_heads, Dh))(h)
                logits = jnp.einsum("skhd,slhd->shkl", q, k) / jnp.sqrt(
                    jnp.asarray(Dh, jnp.float32))
                logits = jnp.where(freq_mask[:, None, None, :], logits, -1e30)
                attn = jax.nn.softmax(logits, axis=-1)
                attn = dropout(attn, self.dropout_rate, det)
                o = jnp.einsum("shkl,slhd->skhd", attn, v).reshape(
                    h.shape[0], K, self.dim_pe)
                o = nn.Dense(self.dim_pe)(o)                      # out proj
                h = nn.LayerNorm()(h + dropout(o, self.dropout_rate, det))
                # --- FFN sublayer ---
                f = nn.relu(nn.Dense(self.ffn_dim)(h))
                f = nn.Dense(self.dim_pe)(dropout(f, self.dropout_rate, det))
                h = nn.LayerNorm()(h + dropout(f, self.dropout_rate, det))
        elif self.layers == 1:
            h = nn.relu(nn.Dense(self.dim_pe)(h))                 # linear_A
        else:
            h = nn.relu(nn.Dense(2 * self.dim_pe)(h))             # linear_A
            for _ in range(self.layers - 2):
                h = nn.relu(nn.Dense(2 * self.dim_pe)(h))
            h = nn.relu(nn.Dense(self.dim_pe)(h))
        h = jnp.where(freq_mask[..., None], h, 0.0)
        pe = h.sum(axis=1)                                        # sum over freqs
        if self.post_layers == 1:
            pe = nn.relu(nn.Dense(self.dim_pe)(pe))
        elif self.post_layers > 1:
            pe = MLP(hidden_dim=2 * self.dim_pe, out_dim=self.dim_pe,
                     num_layers=self.post_layers, with_final_act=True)(pe)
        if self.pass_as_var:
            batch.pe["pe_LapPE"] = pe  # side-channel (host-side dict mutation)
        return jnp.concatenate([x, pe], axis=-1) if x is not None else pe


@register_node_encoder("EquivStableLapPE")
class EquivStableLapPEEncoder(nn.Module):
    """Linear K→dim_pe of eigvecs, stashed for edge-message scaling in local GNNs
    (reference equivstable_laplace_pos_encoder.py:8-51). Returns x unchanged; the
    PE is read from batch.pe by GatedGCN/GINE layers."""

    dim_pe: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        evecs = jnp.nan_to_num(batch.pe["EigVecs"].astype(jnp.float32))
        pe = nn.Dense(self.dim_pe)(evecs)
        batch.pe["pe_EquivStableLapPE"] = pe  # side-channel (dict mutation is host-side)
        return x


@register_node_encoder("SignNet")
class SignNetNodeEncoder(nn.Module):
    """SignNet: φ(v)+φ(−v) per eigenvector channel via a GIN, then ρ
    (reference signnet_pos_encoder.py:110-278).

    ρ variants per ``posenc_SignNet.model``:
    - ``MLP`` (GINDeepSigns): channels concatenated over the fixed K and fed
      to an MLP;
    - ``DeepSet`` (MaskedGINDeepSigns, reference :134-173): channel k of a
      graph with n nodes is masked out when k ≥ n (eigenvectors beyond the
      graph's size do not exist), channels are SUM-pooled — a DeepSet over a
      VARIABLE number of frequencies — then the ρ-MLP maps to dim_pe.
    """

    dim_pe: int
    phi_hidden_dim: int = 64
    phi_out_dim: int = 4
    layers: int = 3          # GIN layers in φ
    post_layers: int = 2     # ρ MLP layers
    max_freqs: int = 10
    model: str = "MLP"       # MLP (fixed k) / DeepSet (masked variable k)
    pass_as_var: bool = False  # reference signnet_pos_encoder.py:276

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        evecs = batch.pe["eigvecs_sn"].astype(jnp.float32)  # (S, K)
        K = evecs.shape[1]
        freq_mask = ~jnp.isnan(evecs)
        v = jnp.nan_to_num(evecs).T[..., None]              # (K, S, 1)

        sender_idx, receiver_idx = batch.senders, batch.receivers
        emask = batch.edge_mask

        # Sign-invariant φ(v) + φ(−v): same submodule (shared params) on ±v.
        stack = _GINStack(self.layers, self.phi_hidden_dim, self.phi_out_dim)
        hpos = stack(v, sender_idx, receiver_idx, emask, batch.num_node_slots,
                     batch.node_mask, train)
        hneg = stack(-v, sender_idx, receiver_idx, emask, batch.num_node_slots,
                     batch.node_mask, train)
        h = hpos + hneg                                      # (K, S, phi_out)
        if self.model == "DeepSet":
            # mask channel k for nodes of graphs with n ≤ k nodes
            # (reference batched_n_nodes + mask, signnet_pos_encoder.py:148-170)
            n_per_slot = batch.nodes_per_graph[batch.graph_id]   # (S,)
            kmask = jnp.arange(K)[:, None] < n_per_slot[None, :]  # (K, S)
            h = jnp.where(kmask[..., None], h, 0.0)
            h = h.sum(axis=0)                                # DeepSet sum → (S, phi_out)
        else:
            h = jnp.where(freq_mask.T[..., None], h, 0.0)
            h = h.transpose(1, 0, 2).reshape(
                evecs.shape[0], K * self.phi_out_dim)
        pe = MLP(hidden_dim=self.dim_pe, out_dim=self.dim_pe,
                 num_layers=self.post_layers)(h)
        if self.pass_as_var:
            batch.pe["pe_SignNet"] = pe  # host-side side-channel
        return jnp.concatenate([x, pe], axis=-1) if x is not None else pe


class _GINStack(nn.Module):
    """φ GIN over per-channel eigenvector signals, with BatchNorm between
    layers like the reference (signnet_pos_encoder.py GIN use_bn=True) —
    without it the PE magnitudes blow up and kill downstream ReLU stacks."""

    layers: int
    hidden: int
    out: int

    @nn.compact
    def __call__(self, z, senders, receivers, emask, num_slots,
                 node_mask=None, train: bool = False):
        from ..ops.segment import segment_sum
        from .common import MaskedBatchNorm

        h = z  # (K, S, d)
        K = h.shape[0]
        for li in range(self.layers):
            msgs = h[:, senders, :] * emask[None, :, None]
            agg = jax.vmap(lambda m: segment_sum(m, receivers, num_slots))(msgs)
            out_dim = self.hidden if li < self.layers - 1 else self.out
            h = MLP(hidden_dim=self.hidden, out_dim=out_dim, num_layers=2,
                    with_final_act=True)(h + agg)
            if li < self.layers - 1:
                flat = h.reshape(K * num_slots, -1)
                m = (jnp.tile(node_mask, K) if node_mask is not None else None)
                flat = MaskedBatchNorm()(flat, m, train)
                h = flat.reshape(K, num_slots, -1)
        return h


@register_node_encoder("GraphormerBias")
class GraphormerBiasEncoder(nn.Module):
    """Graphormer spatial bias + degree embeddings + graph token
    (reference graphormer_encoder.py:103-275). Writes the per-head additive
    attention bias into ``batch.extras['attn_bias']`` and adds degree
    embeddings to x.

    Graph token (reference BiasEncoder:176-183 + NodeEncoder:186-253 +
    add_graph_token:188-208): instead of physically inserting a [CLS] node
    into the flat slot layout (which would shift every edge index), the
    learned token lives in ``batch.extras['graph_token_state']`` (B, d) and is
    prepended to the dense sequence inside each Graphormer layer; the bias is
    padded with the learned per-head token row/column here. The pooling
    ``graph_token`` reads the final token state — semantics identical to the
    reference's dense index-0 token."""

    num_heads: int
    num_spatial_types: int = 20
    num_in_degrees: int = 64
    num_out_degrees: int = 64
    node_degrees_only: bool = False
    use_graph_token: bool = False
    num_edge_types: int = 4

    @nn.compact
    def __call__(self, batch: GraphBatch, x, train: bool):
        init = nn.initializers.normal(0.02)
        if not self.node_degrees_only:
            spatial = batch.extras["spatial_types"].astype(jnp.int32)  # (B, N, N)
            bias = Embed(self.num_spatial_types + 2, self.num_heads,
                            embedding_init=init)(spatial)
            bias = bias.transpose(0, 3, 1, 2)                          # (B,H,N,N)
            spt = batch.extras.get("shortest_path_types")  # (B, N, N, D)
            if spt is not None:
                # edge encodings along shortest paths (reference
                # BiasEncoder:156-175): embed per-hop edge types, mix each
                # hop-distance with its own H×H matrix, sum over hops,
                # normalize by the clamped path length
                H = self.num_heads
                D = spt.shape[-1]
                e_emb = Embed(self.num_edge_types, H, embedding_init=init)(
                    jnp.clip(spt.astype(jnp.int32), 0,
                             self.num_edge_types - 1))
                W = self.param("edge_dis_encoder", init, (D, H, H))
                mixed = jnp.einsum("bnmdh,dhk->bnmk", e_emb, W)  # (B,N,N,H)
                denom = jnp.maximum(spatial.astype(mixed.dtype), 1.0)
                bias = bias + (mixed / denom[..., None]).transpose(0, 3, 1, 2)
            if self.use_graph_token:
                tok_bias = self.param("graph_token_bias", init,
                                      (self.num_heads,))
                B, H, N, _ = bias.shape
                padded = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))
                col = jnp.broadcast_to(tok_bias[None, :, None], (B, H, N + 1))
                padded = padded.at[:, :, :, 0].set(col)   # everyone → token
                padded = padded.at[:, :, 0, :].set(
                    jnp.broadcast_to(tok_bias[None, :, None], (B, H, N + 1)))
                bias = padded                              # token row → all
            batch.extras["attn_bias"] = bias
        in_deg = jnp.clip(batch.pe["in_degrees"][:, 0].astype(jnp.int32), 0,
                          self.num_in_degrees - 1)
        out_deg = jnp.clip(batch.pe["out_degrees"][:, 0].astype(jnp.int32), 0,
                           self.num_out_degrees - 1)
        d = x.shape[-1]
        x = x + Embed(self.num_in_degrees, d, embedding_init=init)(in_deg)
        x = x + Embed(self.num_out_degrees, d, embedding_init=init)(out_deg)
        if self.use_graph_token:
            tok = self.param("graph_token", init, (d,))
            batch.extras["graph_token_state"] = jnp.broadcast_to(
                tok[None, :], (batch.num_graphs, d))
        return x
