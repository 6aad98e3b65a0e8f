"""Local message-passing layers over the flat padded CSR edge list.

TPU-native re-derivations of the reference's PyG conv zoo
(/root/reference/graphgps/layer/gatedgcn_layer.py:11-137, gine_conv_layer.py:11-132,
and the GCN/GIN/GAT/PNA/GENConv options selected in gps_layer.py:43-99). Every
layer is: gather sender/receiver rows → edge compute (VPU/MXU) → masked
segment-aggregate to receivers. Signature: ``(batch, x, e, train) → (x', e')``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch
from ..ops.segment import (gather, segment_max, segment_mean, segment_min,
                           segment_softmax, segment_sum)


def _seg_kw(batch: GraphBatch) -> dict:
    """Blocked-segment dispatch info (ops/segment.py blocked_segment_sum):
    device-assembled batches carry per-graph edge slots, turning segment sums
    into block-diagonal MXU matmuls instead of TPU scatters."""
    return dict(edge_block=batch.edge_block, max_nodes=batch.max_nodes)


def _gx(batch: GraphBatch, x, idx):
    """Neighbor-row fetch x[idx] through ops.segment.gather so the blocked
    layout turns it (and its backward scatter-add) into block MXU matmuls."""
    return gather(x, idx, edge_block=batch.edge_block,
                  max_nodes=batch.max_nodes)
from ..registry import register_layer
from .common import MLP, Norm, get_act


def _es_pe_scale(batch: GraphBatch, mlp: nn.Module) -> Optional[jax.Array]:
    """EquivStableLapPE edge-message scaling r_ij = MLP(‖PE_i−PE_j‖²)
    (reference gatedgcn_layer.py:88-107, gine_conv_layer.py:60-87)."""
    pe = batch.pe.get("pe_EquivStableLapPE")
    if pe is None:
        return None
    diff = _gx(batch, pe, batch.senders) - _gx(batch, pe, batch.receivers)
    return mlp(jnp.sum(diff * diff, axis=-1, keepdims=True))


class MergedFront(NamedTuple):
    """GatedGCNLayer's return when the MERGED layer-front kernel ran
    (ops/pallas/fused_layer.py): the deferred x-tail PLUS the attention
    branch's pre-norm residual sum and its moment partials — the GPS layer
    skips its own attention computation and feeds these straight into the
    combine+FFN kernel."""

    x_tail: "DeferredXTail"
    s_attn: jax.Array        # (S, d) flat: x + dropout(attn_out)
    pa: jax.Array            # (1, 2d) masked moment partials of s_attn


class DeferredXTail(NamedTuple):
    """GatedGCNLayer's x-tail handed to the caller unapplied: the GPS layer
    fuses it (BN-apply + act + dropout + residual) into the branch-combine
    + FFN kernel (ops/pallas/fused_combine.py) instead of a standalone
    fused_pre_tail launch. ``inv`` is rsqrt(var + eps)."""

    x_in: jax.Array
    v: jax.Array            # pre-norm node update (Ax + num/den)
    mu: jax.Array
    inv: jax.Array
    gamma: jax.Array
    beta: jax.Array


@register_layer("gatedgcnconv")
class GatedGCNLayer(nn.Module):
    """Residual gated graph convnet (Bresson & Laurent) — updates BOTH node and
    edge features (reference gatedgcn_layer.py:11-137)."""

    dim: int
    dropout: float = 0.0
    residual: bool = True
    act: str = "relu"
    equivstable_pe: bool = False
    batch_norm: bool = True
    # GPS-layer fusion hook: when True AND the fused-tail path is active,
    # return (DeferredXTail, e_new) instead of applying the x tail here
    # (the e tail always applies). Callers must handle the plain-tensor
    # return when the fused path is ineligible.
    defer_x_tail: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool,
                 attn_pack: Optional[dict] = None):
        from ..ops.pallas.fused_gatedgcn import (fused_gatedgcn_eligible,
                                                 fused_gatedgcn_padded
                                                 as fused_gatedgcn)

        x_in, e_in = x, e
        ggcn_moments = None
        merged_attn = None
        dA, dB, dC, dD, dE = (nn.Dense(self.dim) for _ in range(5))

        # ---- MERGED layer front: core + attention in ONE kernel ---------
        # (ops/pallas/fused_layer.py). attn_pack carries the GPS layer's
        # attention weights/rates as plain arrays — no param-tree change.
        use_merged = False
        if attn_pack is not None and self.defer_x_tail:
            from ..ops.pallas.fused_layer import (fused_front_eligible,
                                                  fused_gps_front_spmd)
            from ..ops.pallas.fused_tail import tail_eligible
            use_merged = (
                self.batch_norm and self.residual
                and fused_front_eligible(batch, x, e, self.dim,
                                         attn_pack["H"],
                                         self.equivstable_pe)
                and tail_eligible(x.shape[0], self.dim, self.act)
                and tail_eligible(e.shape[0], self.dim, self.act))
        if use_merged:
            for m, src in ((dA, x), (dB, x), (dC, e), (dD, x), (dE, x)):
                m(src[:1])
            k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
            b = lambda m: m.variables["params"]["bias"]     # noqa: E731
            B, N, E = batch.num_graphs, batch.max_nodes, batch.edge_block
            base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
            s_loc = batch.senders.reshape(B, E).astype(jnp.int32) - base
            r_loc = batch.receivers.reshape(B, E).astype(jnp.int32) - base
            em = batch.edge_mask.reshape(B, E).astype(x.dtype)
            nm = batch.node_mask.reshape(B, N).astype(x.dtype)
            cx, cg = (jnp.zeros((self.dim,), jnp.float32),) * 2
            if not self.is_initializing():
                bs = self.variables.get("batch_stats", {})
                cx = jax.lax.stop_gradient(
                    bs["Norm_0"]["MaskedBatchNorm_0"]["mean"])
                cg = jax.lax.stop_gradient(
                    bs["Norm_1"]["MaskedBatchNorm_0"]["mean"])
            wnq = jnp.concatenate(
                [k(dA), k(dD), k(dE), k(dB), attn_pack["wqkv"]], axis=1)
            bnq = jnp.concatenate(
                [b(dA), b(dD), b(dE), b(dB), attn_pack["bqkv"]])
            xo, gate, sa, px, pg, pa = fused_gps_front_spmd(
                x.reshape(B, N, self.dim), e.reshape(B, E, self.dim),
                s_loc, r_loc, em, nm, cx, cg, attn_pack["ca"],
                wnq, bnq, k(dC), b(dC), attn_pack["wo"], attn_pack["bo"],
                attn_pack["seed"], attn_pack["H"], attn_pack["scale"],
                attn_pack["attn_rate"], attn_pack["drop_rate"])
            x_new = xo.reshape(B * N, self.dim)
            e_gate = gate.reshape(B * E, self.dim)
            ggcn_moments = (px, pg, cx, cg)
            merged_attn = (sa.reshape(B * N, self.dim), pa)
        elif fused_gatedgcn_eligible(batch, x, e, self.dim,
                                     self.equivstable_pe):
            # fused Pallas core (ops/pallas/fused_gatedgcn.py): one kernel
            # for projections + gathers + gate + masked segment-sum. Create
            # the SAME Dense_0..4 param pytree by probing each module on one
            # row (output unused → DCE'd), then hand the kernels the raw
            # weights in the kernel's [A|D|E|B] column layout.
            for m, src in ((dA, x), (dB, x), (dC, e), (dD, x), (dE, x)):
                m(src[:1])
            k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
            b = lambda m: m.variables["params"]["bias"]     # noqa: E731
            B, N, E = batch.num_graphs, batch.max_nodes, batch.edge_block
            base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
            s_loc = batch.senders.reshape(B, E).astype(jnp.int32) - base
            r_loc = batch.receivers.reshape(B, E).astype(jnp.int32) - base
            em = batch.edge_mask.reshape(B, E).astype(x.dtype)
            nm = batch.node_mask.reshape(B, N).astype(x.dtype)
            # BatchNorm moment shifts = the Norm_0/Norm_1 running means
            # (exactly what MaskedBatchNorm would use; zeros during init,
            # before the batch_stats collection exists)
            cx, cg = (jnp.zeros((self.dim,), jnp.float32),) * 2
            if self.batch_norm and not self.is_initializing():
                bs = self.variables.get("batch_stats", {})
                cx = jax.lax.stop_gradient(
                    bs["Norm_0"]["MaskedBatchNorm_0"]["mean"])
                cg = jax.lax.stop_gradient(
                    bs["Norm_1"]["MaskedBatchNorm_0"]["mean"])
            xp, gate, px, pg = fused_gatedgcn(
                x.reshape(B, N, self.dim), e.reshape(B, E, self.dim),
                s_loc, r_loc, em, nm, cx, cg,
                k(dA), k(dD), k(dE), k(dB), b(dA), b(dD), b(dE), b(dB),
                k(dC), b(dC))
            x_new = xp.reshape(B * N, self.dim)
            e_gate = gate.reshape(B * E, self.dim)
            ggcn_moments = (px, pg, cx, cg)
        else:
            from ..ops.pallas.fused_edge_gate import (ET, TG,
                                                     edge_gate_eligible,
                                                     fused_edge_gate_spmd
                                                     as fused_edge_gate)

            Ax, Bx, Ce = dA(x), dB(x), dC(e)
            Dx, Ex = dD(x), dE(x)

            if edge_gate_eligible(batch, x, e, self.dim,
                                  self.equivstable_pe):
                # long-graph rung (ops/pallas/fused_edge_gate.py): Linears
                # above in XLA, the memory-bound gather/gate/aggregate
                # middle tiled through VMEM (no (B, E, N) one-hot in HBM)
                dim = self.dim
                dp = -(-dim // 128) * 128
                B, N, E = (batch.num_graphs, batch.max_nodes,
                           batch.edge_block)
                Epad = -(-E // (TG * ET)) * (TG * ET)

                def padf(t):
                    return (jnp.pad(t, ((0, 0), (0, dp - dim)))
                            if dp != dim else t)

                def padE(t2):  # (B, E, ...) → (B, Epad, ...)
                    if Epad == E:
                        return t2
                    return jnp.pad(t2, ((0, 0), (0, Epad - E))
                                   + ((0, 0),) * (t2.ndim - 2))

                base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
                s2 = padE(batch.senders.reshape(B, E).astype(jnp.int32)
                          - base).reshape(B, -1, ET)
                r2 = padE(batch.receivers.reshape(B, E).astype(jnp.int32)
                          - base).reshape(B, -1, ET)
                em2 = padE(batch.edge_mask.reshape(B, E)
                           .astype(x.dtype)).reshape(B, -1, ET)
                ce4 = padE(padf(Ce).reshape(B, E, dp)).reshape(
                    B, -1, ET, dp)
                gate4, nd3 = fused_edge_gate(
                    padf(Dx).reshape(B, N, dp),
                    jnp.concatenate([padf(Ex), padf(Bx)],
                                    axis=-1).reshape(B, N, 2 * dp),
                    ce4, s2, r2, em2)
                e_gate = gate4.reshape(B, Epad, dp)[:, :E, :dim].reshape(
                    B * E, dim)
                num = nd3[:, :, :dim].reshape(B * N, dim)
                den = nd3[:, :, dp:dp + dim].reshape(B * N, dim)
                x_new = Ax + num / (den + 1e-6)
            else:
                s, r = batch.senders, batch.receivers
                # one fused sender gather for Ex and Bx (single (E, 2d)
                # block matmul, mirroring the num/den segment-sum fusion
                # below)
                eb = _gx(batch, jnp.concatenate([Ex, Bx], axis=-1), s)
                e_gate = (_gx(batch, Dx, r) + eb[:, :self.dim]
                          + Ce)                         # (E, d) gate
                sigma = nn.sigmoid(e_gate)
                if self.equivstable_pe:
                    rij = _es_pe_scale(
                        batch, MLP(hidden_dim=self.dim, out_dim=1,
                                   num_layers=2, act="relu"))
                    if rij is not None:
                        sigma = sigma * nn.sigmoid(rij)
                msgs = sigma * eb[:, self.dim:]
                # one fused segment-sum for numerator and denominator: a
                # single (E, 2d) block matmul instead of two (E, d) ones
                nd = segment_sum(jnp.concatenate([msgs, sigma], axis=-1),
                                 r, batch.num_node_slots,
                                 mask=batch.edge_mask, **_seg_kw(batch))
                num, den = nd[:, :self.dim], nd[:, self.dim:]
                x_new = Ax + num / (den + 1e-6)

        from ..ops.pallas.fused_tail import (fused_pre_tail_padded
                                             as fused_pre_tail,
                                             tail_eligible)

        use_ft = (self.batch_norm and self.residual
                  and x_in.shape == x_new.shape and e_in.shape == e_gate.shape
                  # non-lane-aligned widths pay a pad overhead the fusion
                  # only recoups when the dropout PRNG is active (device
                  # A/B: VOC d=96 rate=0 loses 0.9 ms, wins with dropout)
                  and (self.dim % 128 == 0
                       or (train and self.dropout > 0))
                  and tail_eligible(x_new.shape[0], self.dim, self.act)
                  and tail_eligible(e_gate.shape[0], self.dim, self.act))
        if use_ft:
            # fused tail (ops/pallas/fused_tail.py): BN-apply + act + dropout
            # + residual in one kernel per tensor. Statistics (and running
            # stats) keep the exact MaskedBatchNorm semantics via stats_only.
            rate = self.dropout if train else 0.0
            mom_x = mom_e = None
            if ggcn_moments is not None:
                px, pg, cx, cg = ggcn_moments
                cnt_n = jnp.maximum(batch.node_mask.astype(jnp.float32)
                                    .sum(), 1.0)
                cnt_e = jnp.maximum(batch.edge_mask.astype(jnp.float32)
                                    .sum(), 1.0)
                dmd = self.dim
                mom_x = (px[0, :dmd], px[0, dmd:], cnt_n, cx)
                mom_e = (pg[0, :dmd], pg[0, dmd:], cnt_e, cg)
            mx, vx, scx, bix = Norm(batch_norm=True, stats_only=True)(
                x_new, batch.node_mask, train, mom_x)
            me, ve, sce, bie = Norm(batch_norm=True, stats_only=True)(
                e_gate, batch.edge_mask, train, mom_e)
            if rate > 0.0:
                seed_e = jax.random.bits(self.make_rng("dropout"), (),
                                         jnp.uint32).astype(jnp.int32)
            else:
                seed_e = jnp.zeros((), jnp.int32)
            eps = 1e-5  # Norm default
            e_new = fused_pre_tail(e_in, e_gate, me, jax.lax.rsqrt(ve + eps),
                                   sce, bie, seed_e, rate, self.act)
            if self.defer_x_tail:
                # hand the unapplied x tail to the GPS layer's combine+FFN
                # kernel (one launch instead of pre_tail + norm-apply + add)
                deferred = DeferredXTail(x_in=x_in, v=x_new, mu=mx,
                                         inv=jax.lax.rsqrt(vx + eps),
                                         gamma=scx, beta=bix)
                if merged_attn is not None:
                    return MergedFront(x_tail=deferred,
                                       s_attn=merged_attn[0],
                                       pa=merged_attn[1]), e_new
                return deferred, e_new
            if rate > 0.0:
                seed_x = jax.random.bits(self.make_rng("dropout"), (),
                                         jnp.uint32).astype(jnp.int32)
            else:
                seed_x = jnp.zeros((), jnp.int32)
            x_new = fused_pre_tail(x_in, x_new, mx, jax.lax.rsqrt(vx + eps),
                                   scx, bix, seed_x, rate, self.act)
            return x_new, e_new

        a = get_act(self.act)
        x_new = Norm(batch_norm=self.batch_norm, layer_norm=False)(
            x_new, batch.node_mask, train)
        e_new = Norm(batch_norm=self.batch_norm, layer_norm=False)(
            e_gate, batch.edge_mask, train)
        x_new, e_new = a(x_new), a(e_new)
        x_new = nn.Dropout(self.dropout, deterministic=not train)(x_new)
        e_new = nn.Dropout(self.dropout, deterministic=not train)(e_new)
        if self.residual:
            x_new = x_in + x_new
            e_new = e_in + e_new
        return x_new, e_new


@register_layer("gineconv")
class GINELayer(nn.Module):
    """GINEConv (+optional ES-LapPE message scaling): m = relu(x_s + e) [* r_ij],
    out = MLP((1+ε)·x_r + Σ m) (reference gine_conv_layer.py:11-132)."""

    dim: int
    dropout: float = 0.0
    residual: bool = True
    act: str = "relu"
    equivstable_pe: bool = False
    batch_norm: bool = False
    wrap_norm_act: bool = False  # True for custom_gnn-style wrapped layer

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        x_in = x
        eps = self.param("eps", nn.initializers.zeros, ())
        s, r = batch.senders, batch.receivers
        xs = _gx(batch, x, s)
        m = nn.relu(xs + e) if e is not None else nn.relu(xs)
        if self.equivstable_pe:
            rij = _es_pe_scale(batch, MLP(hidden_dim=self.dim, out_dim=1,
                                          num_layers=2, act="relu"))
            if rij is not None:
                m = m * nn.sigmoid(rij)
        agg = segment_sum(m, r, batch.num_node_slots, mask=batch.edge_mask, **_seg_kw(batch))
        h = (1.0 + eps) * x + agg
        h = MLP(hidden_dim=self.dim, out_dim=self.dim, num_layers=2,
                act=self.act)(h)
        if self.wrap_norm_act:
            h = Norm(batch_norm=self.batch_norm)(h, batch.node_mask, train)
            h = get_act(self.act)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            if self.residual:
                h = x_in + h
        return h, e


@register_layer("ginconv")
class GINLayer(nn.Module):
    dim: int
    act: str = "relu"

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        eps = self.param("eps", nn.initializers.zeros, ())
        agg = segment_sum(_gx(batch, x, batch.senders), batch.receivers, batch.num_node_slots,
                          mask=batch.edge_mask, **_seg_kw(batch))
        h = MLP(hidden_dim=self.dim, out_dim=self.dim, num_layers=2,
                act=self.act)((1.0 + eps) * x + agg)
        return h, e


@register_layer("gcnconv")
class GCNLayer(nn.Module):
    """GCN with symmetric degree normalization (self-loops added implicitly)."""

    dim: int

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        s, r = batch.senders, batch.receivers
        h = nn.Dense(self.dim)(x)
        ones = batch.edge_mask.astype(h.dtype)
        deg = segment_sum(ones, r, batch.num_node_slots, **_seg_kw(batch)) + 1.0  # +1 self loop
        dinv = jax.lax.rsqrt(deg)
        # dinv is a function of the constant edge mask only — no gradient
        # flows through it, so plain 1-D takes are strictly cheaper than
        # blocked gathers here (no backward scatter exists to eliminate)
        msgs = _gx(batch, h, s) * dinv[s, None] * dinv[r, None]
        agg = segment_sum(msgs, r, batch.num_node_slots, mask=batch.edge_mask, **_seg_kw(batch))
        return agg + h * (dinv * dinv)[:, None], e


@register_layer("gatconv")
class GATLayer(nn.Module):
    """GAT with per-head scatter-softmax attention over incoming edges."""

    dim: int
    heads: int = 4
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        H, Dh = self.heads, self.dim // self.heads
        s, r = batch.senders, batch.receivers
        h = nn.DenseGeneral((H, Dh))(x)                        # (S, H, Dh)
        a_src = self.param("a_src", nn.initializers.glorot_uniform(), (H, Dh))
        a_dst = self.param("a_dst", nn.initializers.glorot_uniform(), (H, Dh))
        hs, hr = _gx(batch, h, s), _gx(batch, h, r)
        alpha = (hs * a_src).sum(-1) + (hr * a_dst).sum(-1)  # (E, H)
        alpha = nn.leaky_relu(alpha, self.negative_slope)
        attn = segment_softmax(alpha, r, batch.num_node_slots,
                               mask=batch.edge_mask, **_seg_kw(batch))
        msgs = hs * attn[..., None]
        agg = segment_sum(msgs, r, batch.num_node_slots, mask=batch.edge_mask, **_seg_kw(batch))
        return agg.reshape(x.shape[0], H * Dh), e


@register_layer("genconv")
class GENConvLayer(nn.Module):
    """GENConv softmax aggregation: m = relu(x_s + e) + ε;
    agg = Σ softmax_t(m)·m (DeeperGCN)."""

    dim: int
    beta: float = 1.0
    eps: float = 1e-7

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        s, r = batch.senders, batch.receivers
        m = nn.relu(_gx(batch, x, s) + e) + self.eps
        w = segment_softmax(self.beta * m, r, batch.num_node_slots, **_seg_kw(batch),
                            mask=batch.edge_mask)
        agg = segment_sum(w * m, r, batch.num_node_slots, mask=batch.edge_mask, **_seg_kw(batch))
        h = MLP(hidden_dim=self.dim * 2, out_dim=self.dim, num_layers=2)(x + agg)
        return h, e


@register_layer("pnaconv")
class PNALayer(nn.Module):
    """Principal Neighbourhood Aggregation: towers over
    {mean,max,min,std} aggregators × {identity,amplification,attenuation}
    degree-scalers (reference gps_layer.py:74-90; PNAConvSimple semantics)."""

    dim: int
    degrees: Sequence[int] = ()
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    use_edge_feat: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, x, e, train: bool):
        s, r = batch.senders, batch.receivers
        S = batch.num_node_slots
        if self.use_edge_feat and e is not None:
            m = nn.Dense(self.dim)(jnp.concatenate(
                [_gx(batch, x, s), _gx(batch, x, r), e], axis=-1))
        else:
            m = nn.Dense(self.dim)(jnp.concatenate(
                [_gx(batch, x, s), _gx(batch, x, r)], axis=-1))

        # fused sums: [m, m², 1] through ONE segment-sum (a single block
        # matmul) covers mean, std and the degree count below
        d = m.shape[-1]
        ones = batch.edge_mask.astype(x.dtype)
        packed = segment_sum(
            jnp.concatenate([m, m * m, ones[:, None]], axis=-1), r, S,
            mask=batch.edge_mask, **_seg_kw(batch))
        cnt = jnp.maximum(packed[:, -1:], 1e-6)
        mean = packed[:, :d] / cnt
        aggs = []
        for name in self.aggregators:
            if name == "mean":
                aggs.append(mean)
            elif name == "max":
                aggs.append(segment_max(m, r, S, mask=batch.edge_mask,
                                        **_seg_kw(batch)))
            elif name == "min":
                aggs.append(segment_min(m, r, S, mask=batch.edge_mask,
                                        **_seg_kw(batch)))
            elif name == "std":
                sq = packed[:, d:2 * d] / cnt
                aggs.append(jnp.sqrt(nn.relu(sq - mean * mean) + 1e-5))
            elif name == "sum":
                aggs.append(packed[:, :d])
        h = jnp.concatenate(aggs, axis=-1)

        # degree scalers with train-set log-degree statistics
        deg = packed[:, -1]
        if len(self.degrees):
            import numpy as np
            dvals = np.arange(len(self.degrees))
            dcnt = np.array(self.degrees, dtype=np.float64)
            delta = float((np.log(dvals + 1) * dcnt).sum() / max(dcnt.sum(), 1.0))
        else:
            delta = 1.0
        logd = jnp.log(deg + 1.0)[:, None]
        scaled = []
        for name in self.scalers:
            if name == "identity":
                scaled.append(h)
            elif name == "amplification":
                scaled.append(h * (logd / delta))
            elif name == "attenuation":
                scaled.append(h * (delta / jnp.maximum(logd, 1e-5)))
        h = jnp.concatenate(scaled, axis=-1)
        return nn.Dense(self.dim)(h), e
