"""The GPS layer: local MPNN ‖ global attention → sum → FFN.

TPU-native redesign of /root/reference/graphgps/layer/gps_layer.py:16-264. Key
differences from the reference:
- no per-layer ragged→dense round trip: the dense attention view is a free
  reshape of the canonical flat padded layout (data/graph.py);
- the local and global branches read the SAME node tensor and are summed, with
  dropout+residual+norm per branch, then a 2-layer FFN — identical math;
- Performer projection redraw and BigBird random-block plans use explicit,
  step-deterministic randomness (SURVEY.md §7.3.4).
"""
from __future__ import annotations

from typing import Optional

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.graph import GraphBatch
from ..ops import favor
from ..ops.bigbird import bigbird_block_mask
from ..ops.mha import mha_core, merge_heads, split_heads
from ..ops.pallas.flash_mha import mha as mha_dispatch
from .common import Norm, get_act
from .local_gnn import (GATLayer, GCNLayer, GENConvLayer, GINELayer, GINLayer,
                        GatedGCNLayer, PNALayer)

LOCAL_TYPES = ("None", "GCN", "GIN", "GENConv", "GINE", "GAT", "PNA",
               "CustomGatedGCN")
GLOBAL_TYPES = ("None", "Transformer", "BiasedTransformer", "Performer", "BigBird")


class GPSLayer(nn.Module):
    dim_h: int
    local_gnn_type: str
    global_model_type: str
    num_heads: int
    layer_index: int = 0
    act: str = "relu"
    pna_degrees: tuple = ()
    equivstable_pe: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    norm_eps: float = 1e-5  # standalone BigBird threads gt.bigbird.layer_norm_eps
    log_attn_weights: bool = False
    # dense attention implementation: auto / dense / ring (node-axis SP over
    # the mesh 'model' axis, parallel/ring_attention.py)
    attn_impl: str = "auto"
    # performer
    performer_nb_features: Optional[int] = None
    performer_redraw_interval: int = 1000
    # local-window heads (reference performer_layer.py:421-513): the LAST
    # ``local_heads`` heads attend within ±1 bucket of ``local_window`` nodes
    # instead of FAVOR+ (LocalAttention window semantics, look_forward=1;
    # the rel-pos embedding extra is omitted — node order carries no signal)
    performer_local_heads: int = 0
    performer_local_window: int = 256
    # base seed for the FAVOR+ random projections — derived from the run seed
    # (fixing VERDICT weak #7: a hard-coded key gave identical random features
    # across all seeds)
    performer_key_seed: int = 7919
    # bigbird
    bigbird_block_size: int = 3
    bigbird_num_random_blocks: int = 3
    bigbird_attention_type: str = "block_sparse"  # or "original_full"

    def _attn_params(self, d):
        """Packed attention parameters (see the COMPAT NOTE at the use
        site). self.param is idempotent, so both the merged-front path and
        the attention section may call this; whoever runs first creates
        them, identically."""
        wqkv = self.param(
            "qkv_kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=0,
                out_axis=(1, 2)), (d, 3, d))
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3, d))
        wo = self.param("out_kernel", nn.initializers.lecun_normal(),
                        (d, d))
        bo = self.param("out_bias", nn.initializers.zeros, (d,))
        return wqkv, bqkv, wo, bo

    def _attn_tail(self, batch, h_in, h_attn, train: bool, defer: bool):
        """dropout+residual then post-norm of the attention branch
        (reference gps_layer.py:138-160). When ``defer``, the norm runs
        stats_only (same params/variables) and the apply is fused into the
        combine+FFN kernel; returns (s_attn, mu, inv, gamma, beta)."""
        s = self._drop_add(h_in, h_attn, train)
        if not defer:
            return Norm(batch_norm=self.batch_norm,
                        layer_norm=self.layer_norm,
                        eps=self.norm_eps)(s, batch.node_mask, train)
        mu, va, sc, bi = Norm(batch_norm=self.batch_norm, stats_only=True,
                              eps=self.norm_eps)(s, batch.node_mask, train)
        return (s, mu, jax.lax.rsqrt(va + self.norm_eps), sc, bi)

    def _drop_add(self, x_in, v, train: bool):
        """x_in + dropout(v): fused Pallas kernel (on-chip PRNG, one pass)
        when the dropout is active and the shape qualifies; plain XLA
        otherwise. Semantically identical either way (bits differ)."""
        from ..ops.pallas.fused_tail import (fused_drop_add_spmd
                                             as fused_drop_add,
                                             tail_eligible)

        rate = self.dropout if train else 0.0
        if (rate > 0.0 and v.ndim == 2
                and tail_eligible(v.shape[0], v.shape[1])):
            seed = jax.random.bits(self.make_rng("dropout"), (),
                                   jnp.uint32).astype(jnp.int32)
            return fused_drop_add(x_in, v, seed, rate)
        return x_in + nn.Dropout(self.dropout, deterministic=not train)(v)

    @nn.compact
    def __call__(self, batch: GraphBatch, x: jax.Array, e: Optional[jax.Array],
                 train: bool, step: Optional[jax.Array] = None,
                 layer_idx: Optional[jax.Array] = None):
        # ``layer_idx``: traced per-layer index used under nn.scan (where the
        # static self.layer_index is shared by every layer of the stack)
        from ..ops.pallas.fused_combine import combine_eligible
        from ..parallel.mesh import constrain_nodes
        from .local_gnn import DeferredXTail, MergedFront
        x = constrain_nodes(x)  # pin canonical DP layout at layer boundary
        h_in = x
        d = self.dim_h
        outs = []
        deferred_local = None   # DeferredXTail → combine+FFN kernel fuses
        deferred_attn = None    # (s_attn, mu, inv, gamma, beta)

        # ---- local MPNN branch ------------------------------------------------
        lt = self.local_gnn_type
        if lt != "None":
            if lt == "CustomGatedGCN":
                # GatedGCN handles its own norm/act/dropout/residual and returns
                # updated edge features (reference gps_layer.py:163-174).
                # When the branch-combine+FFN kernel applies, the x tail is
                # DEFERRED into it (ops/pallas/fused_combine.py) — one launch
                # for tail + attn norm-apply + branch sum + FFN.
                want_defer = (self.global_model_type != "None"
                              and self.batch_norm and not self.layer_norm
                              and (d % 128 == 0
                                   or (train and self.dropout > 0))
                              and combine_eligible(x.shape[0], d, self.act))
                # MERGED front (core + attention in one kernel,
                # ops/pallas/fused_layer.py): hand the attention weights
                # into the GatedGCN call as plain arrays. Same dispatch
                # envelope as the v1 fused attention.
                attn_pack = None
                from ..ops.pallas.fused_layer import fused_front_eligible
                from ..ops.pallas.fused_tail import tail_eligible
                if (want_defer and self.global_model_type == "Transformer"
                        and not self.log_attn_weights
                        and self.attn_impl in ("fused", "auto")
                        and d % self.num_heads == 0
                        and (jax.default_backend() == "tpu"
                             or os.environ.get("GGPS_FUSED_FRONT") == "1")
                        # the FULL merged envelope, checked here so the
                        # attention params are created exactly once: with
                        # attn_pack set, GatedGCNLayer is guaranteed to
                        # take the merged path (its internal gate checks
                        # the same conditions)
                        and fused_front_eligible(batch, x, e, d,
                                                 self.num_heads,
                                                 self.equivstable_pe)
                        and tail_eligible(x.shape[0], d, self.act)
                        and e is not None
                        and tail_eligible(e.shape[0], d, self.act)):
                    wqkv_m, bqkv_m, wo_m, bo_m = self._attn_params(d)
                    ca = jnp.zeros((d,), jnp.float32)
                    if not self.is_initializing():
                        bs = self.variables.get("batch_stats", {})
                        nb = bs.get("Norm_0", {}).get("MaskedBatchNorm_0",
                                                      {})
                        if "mean" in nb:
                            ca = jax.lax.stop_gradient(nb["mean"])
                    attn_rate = self.attn_dropout if train else 0.0
                    drop_rate = self.dropout if train else 0.0
                    if attn_rate > 0.0 or drop_rate > 0.0:
                        seed = jax.random.bits(self.make_rng("dropout"), (),
                                               jnp.uint32).astype(jnp.int32)
                    else:
                        seed = jnp.zeros((), jnp.int32)
                    attn_pack = dict(
                        wqkv=wqkv_m.reshape(d, 3 * d),
                        bqkv=bqkv_m.reshape(3 * d), wo=wo_m, bo=bo_m,
                        ca=ca, seed=seed, H=self.num_heads,
                        scale=1.0 / float(d // self.num_heads) ** 0.5,
                        attn_rate=attn_rate, drop_rate=drop_rate)
                h_local, e = GatedGCNLayer(
                    dim=d, dropout=self.dropout, residual=True, act=self.act,
                    equivstable_pe=self.equivstable_pe,
                    batch_norm=self.batch_norm,
                    defer_x_tail=want_defer)(batch, x, e, train,
                                             attn_pack=attn_pack)
                if isinstance(h_local, MergedFront):
                    mf = h_local
                    deferred_local, h_local = mf.x_tail, None
                    # finalize the attention-branch BatchNorm from the
                    # kernel's moment partials (same Norm module/params as
                    # the unmerged path — Norm_0 in this dispatch scope)
                    cnt_n = jnp.maximum(
                        batch.node_mask.astype(jnp.float32).sum(), 1.0)
                    mu_a, va, sc_a, bi_a = Norm(
                        batch_norm=True, stats_only=True,
                        eps=self.norm_eps)(
                            None, batch.node_mask, train,
                            (mf.pa[0, :d], mf.pa[0, d:], cnt_n, ca))
                    deferred_attn = (mf.s_attn, mu_a,
                                     jax.lax.rsqrt(va + self.norm_eps),
                                     sc_a, bi_a)
                elif isinstance(h_local, DeferredXTail):
                    deferred_local, h_local = h_local, None
            else:
                if lt == "GINE":
                    h_local, _ = GINELayer(dim=d, act=self.act,
                                           equivstable_pe=self.equivstable_pe)(
                                               batch, x, e, train)
                elif lt == "GIN":
                    h_local, _ = GINLayer(dim=d, act=self.act)(batch, x, e, train)
                elif lt == "GCN":
                    h_local, _ = GCNLayer(dim=d)(batch, x, e, train)
                elif lt == "GAT":
                    h_local, _ = GATLayer(dim=d, heads=self.num_heads)(
                        batch, x, e, train)
                elif lt == "GENConv":
                    h_local, _ = GENConvLayer(dim=d)(batch, x, e, train)
                elif lt == "PNA":
                    h_local, _ = PNALayer(dim=d, degrees=tuple(self.pna_degrees))(
                        batch, x, e, train)
                else:
                    raise ValueError(f"unknown local gnn {lt}")
                h_local = self._drop_add(h_in, h_local, train)
                h_local = Norm(batch_norm=self.batch_norm,
                               layer_norm=self.layer_norm,
                               eps=self.norm_eps)(
                                   h_local, batch.node_mask, train)
            if h_local is not None:
                outs.append(h_local)

        # ---- global attention branch -----------------------------------------
        gt = self.global_model_type
        if deferred_attn is not None:
            gt = "None"   # the merged front kernel already ran attention
        if gt != "None":
            B, N = batch.num_graphs, batch.max_nodes
            H, Dh = self.num_heads, d // self.num_heads
            xd = batch.dense_view(x)                       # (B, N, d) free reshape
            kmask = batch.dense_view(batch.node_mask)      # (B, N)
            # Packed QKV + output projection as explicit params (ONE (d,3d)
            # MXU matmul instead of three; same init distribution as three
            # lecun-normal Dense layers). Every attn impl — dense/chunked/
            # flash dispatch, ring, fused Pallas, Performer, BigBird — shares
            # this parameterization, so checkpoints and the dryrun's
            # cross-impl loss-parity assertion hold across impl switches.
            # TP rule: parallel/tensor.py shards qkv_kernel's last axis
            # (heads) over 'model'.
            # COMPAT NOTE (round 4): this re-parameterization renamed the
            # attn params (was: three Dense QKV + one out-proj Dense) and
            # shifted auto-numbered Dense indices — checkpoints written
            # before it (auto_resume dirs, pretrained.dir) do not restore
            # against the new pytree. Pre-1.0 break, accepted; re-save via
            # a fresh run rather than migrating old trees.
            wqkv, bqkv, wo, bo = self._attn_params(d)

            # fused Pallas path: QKV proj + masked MHA + out proj in one
            # kernel (ops/pallas/fused_gps_attn.py) — dispatched for small-N
            # Transformer shapes where it beats the XLA path (device-clock
            # A/B, docs/RESULTS.md round 4)
            from ..ops.pallas.fused_gps_attn import (fused_auto_wins,
                                                     fused_eligible,
                                                     fused_gps_attention_spmd
                                                     as fused_gps_attention)
            from ..ops.pallas.spmd import dp_compatible
            use_fused = (gt == "Transformer"
                         and jax.default_backend() == "tpu"
                         and dp_compatible(B)  # no mesh, or pure-DP shard_map
                         # (ops/pallas/spmd.py); TP meshes shard qkv_kernel
                         # and keep the XLA path
                         and self.attn_impl in ("fused", "auto")
                         and fused_eligible(
                             N, d, H, bias=None,
                             return_attn=self.log_attn_weights)
                         and (self.attn_impl == "fused"
                              or fused_auto_wins(B, N, d)))
            if self.attn_impl == "fused" and not use_fused:
                raise ValueError(
                    "gt.attn_impl='fused' needs TPU + Transformer global "
                    f"attention + N≤128, lane-aligned dims (got N={N}, "
                    f"d={d}, log_attn_weights={self.log_attn_weights})")
            if use_fused:
                rate = self.attn_dropout if train else 0.0
                if rate > 0.0:
                    seed = jax.random.bits(
                        self.make_rng("dropout"), (), jnp.uint32
                    ).astype(jnp.int32)
                else:
                    seed = jnp.zeros((), jnp.int32)
                od = fused_gps_attention(
                    xd, kmask.astype(xd.dtype), wqkv.reshape(d, 3 * d),
                    bqkv.reshape(3 * d), wo, bo, seed, H, rate)
                h_attn = batch.flat_view(od)
                if deferred_local is not None:
                    deferred_attn = self._attn_tail(batch, h_in, h_attn,
                                                    train, True)
                else:
                    outs.append(self._attn_tail(batch, h_in, h_attn,
                                                train, False))
                gt = "None"  # skip the unfused attention tail below

            if gt != "None":
                # WIDE graphs (128 < N ≤ 768): head-packed flash kernel with
                # KV chunking + count-based masks (ops/pallas/fused_attn_wide)
                # — beats both dense (huge HBM scores) and per-head chunked
                # (Dh ≪ 128 lane waste). Per-head Dh padding keeps the packed
                # layout exact at d=96-style widths.
                from ..ops.pallas.fused_attn_wide import (
                    fused_wide_attention_spmd, wide_eligible)
                from ..ops.pallas.fused_gps_attn import pad_heads
                dp_w = -(-d // 128) * 128
                if (jax.default_backend() == "tpu"
                        and self.attn_impl == "auto"
                        and not self.log_attn_weights
                        and dp_w % H == 0 and (dp_w // H) % 8 == 0
                        and wide_eligible(B, N, dp_w, H)):
                    padded = pad_heads(wqkv, bqkv, wo, bo, H)
                    if padded is not None:
                        wq_p, bq_p, wo_p, bo_p, dp_w = padded
                        rate = self.attn_dropout if train else 0.0
                        if rate > 0.0:
                            seed = jax.random.bits(
                                self.make_rng("dropout"), (),
                                jnp.uint32).astype(jnp.int32)
                        else:
                            seed = jnp.zeros((), jnp.int32)
                        counts = kmask.astype(jnp.int32).sum(axis=1)
                        xd_p = (jnp.pad(xd, ((0, 0), (0, 0),
                                             (0, dp_w - d)))
                                if dp_w != d else xd)
                        od = fused_wide_attention_spmd(
                            xd_p, counts, wq_p, bq_p, wo_p, bo_p, seed, H,
                            1.0 / float(d // H) ** 0.5, rate)[..., :d]
                        h_attn = batch.flat_view(od)
                        if deferred_local is not None:
                            deferred_attn = self._attn_tail(
                                batch, h_in, h_attn, train, True)
                        else:
                            outs.append(self._attn_tail(
                                batch, h_in, h_attn, train, False))
                        gt = "None"

        if gt != "None":
            qkv = xd @ wqkv.reshape(d, 3 * d) + bqkv.reshape(3 * d)
            q = split_heads(qkv[..., :d], H)
            k = split_heads(qkv[..., d:2 * d], H)
            v = split_heads(qkv[..., 2 * d:], H)

            if gt in ("Transformer", "BiasedTransformer"):
                bias = None
                if gt == "BiasedTransformer":
                    bias = batch.extras["attn_bias"]       # (B, H, N, N)
                if self.attn_impl == "ring":
                    from ..parallel.mesh import current_mesh
                    from ..parallel.ring_attention import ring_mha
                    mesh = current_mesh()
                    if mesh is None or mesh.shape.get("model", 1) < 2:
                        raise ValueError(
                            "gt.attn_impl='ring' needs a mesh with model axis"
                            " ≥ 2 (set parallel.model_axis)")
                    if bias is not None or (train and self.attn_dropout > 0):
                        raise ValueError("ring attention supports neither "
                                         "attention bias nor attn_dropout")
                    # keep the batch dim data-parallel inside the ring
                    # shard_map when it divides evenly — avoids a per-layer
                    # replicate/reshard of q/k/v and the bool mask
                    dsz = mesh.shape.get("data", 1)
                    batch_axis = "data" if (dsz > 1 and B % dsz == 0) else None
                    o = ring_mha(q, k, v, kmask, mesh, axis="model",
                                 batch_axis=batch_axis)
                else:
                    rng = (self.make_rng("dropout")
                           if train and self.attn_dropout > 0 else None)
                    o = mha_dispatch(
                        q, k, v, kmask, bias=bias,
                        dropout_rate=self.attn_dropout if train else 0.0,
                        dropout_rng=rng,
                        return_attn=self.log_attn_weights,
                        impl=self.attn_impl)
                    if self.log_attn_weights:
                        o, attn = o
                        self.sow("intermediates", "attn_weights", attn)
            elif gt == "Performer":
                lh = min(self.performer_local_heads, H)
                gh = H - lh
                outs_p = []
                if gh > 0:
                    m = self.performer_nb_features or int(
                        Dh * np.log(max(Dh, 2)))
                    idx = (layer_idx if layer_idx is not None
                           else self.layer_index)
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(self.performer_key_seed), idx)
                    proj = favor.draw_projection(
                        key, step if train else None,
                        self.performer_redraw_interval, m, Dh)
                    outs_p.append(favor.favor_attention(
                        q[:, :gh], k[:, :gh], v[:, :gh], kmask, proj))
                if lh > 0:
                    # bucketed local attention on the last lh heads
                    # (reference performer_layer.py:455-459, 496-499);
                    # attn_dropout applies like the reference LocalAttention's
                    # dropout arg
                    bucket = jnp.arange(N) // self.performer_local_window
                    band = jnp.abs(bucket[:, None] - bucket[None, :]) <= 1
                    bias = jnp.where(band, 0.0, -1e30)[None, None]
                    lrng = (self.make_rng("dropout")
                            if train and self.attn_dropout > 0 else None)
                    outs_p.append(mha_core(
                        q[:, gh:], k[:, gh:], v[:, gh:], kmask, bias=bias,
                        dropout_rate=self.attn_dropout if train else 0.0,
                        dropout_rng=lrng))
                o = outs_p[0] if len(outs_p) == 1 else jnp.concatenate(
                    outs_p, axis=1)
            elif gt == "BigBird":
                rng = (self.make_rng("dropout")
                       if train and self.attn_dropout > 0 else None)
                drop = self.attn_dropout if train else 0.0
                if self.bigbird_attention_type == "original_full":
                    # dense O(N²) fallback (reference bigbird_layer.py:115-218)
                    o = mha_core(q, k, v, kmask, dropout_rate=drop,
                                 dropout_rng=rng)
                elif self.bigbird_attention_type == "block_sparse":
                    from ..ops.pallas.splash_bigbird import bigbird_attention
                    o = bigbird_attention(
                        q, k, v, kmask, self.bigbird_block_size,
                        self.bigbird_num_random_blocks, seed=self.layer_index,
                        dropout_rate=drop, dropout_rng=rng)
                else:
                    raise ValueError(
                        f"unknown bigbird attention_type "
                        f"{self.bigbird_attention_type!r}")
            else:
                raise ValueError(f"unknown global model {gt}")

            h_attn = batch.flat_view(merge_heads(o))
            if self.attn_impl == "ring":
                # ring output's node axis is sharded data×model jointly;
                # re-pin the canonical DP layout so the reshard (fwd + bwd)
                # lowers as a single all-gather over 'model'
                from ..parallel.mesh import constrain_nodes
                h_attn = constrain_nodes(h_attn)
            h_attn = h_attn @ wo + bo                     # output projection
            if deferred_local is not None:
                deferred_attn = self._attn_tail(batch, h_in, h_attn,
                                                train, True)
            else:
                outs.append(self._attn_tail(batch, h_in, h_attn,
                                            train, False))

        h = sum(outs) if outs else x

        # ---- FFN --------------------------------------------------------------
        from ..ops.pallas.fused_tail import (fused_ffn_padded as fused_ffn,
                                             tail_eligible)
        a = get_act(self.act)
        dense1, dense2 = nn.Dense(d * 2), nn.Dense(d)
        if deferred_local is not None:
            # branch-combine + FFN in ONE kernel (ops/pallas/fused_combine):
            # local x-tail apply + attention norm-apply + branch sum + the
            # whole FFN block never leave VMEM. Probe rows create the same
            # Dense_0/Dense_1 params as the unfused path.
            from ..ops.pallas.fused_combine import fused_combine_ffn_padded
            assert deferred_attn is not None, \
                "combine kernel needs the attention branch deferred too"
            _ = dense1(deferred_local.x_in[:1])
            _ = dense2(jnp.zeros((1, d * 2), deferred_local.x_in.dtype))
            k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
            b = lambda m: m.variables["params"]["bias"]     # noqa: E731
            rate = self.dropout if train else 0.0
            if rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), (),
                                       jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            s_attn, mu_a, inv_a, sc_a, bi_a = deferred_attn
            dl = deferred_local
            h = fused_combine_ffn_padded(
                dl.x_in, dl.v, dl.mu, dl.inv, dl.gamma, dl.beta,
                s_attn, mu_a, inv_a, sc_a, bi_a,
                k(dense1), b(dense1), k(dense2), b(dense2),
                seed, rate, self.act)
        elif (tail_eligible(h.shape[0], d, self.act) and h.ndim == 2
                and (d % 128 == 0 or (train and self.dropout > 0))):
            # whole FFN block in one Pallas kernel (both matmuls, act, both
            # dropouts, residual — the (R, 2d) intermediate never leaves
            # VMEM). Probe rows create the identical Dense_0/Dense_1 params.
            _ = dense1(h[:1])
            _ = dense2(jnp.zeros((1, d * 2), h.dtype))
            k = lambda m: m.variables["params"]["kernel"]   # noqa: E731
            b = lambda m: m.variables["params"]["bias"]     # noqa: E731
            rate = self.dropout if train else 0.0
            if rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), (),
                                       jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            h = fused_ffn(h, k(dense1), b(dense1), k(dense2), b(dense2),
                          seed, rate, self.act)
        else:
            h2 = dense1(h)
            h2 = nn.Dropout(self.dropout, deterministic=not train)(a(h2))
            h2 = dense2(h2)
            h2 = nn.Dropout(self.dropout, deterministic=not train)(h2)
            h = h + h2
        h = Norm(batch_norm=self.batch_norm, layer_norm=self.layer_norm,
                 eps=self.norm_eps)(
            h, batch.node_mask, train)
        # zero padded slots so they never leak into aggregations
        h = jnp.where(batch.node_mask[:, None], h, 0.0)
        # layer-boundary constraint: within-layer shardings (TP FFN
        # intermediates, edge-partitioned aggregations, ring attention) meet
        # here at a single well-defined reshard instead of letting SPMD
        # propagate exotic layouts into the next layer's backward pass
        h = constrain_nodes(h)
        return h, e


class GPSScanBody(nn.Module):
    """nn.scan body: one GPSLayer per step with (x, e) as the carry.

    Tracing the layer ONCE instead of L times cuts XLA compile time ~L-fold
    for deep stacks (compiles through this environment's remote-compile
    tunnel cost minutes). The per-layer index rides the scan input so
    Performer projection keys stay layer-distinct; BigBird (host-side static
    random plans keyed by layer) requires the unrolled path.
    """

    layer_kwargs: dict

    @nn.compact
    def __call__(self, carry, batch, train, step, idx):
        x, e = carry
        x, e = GPSLayer(layer_index=0, **self.layer_kwargs)(
            batch, x, e, train, step, layer_idx=idx)
        return (x, e), None
