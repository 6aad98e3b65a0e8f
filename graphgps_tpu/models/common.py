"""Shared model building blocks: masked norms, MLP, activations.

Masking is load-bearing (SURVEY.md §7.1): the reference's BatchNorm sees only real
nodes because PyG batches are ragged (e.g. gatedgcn_layer.py:72-73); here BatchNorm
statistics are computed over ``mask`` explicitly so padded slots never contaminate
running stats.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import act_dict, register_act

register_act("relu")(nn.relu)
# exact erf GELU: torch nn.GELU() default (jax's default is the tanh
# approximation — a ~1e-3 divergence the reference fixtures would flag)
register_act("gelu")(lambda x: jax.nn.gelu(x, approximate=False))
register_act("silu")(nn.silu)
register_act("swish")(nn.silu)
register_act("tanh")(jnp.tanh)
register_act("elu")(nn.elu)
register_act("lrelu_03")(lambda x: nn.leaky_relu(x, 0.3))
register_act("identity")(lambda x: x)


def get_act(name: str) -> Callable:
    if name == "prelu":  # parametric: handled as leaky relu on TPU path
        return lambda x: nn.leaky_relu(x, 0.25)
    return act_dict[name]


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mxu_take(num: int, emb: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(emb, ids, axis=0)


def _mxu_take_fwd(num, emb, ids):
    return jnp.take(emb, ids, axis=0), ids


def _mxu_take_bwd(num, ids, g):
    # dE = onehot(ids)^T @ g — a dot_general whose contraction runs over the
    # (large) row axis: MXU work instead of a TPU scatter-add. The profiled
    # flagship step paid ~31 µs/step in the two TypeDict embedding-gradient
    # scatters; this matmul class is ~2 µs.
    oh = jax.nn.one_hot(ids.reshape(-1), num, dtype=g.dtype)
    demb = oh.T @ g.reshape(-1, g.shape[-1])
    return demb, None


_mxu_take.defvjp(_mxu_take_fwd, _mxu_take_bwd)


class Embed(nn.Embed):
    """``nn.Embed`` whose gradient is a one-hot MXU matmul, not a scatter.

    Forward is the standard gather (the one-hot *forward* measured slower at
    GraphGPS vocab sizes); only the VJP changes — the same per-type f32 sum
    up to summation order (parity-tested in tests/test_models.py).
    Same class name as flax's, so module paths/param trees stay ``Embed_N``.
    Falls back to the plain gather/scatter above ``mxu_max_types`` (one-hot
    width stops paying at ogbg-code2's 5002-token vocabulary).
    """

    mxu_max_types: int = 256

    def __call__(self, inputs: jax.Array) -> jax.Array:
        if self.num_embeddings > self.mxu_max_types:
            return super().__call__(inputs)
        return _mxu_take(self.num_embeddings, self.embedding, inputs)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over masked rows with running statistics.

    ``mask`` selects real rows; padded rows neither contribute to statistics nor
    receive gradients through them (they are normalized with the same stats but
    downstream ops mask them out).

    Cross-replica semantics (SURVEY.md §7.3.7): under data parallelism the
    statistics are computed inside the global-view jitted graph over the FULL
    global batch — XLA inserts the cross-device reductions — so this is
    sync-BN by construction, matching the reference's single-device BN math at
    any device count (verified by tests/test_parallel.py DP-equality).
    """

    momentum: float = 0.9
    eps: float = 1e-5
    # stats_only=True: compute/update the statistics exactly as usual but
    # return (mean, var, scale, bias) instead of applying — the apply (+act,
    # dropout, residual) then runs inside a fused Pallas tail kernel
    # (ops/pallas/fused_tail.py). Same params/variables, same names.
    stats_only: bool = False

    @nn.compact
    def __call__(self, x: Optional[jax.Array], mask: Optional[jax.Array],
                 train: bool, moments: Optional[tuple] = None) -> jax.Array:
        # moments=(sy, syy, cnt, c): precomputed masked moment sums
        # Σm·(v−c) / Σm·(v−c)² (e.g. the fused GatedGCN kernel's partial
        # outputs) with the SAME shift c this module would use (its running
        # mean, stop-gradient'ed). Skips the in-module reduction; everything
        # else (running-stats update, scale/bias, apply) is unchanged.
        d = x.shape[-1] if x is not None else moments[0].shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((d,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((d,)))
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        # statistics in f32 regardless of input dtype (bf16 policy-safe);
        # output returns to x.dtype so bf16 activations keep flowing
        xf = x.astype(jnp.float32) if x is not None else None
        if train:
            if moments is not None:
                sy, syy, cnt, c = moments
                ey = sy.reshape(-1) / cnt
                ey2 = syy.reshape(-1) / cnt
                mean = ey + c
                var = jnp.maximum(ey2 - ey * ey, 0.0)
            elif mask is None:
                mean = xf.mean(axis=0)
                var = xf.var(axis=0)
            else:
                # single-pass moments: one masked reduction over [x−c, (x−c)²]
                # instead of two SEQUENTIAL ones (the two-pass var needs mean
                # first, serializing op-count-bound steps). The shift by
                # c = running mean keeps E[y²]−E[y]² well-conditioned even
                # when |mean| ≫ std (raw E[x²]−mean² cancels catastrophically
                # there); c tracks the batch mean, so y is near-centered.
                c = jax.lax.stop_gradient(ra_mean.value)
                y = xf - c
                m = mask.astype(jnp.float32)[:, None]
                cnt = jnp.maximum(m.sum(), 1.0)
                mom = (jnp.concatenate([y, y * y], axis=-1) * m
                       ).sum(axis=0) / cnt
                ey, ey2 = mom[:d], mom[d:]
                mean = ey + c
                var = jnp.maximum(ey2 - ey * ey, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        if self.stats_only:
            return mean, var, scale, bias
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class MaskedLayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        # dtype=x.dtype keeps bf16 activations bf16 (flax computes the
        # normalization statistics in f32 internally either way)
        return nn.LayerNorm(epsilon=self.eps, dtype=x.dtype)(x)


class Norm(nn.Module):
    """Dispatch: batch_norm / layer_norm / none, uniform call signature."""

    batch_norm: bool = True
    layer_norm: bool = False
    eps: float = 1e-5
    momentum: float = 0.9
    stats_only: bool = False  # batch_norm only; see MaskedBatchNorm

    @nn.compact
    def __call__(self, x, mask, train: bool, moments=None):
        if self.layer_norm:
            return MaskedLayerNorm(eps=self.eps)(x, mask, train)
        if self.batch_norm:
            return MaskedBatchNorm(eps=self.eps, momentum=self.momentum,
                                   stats_only=self.stats_only)(
                                       x, mask, train, moments)
        return x


class MLP(nn.Module):
    """L-layer MLP with activation between layers."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    act: str = "relu"
    with_final_act: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        a = get_act(self.act)
        for i in range(self.num_layers - 1):
            x = a(nn.Dense(self.hidden_dim, use_bias=self.use_bias)(x))
        x = nn.Dense(self.out_dim, use_bias=self.use_bias)(x)
        if self.with_final_act:
            x = a(x)
        return x


def dropout(x, rate: float, deterministic: bool, rng_collection: str = "dropout"):
    if rate == 0.0:
        return x
    return nn.Dropout(rate=rate, deterministic=deterministic)(x)
