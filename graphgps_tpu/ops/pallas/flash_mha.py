"""Masked-MHA dispatch for padded graph batches (+ the Pallas flash kernel).

Three interchangeable exact implementations of key-padding-masked MHA (the
capability of the reference's torch MHA,
/root/reference/graphgps/layer/gps_layer.py:199-210):

- **dense** (ops/mha.mha_core): XLA einsum, O(N²) memory;
- **chunked** (ops/chunked_mha): online-softmax over key chunks — exact,
  O(N·chunk) memory, supports bias and attention dropout;
- **flash** (this file): the Pallas TPU kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) with padding expressed
  via SegmentIds (padded tokens segment 0, real tokens segment 1).

Dispatch policy (``mha``, impl='auto') — set by the round-3 HONEST
device-clock A/B (docs/RESULTS.md erratum + re-measurement; earlier
tunnel-confounded timings had called flash a wash):

    fwd+bwd per call, v5e, f32        dense      flash     chunked
    B8 H8 N512  Dh16 (VOC)            2.5-2.7    3.3-4.1   1.8-4.0
    B8 H8 N1024 Dh16 (code2)          12.1       15.8      10.6
    B4 H4 N4992 Dh16 (MalNet)         34.7       45.0      10.8
    B8 H8 N1024 Dh64                  28.3       41.0      23.3

Flash never wins at graph-recipe shapes on this chip — its 128-lane head-dim
padding (8× at Dh=16) and kernel overheads outweigh the memory win — so
'auto' picks DENSE up to N ≤ GGPS_DENSE_MAX_N (default 1024) and within the
GGPS_DENSE_MAX_BYTES score-matrix budget (default 64 MB — round 4 found the
old 2 GB budget let the VOC recipe (32·8·512·512 = 268 MB of f32 scores ×
several HBM round-trips incl. the attn-dropout mask) run dense at
27.9 ms/step where chunked runs the same step at 18.4 ms; small-molecule
scores are ≤10 MB and keep dense), CHUNKED above
(clearly fastest at long context AND O(N) memory). The flash kernel stays
available via gt.attn_impl='flash' for future chips/shapes where the
balance flips.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_N = int(os.environ.get("GGPS_FLASH_MIN_N", 256))
_DENSE_MAX_N = int(os.environ.get("GGPS_DENSE_MAX_N", 1024))
_DENSE_MAX_BYTES = int(os.environ.get("GGPS_DENSE_MAX_BYTES", 64 << 20))
_LANE = 128


def pad_head_dim(q, k, v):
    """Zero-pad Dh to the 128-lane minimum (exact: padded q/k lanes contribute
    0 to logits; padded v lanes are sliced off). Returns (q, k, v, orig_dh)."""
    dh = q.shape[-1]
    dh_pad = max(_LANE, ((dh + _LANE - 1) // _LANE) * _LANE)
    if dh_pad != dh:
        pad = [(0, 0), (0, 0), (0, 0), (0, dh_pad - dh)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    return q, k, v, dh


def flash_available(n: int, dh: int) -> bool:
    return (n >= _FLASH_MIN_N and n % _LANE == 0
            and jax.default_backend() == "tpu")


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, key_mask: jax.Array,
              bias: Optional[jax.Array] = None) -> jax.Array:
    """q,k,v: (B,H,N,Dh); key_mask (B,N) bool; bias (B,H,N,N) additive.

    Head dim is zero-padded to the 128-lane minimum; output is exact because
    zero-padded q/k lanes contribute 0 to the logits and padded v lanes are
    sliced off the output.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    q, k, v, Dh = pad_head_dim(q, k, v)
    scale = 1.0 / float(Dh) ** 0.5
    ids = key_mask.astype(jnp.int32)  # pad→0, real→1
    seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(q, k, v, ab=bias, segment_ids=seg, causal=False,
                          sm_scale=scale)
    return out[..., :Dh]


def mha(q, k, v, key_mask, bias=None, dropout_rate: float = 0.0,
        dropout_rng=None, return_attn: bool = False, impl: str = "auto"):
    """Masked MHA with measured-policy dispatch (module docstring table).

    Dispatch contract (documented + tested, tests/test_flash_mha.py):
    - impl='auto': DENSE while N ≤ GGPS_DENSE_MAX_N and the (B,H,N,N) score
      matrix fits GGPS_DENSE_MAX_BYTES; CHUNKED online-softmax above (exact,
      O(N·chunk) memory, dropout- and bias-capable). Flash is never chosen
      automatically — on this chip it loses at every graph-recipe shape
      (round-3 device-clock A/B).
    - impl='dense' / 'chunked' / 'flash' force the named path. Flash
      supports neither attention dropout nor weight capture (it never
      materializes the (N, N) weights) and applies softmax scaling
      internally (caller must NOT pre-scale q).
    - attn-weight capture (return_attn) always forces dense: the weights
      must exist to be captured.
    """
    from ..mha import mha_core

    B, H, N, Dh = q.shape
    if return_attn:
        return mha_core(q, k, v, key_mask, bias=bias,
                        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                        return_attn=True)
    if impl == "flash":
        if dropout_rate > 0.0:
            raise ValueError("gt.attn_impl='flash' cannot apply attention "
                             "dropout (weights are never materialized); use "
                             "'chunked' or 'auto'")
        if not flash_available(N, Dh):
            raise ValueError(
                f"gt.attn_impl='flash' needs TPU + lane-aligned "
                f"N≥{_FLASH_MIN_N} (got N={N})")
        return flash_mha(q, k, v, key_mask, bias)
    if impl == "chunked" or (impl == "auto" and (
            N > _DENSE_MAX_N or 4 * B * H * N * N > _DENSE_MAX_BYTES)):
        from ..chunked_mha import chunked_mha

        # NOTE (round 4): a head-packed chunked variant (H·Dh folded into
        # one 128-lane contraction, the fused_gps_attn trick in XLA) was
        # built and measured at the VOC shape: 35.7 ms vs 18.4 ms per-head —
        # XLA does NOT naively lane-pad small-Dh contractions, so the H×
        # packing FLOPs are real cost, not free padding. Deleted; per-head
        # chunked stays the small-Dh answer.
        return chunked_mha(q, k, v, key_mask, bias=bias,
                           dropout_rate=dropout_rate,
                           dropout_rng=dropout_rng,
                           chunk=int(os.environ.get("GGPS_CHUNK", "128")))
    return mha_core(q, k, v, key_mask, bias=bias, dropout_rate=dropout_rate,
                    dropout_rng=dropout_rng, return_attn=return_attn)
