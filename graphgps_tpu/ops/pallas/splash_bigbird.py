"""True block-sparse BigBird attention via the TPU splash-attention kernel.

For large padded node sets (ogbg-code2 ≤1000 after clipping, and beyond) the
dense-mask BigBird execution (ops/bigbird.py + masked dense MHA) materializes
the (B,H,N,N) score matrix, defeating the point of block sparsity. The
splash-attention Pallas kernel (jax.experimental.pallas.ops.tpu.splash_attention)
consumes an arbitrary static boolean mask, builds a block-sparse iteration plan
from it, and SKIPS fully-masked key blocks — O(N·b) compute and memory, fused
fwd+bwd. We feed it the BigBird global+window+random plan
(ops/bigbird.bigbird_block_mask — same seeded-static semantics class as the
reference's per-layer plans, bigbird_layer.py:868-1057).

Dispatch: ``bigbird_attention`` uses splash when N ≥ GGPS_SPLASH_MIN_N on a
real TPU; the dense-mask path otherwise (molecular N — dense is optimal).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..bigbird import bigbird_block_mask
from .flash_mha import pad_head_dim

# Dense-masked MHA matches splash speed up to ~1k nodes on v5e (measured:
# 1.13ms dense vs 1.34ms splash at N=1024, B=4, H=4); splash wins on MEMORY
# (never materializes (B,H,N,N)) so it dispatches for the sizes where that
# matters. NOT lru_cached: the kernel closure captures arrays of the trace it
# was built under, and reusing it across jit traces leaks tracers.
_SPLASH_MIN_N = int(os.environ.get("GGPS_SPLASH_MIN_N", 2048))
_LANE = 128


def _lazy_bigbird_mask(n: int, block_size: int, num_random_blocks: int,
                       seed: int):
    """A splash Mask that expands the (nb, nb) BLOCK plan lazily per indexed
    tile, so host memory stays O((N/block)²) instead of the dense O(N²) a
    NumpyMask would need at very large N."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm)

    from ..bigbird import _block_plan

    bm = _block_plan(n, block_size, num_random_blocks, seed)  # (nb, nb) bool

    class BigBirdMask(sm.Mask):
        @property
        def shape(self):
            return (n, n)

        def __getitem__(self, idx):
            rows, cols = idx
            r = np.arange(n)[rows] // block_size
            c = np.arange(n)[cols] // block_size
            return bm[np.ix_(r, c)]

        def __eq__(self, other):
            return (isinstance(other, BigBirdMask)
                    and other.shape == self.shape
                    and np.array_equal(getattr(other, "_bm", None), bm))

        def __hash__(self):
            return hash((type(self).__name__, n, block_size, bm.tobytes()))

        _bm = bm

    return BigBirdMask()


def _make_kernel(n: int, num_heads: int, block_size: int,
                 num_random_blocks: int, seed: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    m = _lazy_bigbird_mask(n, block_size, num_random_blocks, seed)
    mask = sm.MultiHeadMask([m] * num_heads)
    return sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)


def splash_available(n: int) -> bool:
    return (n >= _SPLASH_MIN_N and n % _LANE == 0
            and jax.default_backend() == "tpu")


def splash_bigbird(q, k, v, key_mask, block_size: int, num_random_blocks: int,
                   seed: int):
    """q,k,v (B,H,N,Dh); key_mask (B,N). Returns (B,H,N,Dh).

    Scaling is applied here (splash does not scale q); padding is excluded via
    SegmentIds (pad=0, real=1) exactly like the flash wrapper.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk)

    B, H, N, _ = q.shape
    q, k, v, Dh = pad_head_dim(q, k, v)
    scale = 1.0 / float(Dh) ** 0.5
    kernel = _make_kernel(N, H, block_size, num_random_blocks, seed)
    ids = key_mask.astype(jnp.int32)
    out = jax.vmap(lambda qq, kk, vv, ii: kernel(
        qq * scale, kk, vv, segment_ids=sk.SegmentIds(q=ii, kv=ii)))(
            q, k, v, ids)
    return out[..., :Dh]


def bigbird_attention(q, k, v, key_mask, block_size: int,
                      num_random_blocks: int, seed: int,
                      dropout_rate: float = 0.0, dropout_rng=None):
    """Size-dispatched BigBird: splash block-sparse kernel for large N,
    dense-masked MHA otherwise. Attention dropout forces the dense path."""
    from ..mha import mha_core

    B, H, N, Dh = q.shape
    if dropout_rate == 0.0 and splash_available(N):
        return splash_bigbird(q, k, v, key_mask, block_size,
                              num_random_blocks, seed)
    bmask = jnp.asarray(bigbird_block_mask(N, block_size, num_random_blocks,
                                           seed=seed))
    bias = jnp.where(bmask, 0.0, -1e30)[None, None, :, :]
    return mha_core(q, k, v, key_mask, bias=bias, dropout_rate=dropout_rate,
                    dropout_rng=dropout_rng)
