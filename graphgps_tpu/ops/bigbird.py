"""BigBird block-sparse attention pattern for padded graph batches.

The reference vendors ~800 lines of gather-heavy torch
(/root/reference/graphgps/layer/bigbird_layer.py:219-1115) implementing
global + sliding-window + random block attention. TPU-first redesign:

- The attention *pattern* (which (query-block, key-block) pairs attend) is a
  STATIC boolean block mask built once per (N, block_size, num_random_blocks,
  seed) tuple — random blocks are drawn with a seeded host RNG exactly like the
  reference's seeded block plans (bigbird_layer.py:868-1057 semantics class).
- For the node counts GraphGPS actually sees (≤ ~1k nodes) the fastest TPU
  execution of a sparse pattern is dense MXU matmuls with the pattern applied as
  an additive mask — no gathers, full MXU utilization; compute is O(N²) but the
  wall-clock beats gather-based sparse below a few thousand nodes. The
  ``block_mask_to_dense`` helper expands the block pattern to an (N, N) mask that
  ``mha_core`` consumes. A gather-based Pallas kernel is the planned path for
  N ≫ 4k (not exercised by any reference benchmark).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def _block_plan(n_tokens: int, block_size: int, num_random_blocks: int,
                seed: int = 0, window: int = 3) -> np.ndarray:
    """(nb, nb) bool BLOCK plan: FIRST and LAST block-rows/cols global (the
    reference's global semantics — 'global keys -> 1st & last block',
    bigbird_layer.py:494,517-523) + ``window``-block sliding diagonal +
    ``num_random_blocks`` random key blocks per query block (seeded, static,
    matching the reference's seeded plans bigbird_layer.py:868-1057)."""
    nb = -(-n_tokens // block_size)
    bm = np.zeros((nb, nb), dtype=bool)
    bm[0, :] = bm[-1, :] = True     # first/last query blocks attend everything
    bm[:, 0] = bm[:, -1] = True     # everyone attends first/last key blocks
    half = window // 2
    for i in range(nb):
        lo, hi = max(0, i - half), min(nb, i + half + 1)
        bm[i, lo:hi] = True
    rng = np.random.default_rng(seed)
    for i in range(1, nb - 1):      # middle query blocks draw random keys
        candidates = [j for j in range(nb)
                      if not bm[i, j]]
        if candidates:
            pick = rng.choice(len(candidates),
                              size=min(num_random_blocks, len(candidates)),
                              replace=False)
            for p in pick:
                bm[i, candidates[p]] = True
    bm.setflags(write=False)
    return bm


@functools.lru_cache(maxsize=64)
def bigbird_block_mask(n_tokens: int, block_size: int, num_random_blocks: int,
                       seed: int = 0, window: int = 3) -> np.ndarray:
    """(N, N) bool mask: True where attention is allowed (dense expansion of
    the block plan — for the dense-masked execution path at moderate N)."""
    bm = _block_plan(n_tokens, block_size, num_random_blocks, seed, window)
    dense = np.kron(bm, np.ones((block_size, block_size), dtype=bool))
    return dense[:n_tokens, :n_tokens]
