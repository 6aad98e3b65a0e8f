"""Ring attention: node-axis (sequence-parallel) dense attention over a mesh.

New capability vs the reference (single-device; SURVEY.md §2.10 SP row): for
giant padded node sets the (B, H, N, N) attention matrix of the GPS global
block is sharded across chips on the node axis. Each device holds a query
shard and rotates K/V shards around the ring with ``jax.lax.ppermute``,
maintaining an online-softmax accumulator (the flash-attention recurrence) so
no device ever materializes the full row. Communication rides the ICI ring and
overlaps with the local matmul under XLA's scheduler.

``ring_mha`` is the drop-in replacement for ops.mha.mha_core when node shards
live on a mesh axis; parity vs the dense path is tested on the simulated
8-device CPU mesh (tests/test_ring_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_body(q, k, v, kmask, axis_name: str):
    """Local shard computation: q (B,H,Nq,Dh); k,v (B,H,Nk,Dh); kmask (B,Nk)."""
    B, H, Nq, Dh = q.shape
    P_ = jax.lax.axis_size(axis_name)
    scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)

    m = jnp.full((B, H, Nq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Nq, 1), jnp.float32)
    acc = jnp.zeros((B, H, Nq, Dh), jnp.float32)

    def step(carry, _):
        m, l, acc, kk, vv, mm = carry
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, kk,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mm[:, None, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        acc_new = acc * corr + jnp.einsum(
            "bhnm,bhmd->bhnd", p, vv.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        l_new = l * corr + p.sum(-1, keepdims=True)
        perm = [(i, (i + 1) % P_) for i in range(P_)]
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        mm = jax.lax.ppermute(mm, axis_name, perm)
        return (m_new, l_new, acc_new, kk, vv, mm), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v, kmask), None, length=P_)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_mha(q: jax.Array, k: jax.Array, v: jax.Array, key_mask: jax.Array,
             mesh: Mesh, axis: str = "data",
             batch_axis: Optional[str] = None) -> jax.Array:
    """Dense masked MHA with the node axis sharded over ``axis``.

    q,k,v: (B, H, N, Dh) global arrays (N divisible by the axis size);
    key_mask: (B, N) bool. Returns (B, H, N, Dh) sharded like q.

    ``batch_axis``: mesh axis the batch dim is data-parallel over. Passing it
    keeps B sharded *inside* the shard_map (DP × SP jointly), so q/k/v and the
    bool mask enter in their native data-parallel layout — without it SPMD
    must replicate-then-reshard every layer (the round-2 involuntary full
    rematerialization warnings, MULTICHIP_r02.json).
    """
    from jax.experimental.shard_map import shard_map

    spec_qkv = P(batch_axis, None, axis, None)
    spec_mask = P(batch_axis, axis)
    fn = shard_map(
        functools.partial(_ring_body, axis_name=axis),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv,
        check_rep=False,
    )
    return fn(q, k, v, key_mask)
