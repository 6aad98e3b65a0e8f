#!/usr/bin/env python
"""Device-clock microbenchmarks of the hot pcqm-deep primitives.

Measures isolated variants (segment-op matmul precision, attention layouts,
embedding paths) with the hard-drain window methodology from bench.py.
Run one group per invocation on an idle chip:

  python tools/micro_ab.py seg|attn|embed
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drain(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, iters=100, windows=3, dispatches=4):
    """Device time per application of ``fn``: run ``iters`` applications
    INSIDE one jitted lax.scan (per-dispatch tunnel overhead ~1.5 ms would
    otherwise swamp a 20 us kernel), chain iterations through the first
    argument (a tiny data-dependent perturbation defeats CSE/DCE), and time
    hard-drained windows of several dispatches."""
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        out = fn(carry, *args[1:])
        leaves = jax.tree_util.tree_leaves(out)
        eps = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
        return carry + eps.astype(carry.dtype), None

    @jax.jit
    def many(x0):
        # return a SCALAR: draining a full-size output would pull megabytes
        # through the ~30 MB/s tunnel (~1 s per fetch — measured; it silenced
        # every real signal in the first version of this harness)
        return jnp.sum(jax.lax.scan(body, x0, None, length=iters)[0])

    out = many(args[0])
    _drain(out)
    g = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,))
    _drain(g(z))
    t0 = time.perf_counter(); _drain(g(z)); rtt = time.perf_counter() - t0
    ws = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(dispatches):
            out = many(args[0])
        _drain(out)
        ws.append((time.perf_counter() - t0 - rtt) / (iters * dispatches))
    return min(ws) * 1e6  # us


def main_seg():
    """blocked_segment_sum variants at the pcqm shape (fwd only)."""
    import jax
    import jax.numpy as jnp

    B, EB, NM, D = 256, 64, 32, 256
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((B * EB, D)), jnp.float32)
    ids = jnp.asarray(
        (rng.integers(0, NM, (B, EB)) + np.arange(B)[:, None] * NM
         ).reshape(-1).astype(np.int32))
    mask = jnp.asarray(rng.random((B * EB,)) < 0.8)

    def blocked(data, ids, mask, prec, dt):
        flat = data.astype(dt).reshape(B, EB, -1)
        local = ids.reshape(B, EB) - (jnp.arange(B, dtype=ids.dtype)[:, None] * NM)
        io = jax.lax.broadcasted_iota(jnp.int32, (B, EB, NM), 2)
        oh = jnp.logical_and(local[..., None] == io,
                             mask.reshape(B, EB)[..., None]).astype(dt)
        out = jnp.einsum("ben,bed->bnd", oh, flat,
                         preferred_element_type=jnp.float32, precision=prec)
        return out

    P = jax.lax.Precision
    for nm, prec, dt in [("f32 HIGHEST", P.HIGHEST, jnp.float32),
                         ("f32 HIGH", P.HIGH, jnp.float32),
                         ("f32 DEFAULT", P.DEFAULT, jnp.float32),
                         ("bf16 HIGHEST", P.HIGHEST, jnp.bfloat16),
                         ("bf16 DEFAULT", P.DEFAULT, jnp.bfloat16)]:
        us = timeit(lambda d, i, m, p=prec, t=dt: blocked(d, i, m, p, t),
                    data, ids, mask)
        print(f"seg_sum fwd {nm:14s}: {us:8.1f} us")

    # fwd+bwd through the f32 variants
    def fb(prec, dt):
        def loss(d):
            return blocked(d, ids, mask, prec, dt).sum()
        return jax.grad(loss)
    for nm, prec, dt in [("f32 HIGHEST", P.HIGHEST, jnp.float32),
                         ("f32 DEFAULT", P.DEFAULT, jnp.float32),
                         ("bf16 DEFAULT", P.DEFAULT, jnp.bfloat16)]:
        us = timeit(fb(prec, dt), data)
        print(f"seg_sum fwd+bwd {nm:14s}: {us:8.1f} us")

    # sorted-segment XLA path for contrast
    def sorted_path(d):
        dm = jnp.where(mask[:, None], d, 0.0)
        return jax.ops.segment_sum(dm, ids, num_segments=B * NM,
                                   indices_are_sorted=True)
    print(f"seg_sum fwd sorted-scatter : {timeit(sorted_path, data):8.1f} us")


def main_attn():
    """Attention block variants at pcqm shape: B=256,N=32,H=8,Dh=32,d=256."""
    import jax
    import jax.numpy as jnp

    B, N, H, Dh = 256, 32, 8, 32
    d = H * Dh
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, d)), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.standard_normal((d, d)) / 16, jnp.float32)
                      for _ in range(4))
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    mask = jnp.asarray(rng.random((B, N)) < 0.9)

    def split_heads(t):
        return t.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)

    def current(x):
        q, k, v = (split_heads(x @ w) for w in (wq, wk, wv))
        scale = 1.0 / np.sqrt(Dh)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, d)
        return o @ wo

    def fused_nhd(x):
        qkv = (x @ wqkv).reshape(B, N, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scale = 1.0 / np.sqrt(Dh)
        logits = jnp.where(mask[:, None, None, :], logits * scale, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        return o.reshape(B, N, d) @ wo

    for nm, fn in [("current (split_heads)", current),
                   ("fused qkv bnhd", fused_nhd)]:
        us = timeit(fn, x)
        gus = timeit(jax.grad(lambda t, f=fn: f(t).sum()), x)
        print(f"attn {nm:22s}: fwd {us:8.1f} us   fwd+bwd {gus:8.1f} us")


def main_embed():
    import jax
    import jax.numpy as jnp

    E, T, D = 16384, 8, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, T, (E,)).astype(np.int32))
    emb = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    def take(e):
        return jnp.take(e, ids, axis=0)

    def onehot_mm(e):
        oh = jax.nn.one_hot(ids, T, dtype=jnp.float32)
        return oh @ e

    def onehot_bf16(e):
        oh = jax.nn.one_hot(ids, T, dtype=jnp.bfloat16)
        return (oh @ e.astype(jnp.bfloat16)).astype(jnp.float32)

    for nm, fn in [("take(gather)", take), ("onehot f32", onehot_mm),
                   ("onehot bf16", onehot_bf16)]:
        us = timeit(fn, emb)
        gus = timeit(jax.grad(lambda e, f=fn: f(e).sum()), emb)
        print(f"embed {nm:14s}: fwd {us:8.1f} us   fwd+bwd {gus:8.1f} us")


def main_seg2():
    """Isolate WHERE the 1.5 ms goes: one-hot build vs einsum form."""
    import jax
    import jax.numpy as jnp

    B, EB, NM, D = 256, 64, 32, 256
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((B * EB, D)), jnp.float32)
    ids_l = rng.integers(0, NM, (B, EB)).astype(np.int32)
    ids = jnp.asarray((ids_l + np.arange(B)[:, None] * NM).reshape(-1))
    mask_np = rng.random((B * EB,)) < 0.8
    mask = jnp.asarray(mask_np)
    oh_pre = jnp.asarray(
        (np.eye(NM, dtype=np.float32)[ids_l] *
         mask_np.reshape(B, EB, 1)))  # (B, EB, NM)

    def onehot_only(d):
        local = ids.reshape(B, EB) - (jnp.arange(B, dtype=ids.dtype)[:, None] * NM)
        io = jax.lax.broadcasted_iota(jnp.int32, (B, EB, NM), 2)
        oh = jnp.logical_and(local[..., None] == io,
                             mask.reshape(B, EB)[..., None]).astype(jnp.float32)
        return oh + d[0, 0]  # depend on carry

    def einsum_pre(d):
        return jnp.einsum("ben,bed->bnd", oh_pre, d.reshape(B, EB, D),
                          preferred_element_type=jnp.float32)

    def matmul_pre(d):
        # (B, NM, EB) @ (B, EB, D) batched matmul form
        return jnp.matmul(oh_pre.transpose(0, 2, 1), d.reshape(B, EB, D))

    def matmul_pre_T(d):
        # contract over EB with one-hot laid out (B, NM, EB) from scratch
        oh_t = oh_pre.transpose(0, 2, 1)
        return jax.lax.dot_general(oh_t, d.reshape(B, EB, D),
                                   (((2,), (1,)), ((0,), (0,))))

    def unsorted_scatter(d):
        dm = jnp.where(mask[:, None], d, 0.0)
        return jnp.zeros((B * NM, D), d.dtype).at[ids].add(dm)

    def sorted_seg(d):
        dm = jnp.where(mask[:, None], d, 0.0)
        return jax.ops.segment_sum(dm, ids, num_segments=B * NM,
                                   indices_are_sorted=True)

    for nm, fn in [("onehot build only", onehot_only),
                   ("einsum pre-oh", einsum_pre),
                   ("matmul pre-oh", matmul_pre),
                   ("dotgen (B,NM,EB)", matmul_pre_T),
                   ("at[].add unsorted", unsorted_scatter),
                   ("segment_sum sorted", sorted_seg)]:
        us = timeit(fn, data)
        print(f"seg2 {nm:20s}: {us:8.1f} us")

    # big-batch fattening: fold 4 graphs into one block (EB*4, NM*4)
    oh_fat = jnp.asarray(np.zeros((B // 4, EB * 4, NM * 4), np.float32))

    def einsum_fat(d):
        return jnp.einsum("ben,bed->bnd", oh_fat, d.reshape(B // 4, EB * 4, D),
                          preferred_element_type=jnp.float32)
    print(f"seg2 einsum fat 4x      : {timeit(einsum_fat, data):8.1f} us")
    oh_fat16 = jnp.asarray(np.zeros((B // 16, EB * 16, NM * 16), np.float32))

    def einsum_fat16(d):
        return jnp.einsum("ben,bed->bnd", oh_fat16,
                          d.reshape(B // 16, EB * 16, D),
                          preferred_element_type=jnp.float32)
    print(f"seg2 einsum fat 16x     : {timeit(einsum_fat16, data):8.1f} us")


if __name__ == "__main__":
    {"seg": main_seg, "seg2": main_seg2, "attn": main_attn,
     "embed": main_embed}[sys.argv[1]]()
