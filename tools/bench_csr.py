"""Clean CSR-vs-scatter segment-sum measurement at code2 scale (one workload
per process, min window)."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run(mode, E=65536, S=32768, D=128, iters=200, windows=4):
    import jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    rec = np.sort(rng.integers(0, S, E)).astype(np.int32)
    data = rng.normal(size=(E, D)).astype(np.float32)
    d = jnp.asarray(data); r = jnp.asarray(rec)

    if mode == "scatter":
        f = jax.jit(lambda x: jax.ops.segment_sum(
            x, r, num_segments=S, indices_are_sorted=True))
    elif mode == "csr":
        from graphgps_tpu.ops.pallas.segment_csr import (
            row_ptr_from_sorted, segment_sum_csr)
        rp = row_ptr_from_sorted(r, S)
        f = jax.jit(lambda x: segment_sum_csr(x, r, rp, S))
    elif mode == "csr_bwd" or mode == "scatter_bwd":
        if mode == "csr_bwd":
            from graphgps_tpu.ops.pallas.segment_csr import (
                row_ptr_from_sorted, segment_sum_csr)
            rp = row_ptr_from_sorted(r, S)
            g = lambda x: segment_sum_csr(x, r, rp, S).sum()
        else:
            g = lambda x: jax.ops.segment_sum(
                x, r, num_segments=S, indices_are_sorted=True).sum()
        f = jax.jit(jax.grad(g))
    out = f(d); np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]  # hard drain
    ws = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(d)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]  # hard drain
        ws.append((time.perf_counter() - t0) / iters)
    print(mode, round(min(ws) * 1e3, 4), "ms")

if __name__ == "__main__":
    run(sys.argv[1],
        E=int(sys.argv[2]) if len(sys.argv) > 2 else 65536,
        S=int(sys.argv[3]) if len(sys.argv) > 3 else 32768)
