#!/usr/bin/env python
"""Device-clock A/B of the long-graph segment-sum paths at the MalNet shape:
XLA sorted scatter vs tiled Pallas kernel (ops/pallas/segment_tiled.py),
fwd and fwd+bwd, plus the prep (sort + re-tile gather) cost in isolation.

Usage: python tools/bench_segment_tiled.py [E] [S] [d]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 313344
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 79872
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp

    import bench
    from graphgps_tpu.ops.pallas.segment_tiled import (_pick_nb, _prep,
                                                       tiled_segment_sum)

    rng = np.random.default_rng(0)
    # MalNet-like: ids clustered per graph block, ~uniform within
    ids = jnp.asarray(np.sort(rng.integers(0, S, size=E)).astype(np.int32))
    data = jnp.asarray(rng.standard_normal((E, d)).astype(np.float32))
    print(f"E={E} S={S} d={d} NB={_pick_nb(S)}", file=sys.stderr)

    INNER = 20   # applications per dispatch: the axon tunnel costs ~25 ms
    # PER DISPATCH, so single-op timing is dispatch-bound — loop inside jit
    # (same reason the training path scans K steps per dispatch)

    def timed(name, fn, *args):
        def looped(*a):
            def body(i, acc):
                # i-dependent scale defeats CSE across iterations; the extra
                # elementwise pass is noise next to the op under test
                out = fn(a[0] * (1.0 + 1e-9 * i), *a[1:])
                return acc + out.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

        f = jax.jit(looped)
        out = f(*args)
        bench._drain(out)
        rtt = bench._measure_rtt()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            bench._drain(out)
            ts.append((time.perf_counter() - t0 - rtt) / INNER)
        print(f"{name:28s} {min(ts)*1e3:8.3f} ms")
        return min(ts)

    timed("xla_scatter_fwd",
          lambda x: jax.ops.segment_sum(x, ids, num_segments=S,
                                        indices_are_sorted=True), data)
    timed("tiled_fwd", lambda x: tiled_segment_sum(x, ids, S), data)
    NB = _pick_nb(S)
    timed("tiled_prep_only",
          lambda x: jnp.take(x, _prep(
              (ids + (x[0, 0] * 0).astype(jnp.int32)), S, NB)[1] % E,
              axis=0), data)

    w = jnp.asarray(rng.standard_normal((S, d)).astype(np.float32))

    def loss_x(x):
        return jnp.sum(jax.ops.segment_sum(x, ids, num_segments=S,
                                           indices_are_sorted=True) * w)

    def loss_t(x):
        return jnp.sum(tiled_segment_sum(x, ids, S) * w)

    timed("xla_scatter_fwdbwd", jax.grad(loss_x), data)
    timed("tiled_fwdbwd", jax.grad(loss_t), data)

    # the OTHER direction: unsorted scatter (gather backward without sort)
    idsu = jnp.asarray(rng.integers(0, S, size=E).astype(np.int32))
    timed("xla_scatter_unsorted",
          lambda x: jax.ops.segment_sum(x, idsu, num_segments=S), data)
    timed("tiled_unsorted", lambda x: tiled_segment_sum(x, idsu, S), data)


if __name__ == "__main__":
    main()
