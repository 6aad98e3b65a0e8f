"""Background batch prefetching: overlap host collation + H2D transfer with
device compute.

The reference's DataLoader workers give it this for free; here a single
daemon thread runs the (native C++) collation and ``jax.device_put`` ahead of
the training step, keeping the accelerator from stalling between steps. Queue
depth 2 = classic double buffering.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

_SENTINEL = object()


def prefetch(host_batches, mesh=None, depth: int = 2) -> Iterator:
    """Iterate (num_real_graphs, GraphBatch) with background collation/transfer.

    ``host_batches`` yields either HostBatch records (host collation path) or
    ``(real, GraphBatch)`` pairs (device-side assembly path); host batches are
    converted (device_put, with data sharding when ``mesh`` is given) on a
    worker thread.
    """
    import numpy as np

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def worker():
        try:
            for item in host_batches:
                if isinstance(item, tuple):
                    real, gb = item
                else:
                    real = int(np.asarray(item.arrays["graph_mask"]).sum())
                    gb = item.to_graph_batch()
                if mesh is not None:
                    from ..parallel.mesh import shard_batch
                    gb = shard_batch(gb, mesh)
                q.put((real, gb))
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    if err:
        raise err[0]
