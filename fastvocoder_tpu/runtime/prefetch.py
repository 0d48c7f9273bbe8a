"""Host->device input pipeline: background-thread prefetch of sharded batches.

The reference overlaps host data work with compute via DataLoader worker
processes + pinned memory (reference bin/train.py:398-405).  The TPU-native
equivalent: a daemon thread that runs the (numpy) batch iterator and
`jax.device_put`s each batch onto the mesh ahead of time, so the device
transfer of batch k+1 overlaps the computation of batch k.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


def prefetch_to_device(
    iterator: Iterator[dict],
    mesh=None,
    size: int = 2,
) -> Iterator[dict]:
    """Wrap a host batch iterator with `size` batches of device prefetch.

    With a mesh, batches are placed with the batch-dim sharding
    (parallel.shard_batch); without, plain device_put.
    """
    import jax

    from fastvocoder_tpu.parallel import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                q.put(batch)
        except Exception as e:  # surface in consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
