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

    Early exit is safe: when the consumer abandons the generator (a
    `max_steps` return mid-epoch), cleanup signals the producer and drains
    the queue so the thread exits instead of blocking on a full queue with
    device batches pinned forever.
    """
    import jax

    from fastvocoder_tpu.parallel import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []
    stop = threading.Event()

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                while True:
                    try:
                        q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        if stop.is_set():
                            return
        except Exception as e:  # surface in consumer
            err.append(e)
        finally:
            # The sentinel must reach the consumer even when the queue is
            # full at end-of-stream (the steady state: consumer slower than
            # producer) — put_nowait here would drop it and deadlock the
            # consumer's q.get().  Retry like the batch put; stop only fires
            # when the consumer has abandoned the generator and is draining.
            while True:
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
