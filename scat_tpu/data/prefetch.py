"""Async batch prefetching: host data work overlaps device compute.

The reference overlaps via DataLoader worker processes
(num_workers=10, reference MultiDataset.py:47); here a lightweight
thread pipelines any batch iterator — while the TPU runs step i, the
host decodes/assembles batch i+1..i+depth and stages it on device.
Used by the Trainer around the STB/FreiHAND/HO-3D loaders (the
synthetic dataset generates on device and doesn't need it).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

_SENTINEL = object()


class PrefetchIterator:
    """Wrap an iterable of batches with a depth-N background prefetcher."""

    def __init__(self, iterable: Iterable, depth: int = 2,
                 device_put=None):
        self._iterable = iterable
        self._depth = max(depth, 1)
        self._device_put = device_put

    def __len__(self) -> int:
        return len(self._iterable)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err: list = []
        stop = threading.Event()

        def worker():
            try:
                for batch in self._iterable:
                    if self._device_put is not None:
                        batch = self._device_put(batch)
                    # timeout-poll the stop flag: a consumer that
                    # abandons iteration (break / exception) would
                    # otherwise leave this thread blocked in q.put
                    # forever, pinning the loader iterator and up to
                    # `depth` staged device batches
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer thread
                err.append(e)
            finally:
                # the sentinel MUST eventually land (a put_nowait would
                # drop it when the queue holds `depth` staged batches
                # and the consumer would block in q.get forever); poll
                # with the same stop-aware timeout as the batch puts
                while not stop.is_set():
                    try:
                        q.put(_SENTINEL, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # runs on generator close/GC too (early consumer exit)
            stop.set()


def prefetch_to_device(iterable: Iterable, mesh=None, depth: int = 2
                       ) -> PrefetchIterator:
    """Prefetch + shard onto the mesh in the background thread, so the
    consumer loop only ever touches device-resident batches."""
    device_put = None
    if mesh is not None:
        from scat_tpu.parallel import mesh as mesh_lib

        def device_put(batch):
            if isinstance(batch, tuple):
                return tuple(mesh_lib.shard_batch(mesh, b) for b in batch)
            return mesh_lib.shard_batch(mesh, batch)

    return PrefetchIterator(iterable, depth=depth, device_put=device_put)
