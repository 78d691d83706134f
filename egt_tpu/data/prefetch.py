"""Background batch prefetching.

The TPU-native analog of the reference's `tf.data` `.prefetch(AUTOTUNE)`
(`lib/data/dataset_base.py:126-128`): batch assembly (numpy/native C++) and the
host->device transfer run in a worker thread a few steps ahead of the training loop,
so the device never waits on the feed path.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


class Prefetcher:
    """Iterate `iterator` in a daemon thread, applying `transform` (e.g. sharded
    device_put) in the worker, keeping up to `depth` ready batches."""

    def __init__(self, iterator, transform=None, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def work():
            try:
                for item in iterator:
                    self._q.put(transform(item) if transform else item)
            except BaseException as e:  # propagate to the consumer
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
