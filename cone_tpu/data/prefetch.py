"""Background-thread batch prefetching.

The reference overlaps host work with device work via DataLoader worker
processes + pinned-memory copies (cone/config.py:43-45). Here a single
daemon thread runs the (numpy, GIL-releasing) sampler one batch ahead —
host sampling (~13 ms/batch) then hides entirely behind the ~5 ms device
step plus dispatch."""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


def prefetch_iterator(iterable, depth: int = 2):
    """Yield items of `iterable`, produced in a background thread."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
