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
    """Yield items of `iterable`, produced in a background thread.

    Abandoning the iterator (break / exception in the consumer) releases
    the worker: it checks a stop flag around a bounded put, so it never
    blocks forever holding buffered batches alive."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.2)
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
        stop.set()
