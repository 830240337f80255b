"""Background IO: a bounded-queue writer thread.

Keeps shard serialization off the extraction hot loop (the reference solved
the same problem with its AsyncFileWriter thread, reference
src/preprocess_resnet_features.py:29-57). This version is a generic callable
executor so the same worker drains shard writes, index writes, or any other
host IO, and it re-raises worker failures at the submission site instead of
dying silently.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class AsyncWriter:
    def __init__(self, max_queue: int = 100):
        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self.submitted = 0

    def _worker(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                fn, args, kwargs = item
                if self._err is None:
                    try:
                        fn(*args, **kwargs)
                    except BaseException as e:
                        self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn: Callable, *args, **kwargs) -> None:
        if self._err is not None:
            raise RuntimeError("async writer failed") from self._err
        self._q.put((fn, args, kwargs))
        self.submitted += 1

    def wait(self) -> None:
        """Block until every submitted task has finished; raise on failure."""
        self._q.join()
        if self._err is not None:
            raise RuntimeError(
                f"async writer failed ({self.submitted} tasks submitted)"
            ) from self._err

    def stop(self) -> None:
        # The sentinel + join must run even when wait() raises a prior task's
        # failure — otherwise the worker thread leaks blocked on q.get()
        # forever and error-path cleanup can never shut the writer down.
        try:
            self.wait()
        finally:
            self._q.put(None)
            self._thread.join()
