"""Asynchronous writeback: a background thread drains output tasks so the
device loop never blocks on disk.

The reference writes every artifact synchronously inside its timed hot loop
(/root/reference/BatchMultiBevGen.cpp:294-320).  Here the device produces the
next batch while this thread encodes/writes the previous one; errors are
re-raised on close so failures aren't silently dropped.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class AsyncWriter:
    def __init__(self, max_pending: int = 4) -> None:
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            task = self._q.get()
            if task is None:
                return
            if self._error is not None:
                continue  # drain without executing: stop at the FIRST failure
            try:
                task()
            except BaseException as exc:  # noqa: BLE001 — reported on close
                self._error = exc  # first failure wins; later tasks skipped

    def submit(self, task: Callable[[], None]) -> None:
        if self._error is not None:
            raise RuntimeError("async writer failed") from self._error
        self._q.put(task)

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()
        if self._error is not None:
            raise RuntimeError("async writer failed") from self._error

    def __enter__(self) -> "AsyncWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
