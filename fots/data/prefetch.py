"""Multiprocess generator prefetch (host input pipeline).

Replaces the reference's Keras-derived GeneratorEnqueuer
(tools/data_util.py:40-84): N daemon worker processes each run a
generator *factory* (seeded differently per worker — the reference forks
one shared generator, which duplicates RNG state across workers) and feed
a bounded multiprocessing queue; the consumer side blocks on queue.get
instead of the reference's 10 ms poll loop.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Callable, Iterator, Optional


def _worker(factory: Callable[[int], Iterator], worker_id: int, q, stop_event,
            parent_pid: int):
    import os

    try:
        gen = factory(worker_id)
        for item in gen:
            while True:
                if stop_event.is_set():
                    return
                # orphan watchdog: if the parent was SIGKILLed, daemon
                # cleanup never ran — exit instead of spinning forever.
                # put() must use a timeout: a blocking put on a full queue
                # with a dead consumer would never reach this check again.
                if os.getppid() != parent_pid:
                    return
                try:
                    q.put(item, timeout=5.0)
                    break
                except queue_mod.Full:
                    continue
    except KeyboardInterrupt:
        pass
    except Exception:
        import traceback

        traceback.print_exc()


class PrefetchPool:
    """N worker processes feeding one bounded queue."""

    def __init__(self, generator_factory: Callable[[int], Iterator],
                 num_workers: int = 4, max_queue: int = 24,
                 ctx: Optional[str] = "spawn"):
        # spawn (not fork): the parent typically has jax initialized and
        # forking a multithreaded process can deadlock; factories must be
        # picklable (top-level callables)
        self._factory = generator_factory
        self._ctx = mp.get_context(ctx)
        self._queue = self._ctx.Queue(maxsize=max_queue)
        self._stop = self._ctx.Event()
        import os

        self._procs = []
        for wid in range(num_workers):
            p = self._ctx.Process(
                target=_worker,
                args=(generator_factory, wid, self._queue, self._stop, os.getpid()),
                daemon=True,
            )
            p.start()
            self._procs.append(p)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                return self._queue.get(timeout=5.0)
            except queue_mod.Empty:
                if not any(p.is_alive() for p in self._procs):
                    raise StopIteration
                continue

    def stop(self):
        self._stop.set()
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
