"""Host-side prefetching: overlap wav IO/crop assembly with device steps.

The reference hides its (expensive, per-utterance Python DSP) data work
behind 32 DataLoader worker processes (``train_audio.py:96``). Here the
host only assembles raw PCM crops — the DSP runs on device — so a small
thread pool plus a bounded queue suffices to keep the TPU fed; batches are
``jax.device_put`` with the target sharding while the previous step runs
(double buffering).
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")


def device_prefetch(batches: Iterable[dict], put: Callable[[dict], dict],
                    lookahead: int = 2) -> Iterator[dict]:
    """Double-buffered device transfer: ``put`` (a ``jax.device_put``
    wrapper) runs ``lookahead`` batches ahead of the consumer, so the
    host→device copy of batch N+1 overlaps the device step on batch N.

    ``jax.device_put`` is async (it enqueues the transfer and returns
    immediately), so a simple bounded deque suffices — no thread needed.
    """
    from collections import deque

    pending: deque = deque()
    it = iter(batches)
    try:
        for _ in range(lookahead):
            pending.append(put(next(it)))
    except StopIteration:
        pass
    while pending:
        out = pending.popleft()
        try:
            pending.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class ThreadedPrefetcher:
    """Run ``producer(item)`` for items of ``schedule`` in worker threads,
    yielding results in schedule order with a bounded lookahead."""

    def __init__(
        self,
        schedule: Iterable,
        producer: Callable[..., T],
        num_workers: int = 4,
        lookahead: int = 8,
    ):
        self.schedule = list(schedule)
        self.producer = producer
        self.num_workers = max(1, num_workers)
        self.lookahead = max(1, lookahead)

    def __iter__(self) -> Iterator[T]:
        results: dict[int, T] = {}
        lock = threading.Condition()
        next_job = [0]
        errors: list[BaseException] = []
        n = len(self.schedule)

        def worker():
            while True:
                with lock:
                    if errors:
                        return
                    # bound how far ahead of the consumer we run
                    while (
                        next_job[0] < n
                        and next_job[0] - emit_idx[0] >= self.lookahead
                        and not errors
                    ):
                        lock.wait(0.05)
                    if next_job[0] >= n or errors:
                        return
                    job = next_job[0]
                    next_job[0] += 1
                try:
                    out = self.producer(*self.schedule[job]) if isinstance(
                        self.schedule[job], tuple
                    ) else self.producer(self.schedule[job])
                except BaseException as e:  # propagate to consumer
                    with lock:
                        errors.append(e)
                        lock.notify_all()
                    return
                with lock:
                    results[job] = out
                    lock.notify_all()

        emit_idx = [0]
        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for i in range(n):
                with lock:
                    while i not in results and not errors:
                        lock.wait(0.1)
                    if errors:
                        raise errors[0]
                    out = results.pop(i)
                    emit_idx[0] = i + 1
                    lock.notify_all()
                yield out
        finally:
            with lock:
                errors.append(StopIteration())  # signal workers to exit
                lock.notify_all()
            for t in threads:
                t.join(timeout=1.0)
