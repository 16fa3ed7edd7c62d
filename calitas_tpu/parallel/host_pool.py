"""Host-side window thread pool.

The TPU-native analogue of the reference's bounded-queue thread pool
(SearchReference.scala:75-94): the native C++ DP releases the GIL, so a
thread pool parallelizes the per-window host work.  Results are yielded
in submission order (determinism in the final table comes from the
global sort, exactly as in the reference, but ordered yielding keeps the
intermediate hit list reproducible too).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

W = TypeVar("W")
R = TypeVar("R")

#: queue depth factor (reference uses threads * 500)
QUEUE_FACTOR = 500


def map_windows(
    windows: Iterable[W],
    task: Callable[[W], R],
    threads: int,
) -> Iterator[tuple[W, R]]:
    """Apply ``task`` to each window with a bounded in-flight queue;
    yield (window, result) in submission order."""
    if threads <= 1:
        for w in windows:
            yield w, task(w)
        return
    max_inflight = threads * QUEUE_FACTOR
    with ThreadPoolExecutor(max_workers=threads) as pool:
        pending: list = []
        it = iter(windows)
        for w in it:
            pending.append((w, pool.submit(task, w)))
            if len(pending) >= max_inflight:
                w0, f0 = pending.pop(0)
                yield w0, f0.result()
        for w0, f0 in pending:
            yield w0, f0.result()
