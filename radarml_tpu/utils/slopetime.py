"""Slope timing: the repo's one benchmarking methodology.

On the tunneled dev TPU, `block_until_ready` can return before
execution completes, so naive dispatch loops measure enqueue overhead,
not device time (round 1's published numbers suffered exactly this —
see README "Timing methodology"). Every rate in this repo is therefore
a SLOPE: run K_lo and K_hi back-to-back dispatches, force completion
with a device→host fetch of a tiny output slice, and divide the time
difference by (K_hi - K_lo) — fixed per-call overhead (including the
~28 ms tunnel round-trip) cancels.

Shared by bench.py and every benchmarks/ probe so a methodology fix
lands once.
"""

from __future__ import annotations

import time
from typing import Callable


def slope_time(
    call: Callable[[], object],
    fetch: Callable[[object], object],
    k_lo: int = 2,
    k_hi: int = 12,
    reps: int = 3,
) -> float:
    """Seconds per `call()` via two-point slope with forced completion.

    `call` dispatches the program under test and returns its output;
    `fetch` forces completion (fetch a tiny slice device→host). Takes
    the best of `reps` attempts at each K to shed scheduling noise.
    """
    times = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = call()
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
