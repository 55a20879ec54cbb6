"""Per-worker GC tuning for allocation-heavy batch stages.

CPython's generational GC scans all tracked objects every ~700 allocations
by default; the tokenizer/codec stages allocate millions of short-lived
strings per batch, so at 32 concurrent workers GC burned ~15-20% of task
CPU and degraded the 8→32 scaling ratio (measured: analyze phase 33.9→29.6s
at 8 CPUs and 11.4→8.8s at 32 after tuning — phase efficiency 0.74→0.84).

`tune_worker_gc()` freezes already-live startup objects out of the scanned
generations and raises gen-0 threshold to 1M allocations — collections
still happen (leak safety net), just ~1000× less often. Idempotent; call
at the top of any hot map_batches function (runs once per worker process).
"""

from __future__ import annotations

import gc


def tune_worker_gc() -> None:
    if gc.get_threshold()[0] < 1_000_000:
        gc.freeze()
        gc.set_threshold(1_000_000, 50, 50)
