"""In-core multithreaded matmul (SURVEY §2C C10 — the reference's
``MMul.mmulParA`` + ``createSplits``, ``MMul.scala:21-55``).

The engine's stance is that numpy's BLAS already multithreads a plain
``@`` (which is why C10 is 'deliberately obsolete'); this module exists
to REPRODUCE the reference's harness faithfully — balanced row-range
splits farmed to a thread pool, results written into row views of the
output — so the MThreadSuite equivalence gate (norm diff < 1e-5,
``MThreadSuite.scala:51``) and its warm-up + timed-reps micro-benchmark
(``tools/mthread_bench.py``) carry over measurably.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def create_splits(n: int, k: int) -> list[tuple[int, int]]:
    """Balanced contiguous ranges covering [0, n): the first ``n % k``
    splits get one extra row (``MMul.scala:createSplits`` semantics).
    ``k > n`` degrades to n singleton splits."""
    k = max(1, min(k, n))
    base, extra = divmod(n, k)
    out, start = [], 0
    for i in range(k):
        size = base + (1 if i < extra else 0)
        out.append((start, start + size))
        start += size
    return out


def mmul_par(
    a: np.ndarray, b: np.ndarray, n_threads: int | None = None
) -> np.ndarray:
    """``mmulParA``: split A's rows over ``n_threads`` tasks (default:
    CPU count, capped at nrow like the reference's
    ``availableProcessors min nrow``), each task multiplying its row
    range into the matching view of the preallocated result. BLAS
    releases the GIL, so the pool genuinely parallelizes."""
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    import os

    k = min(n_threads or os.cpu_count() or 1, a.shape[0])
    out = np.empty((a.shape[0], b.shape[1]), dtype=np.float64)

    def work(rng: tuple[int, int]) -> None:
        r0, r1 = rng
        np.matmul(a[r0:r1], b, out=out[r0:r1])

    with ThreadPoolExecutor(max_workers=k) as ex:
        list(ex.map(work, create_splits(a.shape[0], k)))
    return out
