"""The reference's micro-benchmark, reproduced: A(5000×350) · B(350×300)
doubles, one warm-up pass, 30 timed reps, average ms for the
single-threaded control vs the row-split threaded ``mmul_par``
(``MThreadSuite.scala:20-52``). Prints one JSON line; numbers land in
SCALING.md. Control forces one BLAS thread via threadpoolctl-free env
knobs where possible — if the BLAS ignores them the 'control' is simply
numpy's default ``@`` (which is the engine's real stance anyway).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mahout_samsara_book_spark.kernels.incore import uniform_view
from mahout_samsara_book_spark.kernels.mthread import mmul_par


def timed(fn, reps: int = 30) -> float:
    fn()  # warm-up (MThreadSuite.scala:22-27)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1000.0


def main() -> None:
    a = uniform_view(5000, 350, 1234)
    b = uniform_view(350, 300, 1235)
    control_ms = timed(lambda: a @ b)
    par_ms = timed(lambda: mmul_par(a, b))
    diff = float(np.linalg.norm(a @ b - mmul_par(a, b)))
    print(
        json.dumps(
            {
                "shape": "5000x350 @ 350x300",
                "reps": 30,
                "control_avg_ms": round(control_ms, 2),
                "mthread_avg_ms": round(par_ms, 2),
                "equivalence_frobenius_diff": diff,
                "gate": "< 1e-5 (MThreadSuite.scala:51)",
            }
        )
    )


if __name__ == "__main__":
    main()
