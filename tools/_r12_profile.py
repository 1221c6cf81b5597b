"""Round-12 optimization profiler (not part of the engine).

Isolated per-query measurement with the bench's own methodology (noop
sink, min over reps) plus the Spark job/stage counts per invocation —
the cheap local stand-in for the UI's job list, telling apart
"few heavy stages" from "many tiny jobs" (guide §1.1/§1.5).

Usage: python tools/_r12_profile.py [--sf DIR] [--reps N] q1 q2 ...
       python tools/_r12_profile.py --all           # every registered query
Prints one line per query: min_sec  jobs  stages  tasks  name
and a JSON map to /tmp/r12_profile.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    names: list[str] = []
    i = 0
    run_all = False
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--all":
            run_all = True
            i += 1
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="r12_profile")
    sc = spark.sparkContext
    q = entry.queries()
    if run_all:
        names = list(q)
    # same warm-up as bench.py so rep-1 numbers aren't JIT/Arrow noise
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()

    def _ident(batches):
        for b in batches:
            yield b

    li.limit(1000).select("l_orderkey").mapInPandas(
        _ident, schema="l_orderkey long"
    ).count()

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        best, best_jobs = float("inf"), 0
        for _ in range(reps):
            release_tracked(blocking=True)
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"r12prof:{name}")
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            if dt < best:
                best, best_jobs = dt, j1 - j0
        out[name] = {"sec": round(best, 3), "jobs": best_jobs}
        print(f"{best:8.3f}s  {best_jobs:4d} jobs  {name}", flush=True)
    with open("/tmp/r12_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
