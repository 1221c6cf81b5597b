"""Interleaved A/B for the scan-parallelism floor: each rep runs the
named queries once WITH the floor and once WITHOUT, alternating, in one
session — box noise lands on both arms.  Prints per-query lists of
(on, off) second pairs plus the control trio per rep.

Usage: python tools/_r13_ab_floor.py <reps> <query> [...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark
from mahout_samsara_book_spark.sources import tables


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r13abfloor")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().count()
    reg = entry.queries()
    floor_default = tables.PAR_FLOOR_MIN_BYTES

    def set_floor(on: bool) -> None:
        tables.PAR_FLOOR_MIN_BYTES = (
            floor_default if on else 10**15
        )
        tables._TABLE_MEMO.clear()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        reg[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_tracked()
        return round(dt, 3)

    out: dict[str, list] = {n: [] for n in names}
    ctrl = []
    # warm both arms once (compile/analysis) before timing
    for on in (True, False):
        set_floor(on)
        for n in names:
            run(n)
    for rep in range(reps):
        t0 = time.perf_counter()
        reg["rel_pricing_summary"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        ctrl.append(round(time.perf_counter() - t0, 3))
        release_tracked()
        for n in names:
            # ALTERNATE the within-pair order per rep: the second run
            # of a pair is systematically faster (page cache, JIT,
            # allocator warmth — measured ~30% on an unwired control
            # query), so a fixed order biases the verdict toward
            # whichever arm runs second
            order = (True, False) if rep % 2 == 0 else (False, True)
            pair = {}
            for on in order:
                set_floor(on)
                pair[on] = run(n)
            out[n].append([pair[True], pair[False]])
    set_floor(True)
    print(json.dumps({"_control": ctrl, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
