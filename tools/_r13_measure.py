"""Round-13 isolated measurement helper: min-of-N noop-sink wall for the
named queries, plus the control trio, printed as one JSON line.

Usage: python tools/_r13_measure.py <reps> <query> [<query>...]
Honors SPARK_GRAFT_SF_DIR (default sf0.1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r13measure")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    reg = entry.queries()
    out: dict[str, list[float]] = {}
    control = ("rel_pricing_summary", "text_tokenize_counts", "drm_colsums")
    for cname in control:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            reg[cname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        release_tracked()
        out.setdefault("_control", []).append(round(best, 3))
    for name in names:
        fn = reg[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            release_tracked()
        out[name] = ts
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
