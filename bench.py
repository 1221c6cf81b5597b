"""Benchmark harness: runs the registered queries at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on ``local[$SPARK_GRAFT_CPUS]``
and prints ONE JSON line with per-query wall seconds.

Execution is forced with the ``noop`` sink (full materialization of every
output column — ``count()`` would let Catalyst prune the compute).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from mahout_samsara_book_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")
    # warm the JVM once so per-query numbers measure the queries, not
    # session bring-up: parquet scan, a shuffle (codegen'd aggregate),
    # and the Arrow/pandas-UDF bridge — otherwise whichever query runs
    # first absorbs JIT + Arrow initialization
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()

    def _ident(batches):
        for b in batches:
            yield b

    li.limit(1000).select("l_orderkey").mapInPandas(
        _ident, schema="l_orderkey long"
    ).count()

    times: dict[str, float] = {}
    for name, fn in entry.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
