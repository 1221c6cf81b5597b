"""Count Spark jobs (and wall) for named queries — deterministic
evidence for job-fusion changes. Usage: _r13_jobs.py <query>..."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r13jobs")
    sc = spark.sparkContext
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    reg = entry.queries()
    out = {}
    st = sc.statusTracker()
    for name in names:
        fn = reg[name]
        before = len(st.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        after = len(st.getJobIdsForGroup() or [])
        release_tracked()
        out[name] = {"jobs": after - before, "sec": round(dt, 3)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
