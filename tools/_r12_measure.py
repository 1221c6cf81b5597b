"""Round-12 scale measurements (not part of the engine).

Noop-sink min-of-2 at sf0.1 and the replicated sf10 fixture for the
round-12 additions (idle-TTL as-of, SimilarityAnalysis compose,
streaming crawl-ingest) plus the manifest-commit re-measure of the
r11 lifecycle row (its probe now carries the manifest semi-join)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark

spark = get_spark(app_name="r12_measure")
q = entry.queries()
out = {}


def run(name, sf_dir, reps):
    best = None
    for _ in range(reps):
        release_tracked(blocking=True)
        t0 = time.time()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


NEW = [
    "rec_similarity_analysis",
    "ev_stream_asof_ttl",
    "ev_stream_ingest",
    "dedup_ingest_lifecycle",
]
for name in NEW:
    out[f"{name}@sf0.1"] = run(name, "/root/testdata/sf0.1", 2)
    print(name, "sf0.1", out[f"{name}@sf0.1"], flush=True)
if os.path.exists("/root/repo/_scaling/sf10/events.parquet"):
    for name in NEW:
        out[f"{name}@sf10"] = run(name, "/root/repo/_scaling/sf10", 2)
        print(name, "sf10", out[f"{name}@sf10"], flush=True)

with open("/root/repo/_r12_measure.json", "w") as f:
    json.dump(out, f, indent=1)
print("DONE", json.dumps(out))
