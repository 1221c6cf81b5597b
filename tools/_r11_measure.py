"""Round-11 scale + adjudication measurements (not part of the engine).

Noop-sink min-of-2 at sf0.1 and sf10 for the round-11 additions, plus
isolated min-of-3 at sf0.1 for the three r10 bench regressions in
untouched code (VERDICT r10 item 7)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from mahout_samsara_book_spark.cache import release_tracked
from mahout_samsara_book_spark.session import get_spark

spark = get_spark(app_name="r11_measure")
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

NEW = ["rec_cross_llr", "emb_ssvd", "dedup_ingest_lifecycle"]
for name in NEW:
    out[f"{name}@sf0.1"] = run(name, "/root/testdata/sf0.1", 2)
    print(name, "sf0.1", out[f"{name}@sf0.1"], flush=True)
for name in NEW:
    out[f"{name}@sf10"] = run(name, "/root/repo/_scaling/sf10", 2)
    print(name, "sf10", out[f"{name}@sf10"], flush=True)

# --- item 7: isolated min-of-3 adjudication at sf0.1 ---------------- #
for name in ["drm_allreduce", "nb_train_text", "dedup_clusters"]:
    out[f"{name}@adjudicate_sf0.1_min3"] = run(name, "/root/testdata/sf0.1", 3)
    print(name, "adjudicated", out[f"{name}@adjudicate_sf0.1_min3"], flush=True)

with open("/root/repo/_r11_measure.json", "w") as f:
    json.dump(out, f, indent=1)
print("DONE", json.dumps(out))
