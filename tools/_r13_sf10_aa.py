"""Round-13 (VERDICT r12 item 8): stage-level attribution of the capped
A'A indicator (rec_item_llr) at sf10. Times each pipeline stage with a
noop sink, confirms the cap dial bounds the pair stream as declared
(n_users x cap^2), and records pair-key skew (max/median per-partition
rows of the pair exchange)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mahout_samsara_book_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scaling/sf10"


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    spark = get_spark(app_name="r13_sf10_aa")
    sc = spark.sparkContext
    out: dict = {"sf_dir": SF_DIR}

    import entry_m5  # noqa: F401 — the graded query builds its own interactions
    import __spark_entry__ as entry

    reg = entry.queries()

    # the graded query's exact interaction relation: replicate by
    # calling into the entry module's builder if exposed; otherwise
    # time the registered query end-to-end and decompose the kernel
    # over the same tables.
    from mahout_samsara_book_spark.algorithms.cooccurrence import (
        _distinct_by_user,
        h60,
    )
    from mahout_samsara_book_spark.sources.tables import load_table
    from pyspark.sql import Window

    li = load_table(spark, SF_DIR, "lineitem")
    ords = load_table(spark, SF_DIR, "orders")
    inter_raw = li.join(ords, li.l_orderkey == ords.o_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
    )

    sc.setJobDescription("sf10 A'A: distinct-by-user (one exchange)")
    inter = _distinct_by_user(inter_raw, "user_id", "item_id")
    t_inter = noop(inter)

    max_prefs, seed = 50, 31
    w_cap = Window.partitionBy("u").orderBy(
        h60(
            F.concat(
                F.lit(f"rec{seed}:"),
                F.col("u").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            )
        ),
        F.col("i"),
    )
    capped = (
        inter.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= max_prefs)
        .select("u", "i")
    ).persist()
    sc.setJobDescription("sf10 A'A: capped histories")
    t_capped = noop(capped)

    sc.setJobDescription("sf10 A'A: cap-dial bound check")
    stats = capped.groupBy("u").agg(F.count("*").alias("h")).agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("h") * (F.col("h") - 1) / 2).alias("pair_obs"),
        F.max("h").alias("max_h"),
    ).collect()[0]
    out["n_users"] = stats["n_users"]
    out["pair_observations"] = int(stats["pair_obs"])
    out["max_history"] = stats["max_h"]
    out["cap_bound_pairs"] = stats["n_users"] * max_prefs * (max_prefs - 1) // 2

    lists = capped.groupBy("u").agg(
        F.sort_array(F.collect_list("i")).alias("items")
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, idx: F.transform(
                        F.slice(
                            F.col("items"), idx + F.lit(2), F.size(F.col("items"))
                        ),
                        lambda b: F.struct(a.alias("ia"), b.alias("ib")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.ia", "p.ib")
    pair_counts = pairs.groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("k11"))

    sc.setJobDescription("sf10 A'A: pair aggregate (the quadratic surface)")
    t_pairs = noop(pair_counts)

    # skew of the pair exchange: per-partition row counts post-shuffle
    sc.setJobDescription("sf10 A'A: pair-exchange skew probe")
    ppart = (
        pair_counts.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("med"),
            F.count("*").alias("nparts"),
        )
        .collect()[0]
    )
    out["pair_partition_max"] = ppart["mx"]
    out["pair_partition_median"] = ppart["med"]
    out["pair_partitions"] = ppart["nparts"]
    capped.unpersist()

    # headline: the registered query end-to-end (min of 2)
    sc.setJobDescription("sf10 A'A: rec_item_llr end-to-end")
    t_full = min(noop(reg["rec_item_llr"](spark, SF_DIR)) for _ in range(2))

    out["sec"] = {
        "distinct_by_user": t_inter,
        "capped_histories": t_capped,
        "pair_aggregate": t_pairs,
        "rec_item_llr_full_min2": t_full,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
