"""Round-3 late relational additions: Q13/Q17 shapes, moment
aggregates, event-time gap-fill. Correctness invariants that the
DuckDB hash-match can't express (zero-customers visibility, gap-fill
density, moment identities)."""

import math

from pyspark.sql import functions as F

from mahout_samsara_book_spark.functions.relational import (
    bivariate_stats,
    customer_order_distribution,
    event_hourly_gapfill,
    small_quantity_revenue,
)

SF = "/root/testdata/sf0.001"


def test_custdist_counts_every_customer(spark):
    """Left-outer semantics: the histogram must partition the full
    customer relation — including customers with zero (non-urgent)
    orders, which an inner join would silently drop."""
    out = customer_order_distribution(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r["custdist"] for r in out) == n_cust


def test_small_quantity_revenue_subset(spark):
    """The small-quantity slice is a strict subset of the brand slice,
    and the threshold join keeps only rows below 20% of per-part avg."""
    row = small_quantity_revenue(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    brand_rows = (
        li.join(
            part.filter(F.col("p_brand") == "Brand#23"),
            li.l_partkey == part.p_partkey,
        ).count()
    )
    assert (row["n_small"] or 0) <= brand_rows


def test_bivariate_stats_moment_identities(spark):
    """corr == cov / (sd_x * sd_y) row by row — the aggregate family is
    internally consistent, not four unrelated numbers."""
    for r in bivariate_stats(spark, SF).collect():
        if r["qty_sd"] and r["price_sd"]:
            expect = r["qty_price_cov"] / (r["qty_sd"] * r["price_sd"])
            assert math.isclose(r["qty_price_corr"], expect, rel_tol=1e-9)
        assert r["n"] > 0


def test_gapfill_is_dense_and_conserves_counts(spark):
    """The hour axis is dense per type (every hour in [min, max]
    present exactly once) and the filled zeros don't change the total
    event count."""
    out = event_hourly_gapfill(spark, SF)
    rows = out.collect()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == ev_n

    hours = sorted({r["hour"] for r in rows})
    types = {r["event_type"] for r in rows}
    span = hours[-1] - hours[0] + 1
    assert len(hours) == span
    assert len(rows) == span * len(types)


def test_waiting_suppliers_order_invariant(spark):
    """sum(numwait) must equal the number of (multi-supplier) orders
    whose returned lineitems come from EXACTLY ONE supplier — the
    semi+anti join pair is equivalent to that per-order cardinality
    predicate."""
    from mahout_samsara_book_spark.functions.relational import (
        waiting_suppliers,
    )

    out = waiting_suppliers(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .count()
    )
    assert sum(r["numwait"] for r in out) == per_order


def test_idle_customers_membership(spark):
    """Every counted customer is above the positive-balance average and
    absent from the recent-orders key set."""
    from mahout_samsara_book_spark.functions.relational import (
        idle_rich_customers,
    )

    out = idle_rich_customers(spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    ab = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    recent = orders.filter(F.col("o_orderdate") >= "2001-01-01").select("o_custkey")
    direct = (
        cust.filter(F.col("c_acctbal") > ab)
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .count()
    )
    assert sum(r["numcust"] for r in out) == direct


def test_order_priority_check_partition(spark):
    """Q4 semi-join: counted orders are exactly the in-quarter orders
    whose key appears in the returned-lineitem key set."""
    from mahout_samsara_book_spark.functions.relational import (
        order_priority_check,
    )

    out = order_priority_check(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    keys = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k")
    ).distinct()
    direct = orders.join(keys, orders.o_orderkey == keys.k).count()
    assert sum(r["order_count"] for r in out) == direct


def test_top_value_suppliers_cutoff(spark):
    """Every kept supplier is strictly above 1.05x the mean supplier
    value, and the kept set is non-empty on the fixture."""
    from mahout_samsara_book_spark.functions.relational import (
        top_value_suppliers,
    )

    out = top_value_suppliers(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sv = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    cutoff = sv.agg(F.avg("v") * 1.05).collect()[0][0]
    assert out, "cutoff excluded every supplier"
    assert all(r["value"] > cutoff for r in out)


def test_disjunctive_revenue_arm_union(spark):
    """The OR-filter count equals the sum of per-arm counts minus
    overlaps — arms are brand-disjoint so overlaps must be zero, and
    the disjunction must not drop any arm."""
    from mahout_samsara_book_spark.functions.relational import (
        disjunctive_predicate_revenue,
    )

    row = disjunctive_predicate_revenue(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arms = [
        ("Brand#12", 1, 5, 1, 11),
        ("Brand#23", 1, 10, 10, 20),
        ("Brand#34", 1, 15, 20, 30),
    ]
    total = 0
    for brand, s_lo, s_hi, q_lo, q_hi in arms:
        total += j.filter(
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        ).count()
    assert row["n_items"] == total


def test_local_volume_nation_equality(spark):
    """Q5 semantics: counted revenue only where customer nation ==
    supplier nation — cross-nation rows must contribute nothing."""
    from mahout_samsara_book_spark.functions.relational import (
        local_supplier_volume,
    )

    out = local_supplier_volume(spark, SF)
    assert out.count() <= 25  # at most one row per nation


def test_top_quarter_supplier_is_argmax(spark):
    """Q15: every returned supplier carries the exact max revenue."""
    from mahout_samsara_book_spark.functions.relational import (
        top_quarter_supplier,
    )

    rows = top_quarter_supplier(spark, SF).collect()
    assert rows
    vals = {r["total_rev"] for r in rows}
    assert len(vals) == 1


def test_heavy_shippers_subset(spark):
    """Q20: the 1.05x-mean cutoff returns a PROPER subset of suppliers
    (non-empty, not everyone)."""
    from mahout_samsara_book_spark.functions.relational import (
        heavy_shippers_of_named_parts,
    )

    n = heavy_shippers_of_named_parts(spark, SF).count()
    total = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert 0 < n < total


def test_promo_share_bounds(spark):
    """Q14: the promo percentage is a true share — within [0, 100]."""
    from mahout_samsara_book_spark.functions.relational import (
        promo_revenue_share,
    )

    row = promo_revenue_share(spark, SF).collect()[0]
    assert 0.0 <= row["promo_pct"] <= 100.0


def test_market_share_is_a_share(spark):
    """Q8: per-year market share lies in [0, 1] and years are unique."""
    from mahout_samsara_book_spark.functions.relational import (
        national_market_share,
    )

    rows = national_market_share(spark, SF).collect()
    assert rows
    years = [r["o_year"] for r in rows]
    assert len(years) == len(set(years))
    assert all(0.0 <= r["mkt_share"] <= 1.0 for r in rows)


def test_forecast_revenue_manual(spark):
    """Q6: the aggregate equals the hand-computed slice sum."""
    from mahout_samsara_book_spark.functions.relational import (
        forecast_revenue_change,
    )

    row = forecast_revenue_change(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    manual = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).count()
    assert row["n_items"] == manual


def test_skyline_semantics(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__  # initializes entry_rel's sci helpers
    import entry_rel

    __spark_entry__.queries()  # force _init side effects

    import datetime as dt
    rows = [
        (1, 10.0, dt.date(2024, 1, 5)),
        (2, 10.0, dt.date(2024, 1, 2)),   # dominates 1 (same price, earlier)
        (3, 20.0, dt.date(2024, 1, 1)),   # on frontier (earliest date)
        (4, 20.0, dt.date(2024, 1, 3)),   # dominated by 2 and 3
        (5, 5.0, dt.date(2024, 1, 9)),    # on frontier (cheapest)
    ]
    import tempfile, shutil, os
    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderdate date"
        ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        out = entry_rel.q_rel_skyline(spark, d)
        keys = {r["o_orderkey"] for r in out.collect()}
        assert keys == {5, 2, 3}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dq_expectations_null_is_violation(spark):
    """Three-valued logic: a NULL predicate is a VIOLATION, not a pass —
    `NOT (x > 0)` is NULL for NULL x, so a naive filter count silently
    passes every NULL row."""
    from pyspark.sql import functions as F  # noqa: F401

    from mahout_samsara_book_spark.functions.relational import (
        dq_expectations,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,), (None,), (3.0,)], "x double"
    )
    out = {
        r.rule: (r.n_violations, r.n_rows, r.violation_ppm)
        for r in dq_expectations(
            df, [("x_positive", "x > 0"), ("x_not_null", "x IS NOT NULL")]
        ).collect()
    }
    # x > 0: -2.0 violates, both NULLs violate -> 3 of 5
    assert out["x_positive"] == (3, 5, 600000)
    assert out["x_not_null"] == (2, 5, 400000)


def test_dq_expectations_single_scan(spark):
    """The whole rule set must compile into ONE aggregate over one scan
    — no per-rule re-scan of the relation."""
    from mahout_samsara_book_spark.functions.relational import (
        DQ_DEFAULT_RULES,
        dq_expectations,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = dq_expectations(
        li, DQ_DEFAULT_RULES
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_asof_join_semantics(spark):
    """Backward-inclusive as-of: exact-time right rows match; equal-time
    right duplicates resolve to the greatest right_order; left rows
    before any right row get null payload; groups never mix."""
    from pyspark.sql import functions as F

    from mahout_samsara_book_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 101), (1, 9, 102), (2, 5, 200)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7, 0.5), (1, 20, 8, 0.7), (1, 20, 9, 0.9), (2, 6, 10, 1.1)],
        "k long, t long, rid long, val double",
    )
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, "k", "t", "t", ["rid", "val"], "rid"
        ).collect()
    }
    assert out[100]["rid"] == 7  # inclusive: right at t=10 matches
    assert out[101]["rid"] == 9  # tie at t=20 -> greatest rid
    assert out[101]["val"] == 0.9  # payload travels as one row
    assert out[102]["rid"] is None  # t=9 precedes every right row
    assert out[200]["rid"] is None  # group 2's right row is later (t=6>5)

    # a right row whose payload column is null is still "the most
    # recent row" — ignorenulls skips absent rows, never columns
    right2 = spark.createDataFrame(
        [(1, 10, 7, 0.5), (1, 20, 8, None)],
        "k long, t long, rid long, val double",
    )
    r = asof_join(
        left.filter(F.col("lid") == 101),
        right2, "k", "t", "t", ["rid", "val"], "rid",
    ).first()
    assert r["rid"] == 8 and r["val"] is None


def test_epoch_shuffle_deterministic_and_dense(spark):
    from mahout_samsara_book_spark.operators.selection import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, "t") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, epoch_shuffle(docs, epoch=1, n_shards=4).collect()))
    b = sorted(map(tuple, epoch_shuffle(docs, epoch=1, n_shards=4).collect()))
    assert a == b  # same epoch -> identical order
    c = sorted(map(tuple, epoch_shuffle(docs, epoch=2, n_shards=4).collect()))
    assert a != c  # different epoch -> different order
    # positions are dense 1..n within each shard
    per_shard = {}
    for _doc, shard, pos in a:
        per_shard.setdefault(shard, []).append(pos)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_leakage_safe_split_keeps_clusters_together(spark):
    from mahout_samsara_book_spark.operators.selection import (
        leakage_safe_split,
    )

    # 300 docs, 60 distinct contents -> 5 copies each
    docs = spark.createDataFrame(
        [(i, f"content {i % 60}") for i in range(300)],
        "doc_id long, text string",
    )
    rows = leakage_safe_split(docs).collect()
    assert len(rows) == 300
    by_keeper = {}
    for r in rows:
        by_keeper.setdefault(r["keeper"], set()).add(r["split"])
    # every cluster lands in exactly one split
    assert all(len(s) == 1 for s in by_keeper.values())
    assert len(by_keeper) == 60

    # null text must not drop the doc (total assignment): nulls hash as
    # empty content and cluster together
    withnull = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real text")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(withnull).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["keeper"] == out[2]["keeper"] == 1  # null == '' cluster


def test_asof_join_directions_and_tolerance(spark):
    """merge_asof-parity contracts: forward matches the earliest
    right >= t (smallest right_order on ties), nearest picks the
    closer side (exact-distance ties go backward), tolerance nulls
    out-of-range matches in every direction."""
    from mahout_samsara_book_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 101), (1, 30, 102)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 8, 7, 0.1), (1, 20, 8, 0.2), (1, 20, 9, 0.3)],
        "k long, t long, rid long, val double",
    )

    def got(direction, tolerance=None):
        return {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, "k", "t", "t", ["rid"], "rid",
                direction=direction, tolerance=tolerance,
            ).collect()
        }

    # backward: most recent <= t
    assert got("backward") == {100: 7, 101: 7, 102: 9}
    # forward: earliest >= t; tie at t=20 -> SMALLEST rid
    assert got("forward") == {100: 8, 101: 8, 102: None}
    # nearest: 10 is 2 from 8 and 10 from 20 -> back; 15 is 7 back vs
    # 5 forward -> forward; 30 is 10 back -> back
    assert got("nearest") == {100: 7, 101: 8, 102: 9}
    # exact-distance tie goes backward
    tie = asof_join(
        spark.createDataFrame([(1, 14, 1)], "k long, t long, lid long"),
        right, "k", "t", "t", ["rid"], "rid", direction="nearest",
    ).first()
    assert tie["rid"] == 7  # 6 back vs 6 forward -> backward
    # tolerance prunes in every direction
    assert got("backward", tolerance=1) == {100: None, 101: None, 102: None}
    assert got("forward", tolerance=5) == {100: None, 101: 8, 102: None}
    assert got("nearest", tolerance=2) == {100: 7, 101: None, 102: None}

    # an empty payload is a contract error, not an invalid struct cast
    import pytest

    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, "k", "t", "t", [], "rid")


def test_asof_join_rejects_reserved_and_duplicate_names(spark):
    """ADVICE r9: internal working columns and payload/left collisions
    must raise, not silently mangle output."""
    import pytest

    from mahout_samsara_book_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, 5)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 9, 7)], "k long, t long, rid long"
    )
    with pytest.raises(ValueError, match="reserve"):
        asof_join(
            left.withColumnRenamed("lid", "_side"), right,
            "k", "t", "t", ["rid"], "rid",
        )
    with pytest.raises(ValueError, match="duplicate left"):
        asof_join(
            left, right.withColumnRenamed("rid", "lid"),
            "k", "t", "t", ["lid"], "lid",
        )
    with pytest.raises(ValueError, match="_rt"):
        asof_join(
            left, right.withColumnRenamed("rid", "_rt"),
            "k", "t", "t", ["_rt"], "_rt",
        )
    # the valid shape still works
    r = asof_join(left, right, "k", "t", "t", ["rid"], "rid").first()
    assert r["rid"] == 7
