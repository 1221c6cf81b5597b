"""Bucketed-layout co-location: joins and aggregations on the bucket key
must plan WITHOUT an Exchange on the bucketed sides (the 100 TB
shuffle-elimination path — README 'Correctness & scale posture')."""

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.sources.bucketing import (
    bucketed_table,
    write_bucketed,
)
from mahout_samsara_book_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed-warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{warehouse}'")
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(li, "bktdb.lineitem_b", ["l_orderkey"], 4, ["l_orderkey"])
    write_bucketed(orders, "bktdb.orders_b", ["o_orderkey"], 4, ["o_orderkey"])
    yield spark
    spark.sql("DROP DATABASE bktdb CASCADE")


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a sort-merge shape so the assertion is about bucketing, not
    # about the small fixture fitting a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = bucketed_table(spark, "bktdb.lineitem_b")
        orders = bucketed_table(spark, "bktdb.orders_b")
        joined = li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).select("l_orderkey", "o_totalprice", "l_extendedprice")
        plan = _initial_plan(joined)
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n > 0
        # value parity with the unbucketed join
        li_raw = load_table(spark, SF_DIR, "lineitem")
        o_raw = load_table(spark, SF_DIR, "orders")
        expect = li_raw.join(
            o_raw, li_raw["l_orderkey"] == o_raw["o_orderkey"]
        ).count()
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_layout_prunes_at_planning_time(spark, tmp_path_factory):
    from mahout_samsara_book_spark.sources.bucketing import (
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path_factory.mktemp("ev_part")) + "/events"
    ev = load_table(spark, SF_DIR, "events")
    write_partitioned(ev, out, ["event_type"])
    back = read_partitioned(spark, out)
    clicks = back.filter(F.col("event_type") == "click")
    plan = _initial_plan(clicks)
    # the predicate lands in PartitionFilters (directory pruning), not in
    # a post-scan Filter over the data columns
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    assert clicks.count() == n_clicks
    # the pruned slice is exactly the one directory: reading it straight
    # bypasses the filter entirely and matches
    direct = spark.read.parquet(f"{out}/event_type=click")
    assert direct.count() == n_clicks


def test_bucketed_aggregation_is_exchange_free(bucketed):
    spark = bucketed
    li = bucketed_table(spark, "bktdb.lineitem_b")
    agg = li.groupBy("l_orderkey").sum("l_quantity")
    plan = _initial_plan(agg)
    assert "Exchange" not in plan, plan
    raw = load_table(spark, SF_DIR, "lineitem")
    assert agg.count() == raw.select("l_orderkey").distinct().count()


def test_q5_chain_over_buckets_has_no_fact_shuffle(bucketed):
    """The re-planned Q5 chain (revenue_by_nation_one_exchange) over the
    bucketed layout must not shuffle at LINEITEM grain: the order-grain
    rollup is satisfied by the li bucketing, the orders join is
    co-bucketed, and the only hash exchanges left are at order grain
    (to the customer bucketing, when customer is too big to broadcast)
    and the tiny final n_name aggregate."""
    from mahout_samsara_book_spark.functions.relational import (
        revenue_by_nation_one_exchange,
    )

    spark = bucketed
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    )
    write_bucketed(cust, "bktdb.customer_b", ["c_custkey"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = revenue_by_nation_one_exchange(
            bucketed_table(spark, "bktdb.lineitem_b"),
            bucketed_table(spark, "bktdb.orders_b"),
            bucketed_table(spark, "bktdb.customer_b"),
            load_table(spark, SF_DIR, "nation"),
        )
        plan = _initial_plan(out)
        # no shuffle keyed on any lineitem-grain column
        assert "hashpartitioning(l_orderkey" not in plan, plan
        # the exchanges that remain are order-grain or the final agg
        import re

        shuffles = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
        assert set(shuffles) <= {"o_custkey", "n_name"}, plan
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
