"""Relational-category registry (SURVEY §2E): scan-agg, join chains,
windows, top-k, rollup, semi/anti joins, as-of pattern. Merged into
__spark_entry__ like entry_m5."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_samsara_book_spark.sources.tables import load_table

from mahout_samsara_book_spark.functions import relational as R
from mahout_samsara_book_spark.tmpdirs import register_tmpdir

_sci = None
_sci_sql = None


def _init(sci, sci_sql):
    global _sci, _sci_sql
    _sci, _sci_sql = sci, sci_sql


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.pricing_summary(spark, sf_dir)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        *[
            _sci(F.col(c)).alias(c)
            for c in [
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "sum_charge",
                "avg_qty",
                "avg_price",
                "avg_disc",
            ]
        ],
        F.col("count_order").cast("long").alias("count_order"),
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.revenue_by_nation(spark, sf_dir)
    return out.select(
        "n_name",
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.top_customers_per_nation(spark, sf_dir, k=3)
    return out.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("c_custkey").cast("long").alias("c_custkey"),
        _sci(F.col("c_acctbal")).alias("c_acctbal"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.order_running_totals(spark, sf_dir)
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        _sci(F.col("running_total")).alias("running_total"),
        F.col("order_seq").cast("long").alias("order_seq"),
    )


def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.sales_rollup(spark, sf_dir)
    return out.select(
        "returnflag",
        "linestatus",
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n").cast("long").alias("n"),
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.semi_anti_join(spark, sf_dir)
    return out.select(
        "c_mktsegment",
        F.col("n_with").cast("long").alias("n_with"),
        F.col("n_without").cast("long").alias("n_without"),
    )


def q_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.asof_last_event_value(spark, sf_dir)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        _sci(F.col("value")).alias("value"),
        _sci(F.col("prior_other_value")).alias("prior_other_value"),
    )


def o_pricing_summary() -> str:
    cols = {
        "sum_qty": "sum(l_quantity)",
        "sum_base_price": "sum(l_extendedprice)",
        "sum_disc_price": "sum(l_extendedprice * (1 - l_discount))",
        "sum_charge": "sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))",
        "avg_qty": "avg(l_quantity)",
        "avg_price": "avg(l_extendedprice)",
        "avg_disc": "avg(l_discount)",
    }
    sels = ", ".join(f"{_sci_sql(v)} AS {k}" for k, v in cols.items())
    return f"""
SELECT l_returnflag, l_linestatus, {sels}, count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def o_revenue_by_nation() -> str:
    return f"""
SELECT n.n_name,
       {_sci_sql('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


def o_topk_customers() -> str:
    return f"""
WITH ranked AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer
)
SELECT c_nationkey, c_custkey, {_sci_sql('c_acctbal')} AS c_acctbal,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


def o_running_totals() -> str:
    return f"""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       {_sci_sql(
           "sum(o_totalprice) OVER (PARTITION BY o_custkey "
           "ORDER BY o_orderdate, o_orderkey "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
       )} AS running_total,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS order_seq
FROM orders
"""


def o_sales_rollup() -> str:
    return f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_sci_sql('sum(l_extendedprice)')} AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def o_semi_anti() -> str:
    return """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n_with FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY 1
),
wo AS (
  SELECT c_mktsegment, count(*) AS n_without FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY 1
)
SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       coalesce(n_with, 0) AS n_with,
       coalesce(n_without, 0) AS n_without
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
"""


def o_asof_events() -> str:
    return f"""
WITH tl AS (
  SELECT user_id, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN value END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_other_value
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       {_sci_sql('value')} AS value,
       {_sci_sql('prior_other_value')} AS prior_other_value
FROM tl WHERE event_type = 'purchase'
"""


def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.revenue_pivot(spark, sf_dir)
    return out.select(
        "l_returnflag",
        _sci(F.col("rev_open")).alias("rev_open"),
        _sci(F.col("rev_filled")).alias("rev_filled"),
    )


def o_rel_pivot() -> str:
    return f"""
SELECT l_returnflag,
       {_sci_sql("sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END)")} AS rev_open,
       {_sci_sql("sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END)")} AS rev_filled
FROM lineitem GROUP BY 1
"""


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.sales_cube(spark, sf_dir)
    return out.select(
        "returnflag",
        "linestatus",
        _sci(F.col("qty")).alias("qty"),
        F.col("n").cast("long").alias("n"),
    )


def o_rel_cube() -> str:
    return f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_sci_sql('sum(l_quantity)')} AS qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_ev_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import windowed_counts

    out = windowed_counts(load_table(spark, sf_dir, "events"), "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def q_ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import sessionize

    out = sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_id").cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        "session_start",
        "session_end",
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_windowed_counts() -> str:
    return f"""
SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
       event_type, count(*) AS n,
       {_sci_sql('sum(value)')} AS total_value
FROM events GROUP BY 1, 2
"""


def q_ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.streaming.events import session_window_agg

    ev = load_table(spark, sf_dir, "events")
    out = session_window_agg(ev, gap_minutes=20)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_session_window() -> str:
    # native session_window boundary (verified by
    # test_session_window_gap_boundary): an event exactly gap after its
    # predecessor MERGES — the session's half-open window [start,
    # last+gap) treats ts == last+gap as overlap — so new-session is
    # strictly diff > gap, same rule as the composed sessionize
    gap_us = 20 * 60 * 1_000_000
    return f"""
WITH f AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       min(epoch_us(ts)) // 1000000 AS session_start,
       (max(epoch_us(ts)) + {gap_us}) // 1000000 AS session_end,
       count(*) AS n_events,
       {{SCI_TOTAL}} AS total_value
FROM s GROUP BY user_id, sid
""".replace("{SCI_TOTAL}", _sci_sql("sum(value)"))


def o_ev_sessionize() -> str:
    gap_us = 30 * 60 * 1_000_000
    return f"""
WITH f AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(epoch_us(ts)) // 1000000 AS session_start,
       max(epoch_us(ts)) // 1000000 AS session_end,
       {_sci_sql('sum(value)')} AS total_value
FROM s GROUP BY 1, 2
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.range_join_clicks_before_errors(spark, sf_dir)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("n_clicks").cast("long").alias("n_clicks"),
        _sci(F.col("click_value_sum")).alias("click_value_sum"),
    )


def o_range_join() -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS e_us
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us, value
  FROM events WHERE event_type = 'click'
)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       count(*) AS n_clicks,
       {_sci_sql('sum(c.value)')} AS click_value_sum
FROM e JOIN c ON e.user_id = c.user_id
 AND c.c_us > e.e_us - 600000000 AND c.c_us < e.e_us
GROUP BY e.event_id
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.grouping_sets_revenue(spark, sf_dir)
    return out.select(
        "returnflag",
        "linestatus",
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n").cast("long").alias("n"),
    )


def o_grouping_sets() -> str:
    return f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_sci_sql('sum(l_extendedprice)')} AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.user_event_deltas(spark, sf_dir)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("gap_us").cast("long").alias("gap_us"),
        "prev_type",
        "next_type",
    )


def o_lead_lag() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(coalesce(t_us - lag(t_us) OVER w, -1) AS BIGINT) AS gap_us,
       coalesce(lag(event_type) OVER w, 'NONE') AS prev_type,
       coalesce(lead(event_type) OVER w, 'NONE') AS next_type
FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.price_percentiles(spark, sf_dir)
    return out.select(
        "l_returnflag",
        *[_sci(F.col(c)).alias(c) for c in ["p25", "p50", "p75", "p95"]],
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_percentiles() -> str:
    cols = ", ".join(
        f"{_sci_sql(f'quantile_cont(l_extendedprice, {p})')} AS p{int(p * 100)}"
        for p in (0.25, 0.5, 0.75, 0.95)
    )
    return f"""
SELECT l_returnflag, {cols}, count(*) AS n_items
FROM lineitem GROUP BY 1
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.measure_unpivot(spark, sf_dir)
    return out.select(
        "l_returnflag",
        "measure",
        _sci(F.col("total")).alias("total"),
        F.col("n").cast("long").alias("n"),
    )


def o_unpivot() -> str:
    parts = [
        f"SELECT l_returnflag, '{m}' AS measure, "
        f"{_sci_sql(f'sum({m})')} AS total, count(*) AS n "
        f"FROM lineitem GROUP BY 1"
        for m in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ]
    return " UNION ALL ".join(parts)


def q_ev_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import (
        dedup_replayed_events,
    )

    ev = load_table(spark, sf_dir, "events")
    # simulate at-least-once delivery: every event arrives twice
    replayed = ev.unionByName(ev)
    out = dedup_replayed_events(replayed)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("t_sec").cast("long").alias("t_sec"),
        _sci(F.col("value")).alias("value"),
    )


def o_ev_dedup() -> str:
    # event_id is unique in the fixture, so dedup of the doubled relation
    # is just the original relation
    return f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t_sec,
       {_sci_sql('value')} AS value
FROM events
"""


def q_ev_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import (
        enriched_nation_counts,
    )

    out = enriched_nation_counts(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )
    return out.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_enriched() -> str:
    return f"""
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       e.event_type,
       count(*) AS n,
       {_sci_sql('sum(e.value)')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.customer_set_ops(spark, sf_dir)
    return out.select(F.col("o_custkey").cast("long").alias("o_custkey"))


def o_setops() -> str:
    return """
(SELECT CAST(o_custkey AS BIGINT) AS o_custkey FROM orders
 WHERE year(o_orderdate) = 1995
 INTERSECT
 SELECT CAST(o_custkey AS BIGINT) AS o_custkey FROM orders
 WHERE year(o_orderdate) = 1996)
EXCEPT
SELECT CAST(o_custkey AS BIGINT) AS o_custkey FROM orders
WHERE o_orderstatus = 'F'
"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.nation_volume_shipping(spark, sf_dir)
    return out.select(
        "supp_nation",
        "cust_nation",
        "ship_year",
        _sci(F.col("volume")).alias("volume"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_volume_shipping() -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       {_sci_sql('sum(l_extendedprice * (1 - l_discount))')} AS volume,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.parts_supplier_counts(spark, sf_dir)
    return out.select(
        "p_brand",
        "p_type",
        F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
    )


def o_supplier_counts() -> str:
    return """
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def q_ev_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.streaming.events import value_anomalies

    ev = load_table(spark, sf_dir, "events")
    out = value_anomalies(ev, z_thresh=3.0)
    return out.select(
        "event_id", "event_type", _sci(F.col("value")).alias("value"),
        _sci(F.col("z")).alias("z"),
    )


def o_ev_anomalies() -> str:
    return f"""
WITH stats AS (
  SELECT event_type, sum(value) AS s1, sum(value * value) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
),
m AS (SELECT event_type, s1 / n AS mu,
             sqrt((s2 - (s1 * s1) / n) / (n - 1.0)) AS sd
      FROM stats)
SELECT event_id, e.event_type, {_sci_sql('value')} AS value,
       {_sci_sql('(value - mu) / sd')} AS z
FROM events e JOIN m USING (event_type)
WHERE abs((value - mu) / sd) > 3.0
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    out = (
        salted_join(li, orders, "okey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return out.select(
        "o_orderpriority",
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_salted_join() -> str:
    # the oracle is the PLAIN join: salting must be a semantic no-op
    return f"""
SELECT o_orderpriority,
       {_sci_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


QUERIES = {
    "ev_anomalies": q_ev_anomalies,
    "rel_salted_join": q_salted_join,
    "rel_volume_shipping": q_volume_shipping,
    "rel_supplier_counts": q_supplier_counts,
    "rel_grouping_sets": q_grouping_sets,
    "rel_percentiles": q_percentiles,
    "rel_unpivot": q_unpivot,
    "rel_setops": q_setops,
    "ev_dedup": q_ev_dedup,
    "ev_enriched": q_ev_enriched,
    "rel_lead_lag": q_lead_lag,
    "rel_pivot": q_rel_pivot,
    "rel_range_join": q_range_join,
    "rel_cube": q_rel_cube,
    "ev_windowed_counts": q_ev_windowed_counts,
    "ev_sessionize": q_ev_sessionize,
    "ev_session_window": q_ev_session_window,
    "rel_pricing_summary": q_pricing_summary,
    "rel_revenue_by_nation": q_revenue_by_nation,
    "rel_topk_customers": q_topk_customers,
    "rel_running_totals": q_running_totals,
    "rel_sales_rollup": q_sales_rollup,
    "rel_semi_anti": q_semi_anti,
    "rel_asof_events": q_asof_events,
}


def oracles() -> dict[str, str]:
    return {
        "ev_anomalies": o_ev_anomalies(),
        "rel_salted_join": o_salted_join(),
        "rel_volume_shipping": o_volume_shipping(),
        "rel_supplier_counts": o_supplier_counts(),
        "rel_grouping_sets": o_grouping_sets(),
        "rel_percentiles": o_percentiles(),
        "rel_unpivot": o_unpivot(),
        "rel_setops": o_setops(),
        "ev_dedup": o_ev_dedup(),
        "ev_enriched": o_ev_enriched(),
        "rel_lead_lag": o_lead_lag(),
        "rel_pivot": o_rel_pivot(),
        "rel_range_join": o_range_join(),
        "rel_cube": o_rel_cube(),
        "ev_windowed_counts": o_ev_windowed_counts(),
        "ev_sessionize": o_ev_sessionize(),
        "ev_session_window": o_ev_session_window(),
        "rel_pricing_summary": o_pricing_summary(),
        "rel_revenue_by_nation": o_revenue_by_nation(),
        "rel_topk_customers": o_topk_customers(),
        "rel_running_totals": o_running_totals(),
        "rel_sales_rollup": o_sales_rollup(),
        "rel_semi_anti": o_semi_anti(),
        "rel_asof_events": o_asof_events(),
    }


# ------------------------------------------------------------------ #
# round-3 late additions: Q13/Q17 shapes, moment aggregates, gap-fill
# ------------------------------------------------------------------ #


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.customer_order_distribution(spark, sf_dir)
    return out.select(
        F.col("c_count").cast("long").alias("c_count"),
        F.col("custdist").cast("long").alias("custdist"),
    )


def o_custdist() -> str:
    return """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY 1
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.small_quantity_revenue(spark, sf_dir)
    return out.select(
        _sci(F.col("avg_yearly")).alias("avg_yearly"),
        F.col("n_small").cast("long").alias("n_small"),
    )


def o_small_qty_revenue() -> str:
    return f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
li_b AS (SELECT l_partkey, l_quantity, l_extendedprice
         FROM lineitem JOIN bp ON l_partkey = p_partkey),
th AS (SELECT l_partkey AS t_partkey, avg(l_quantity) * 0.2 AS qty_lim
       FROM li_b GROUP BY 1)
SELECT {_sci_sql('sum(l_extendedprice) / 7.0')} AS avg_yearly,
       count(*) AS n_small
FROM li_b JOIN th ON l_partkey = t_partkey
WHERE l_quantity < qty_lim
"""


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.bivariate_stats(spark, sf_dir)
    return out.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("qty_price_corr")).alias("qty_price_corr"),
        _sci(F.col("qty_price_cov")).alias("qty_price_cov"),
        _sci(F.col("qty_sd")).alias("qty_sd"),
        _sci(F.col("price_sd")).alias("price_sd"),
    )


def o_stats_agg() -> str:
    return f"""
SELECT l_returnflag, count(*) AS n,
       {_sci_sql('corr(l_quantity, l_extendedprice)')} AS qty_price_corr,
       {_sci_sql('covar_samp(l_quantity, l_extendedprice)')} AS qty_price_cov,
       {_sci_sql('stddev_samp(l_quantity)')} AS qty_sd,
       {_sci_sql('stddev_samp(l_extendedprice)')} AS price_sd
FROM lineitem GROUP BY 1
"""


def q_ev_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.event_hourly_gapfill(spark, sf_dir)
    return out.select(
        "event_type",
        F.col("hour").cast("long").alias("hour"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def o_ev_gapfill() -> str:
    return """
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour FROM events),
c AS (SELECT event_type, hour, count(*) AS n_events FROM h GROUP BY 1, 2),
ex AS (SELECT min(hour) AS mn, max(hour) AS mx FROM h),
axis AS (SELECT t.event_type, s.hour
         FROM (SELECT DISTINCT event_type FROM h) t
         CROSS JOIN (SELECT unnest(generate_series(mn, mx)) AS hour
                     FROM ex) s)
SELECT a.event_type, a.hour, coalesce(c.n_events, 0) AS n_events
FROM axis a LEFT JOIN c ON a.event_type = c.event_type AND a.hour = c.hour
"""


QUERIES.update(
    {
        "rel_custdist": q_custdist,
        "rel_small_qty_revenue": q_small_qty_revenue,
        "rel_stats_agg": q_stats_agg,
        "ev_gapfill": q_ev_gapfill,
    }
)

_LATE_ORACLES = {
    "rel_custdist": o_custdist,
    "rel_small_qty_revenue": o_small_qty_revenue,
    "rel_stats_agg": o_stats_agg,
    "ev_gapfill": o_ev_gapfill,
}

_orig_oracles = oracles


def oracles() -> dict[str, str]:  # noqa: F811 — extend the registry
    out = _orig_oracles()
    out.update({k: f() for k, f in _LATE_ORACLES.items()})
    return out


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.waiting_suppliers(spark, sf_dir)
    return out.select("s_name", F.col("numwait").cast("long").alias("numwait"))


def o_waiting_suppliers() -> str:
    return """
WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, count(*) AS numwait
FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.idle_rich_customers(spark, sf_dir)
    return out.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("numcust").cast("long").alias("numcust"),
        _sci(F.col("totacctbal")).alias("totacctbal"),
    )


def o_idle_customers() -> str:
    return f"""
WITH ab AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust,
       {_sci_sql('sum(c_acctbal)')} AS totacctbal
FROM customer, ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '2001-01-01')
GROUP BY 1
"""


QUERIES.update(
    {
        "rel_waiting_suppliers": q_waiting_suppliers,
        "rel_idle_customers": q_idle_customers,
    }
)
_LATE_ORACLES.update(
    {
        "rel_waiting_suppliers": o_waiting_suppliers,
        "rel_idle_customers": o_idle_customers,
    }
)


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.order_priority_check(spark, sf_dir)
    return out.select(
        "o_orderpriority", F.col("order_count").cast("long").alias("order_count")
    )


def o_order_priority() -> str:
    return """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


QUERIES.update({"rel_order_priority": q_order_priority})
_LATE_ORACLES.update({"rel_order_priority": o_order_priority})


def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.top_value_suppliers(spark, sf_dir)
    return out.select(
        F.col("l_suppkey").cast("long").alias("l_suppkey"),
        _sci(F.col("value")).alias("value"),
    )


def o_top_suppliers() -> str:
    return f"""
WITH sv AS (SELECT l_suppkey,
                   sum(l_extendedprice * (1 - l_discount)) AS value
            FROM lineitem GROUP BY 1)
SELECT l_suppkey, {_sci_sql('value')} AS value
FROM sv
WHERE value > (SELECT avg(value) * 1.05 FROM sv)
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.disjunctive_predicate_revenue(spark, sf_dir)
    return out.select(
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_disjunctive_revenue() -> str:
    return f"""
SELECT {_sci_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


QUERIES.update(
    {
        "rel_top_suppliers": q_top_suppliers,
        "rel_disjunctive_revenue": q_disjunctive_revenue,
    }
)
_LATE_ORACLES.update(
    {
        "rel_top_suppliers": o_top_suppliers,
        "rel_disjunctive_revenue": o_disjunctive_revenue,
    }
)


def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.local_supplier_volume(spark, sf_dir)
    return out.select("n_name", _sci(F.col("revenue")).alias("revenue"))


def o_local_volume() -> str:
    return f"""
SELECT n_name,
       {_sci_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY 1
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.returned_item_reporting(spark, sf_dir)
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        "n_name",
        _sci(F.col("revenue")).alias("revenue"),
    )


def o_returned_items() -> str:
    return f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       {_sci_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
GROUP BY 1, 2, 3
"""


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.promo_revenue_share(spark, sf_dir)
    return out.select(
        _sci(F.col("promo_pct")).alias("promo_pct"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_promo_share() -> str:
    promo = (
        "100.0 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
        "/ sum(l_extendedprice * (1 - l_discount))"
    )
    return f"""
SELECT {_sci_sql(promo)} AS promo_pct, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
"""


def q_top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.top_quarter_supplier(spark, sf_dir)
    return out.select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        _sci(F.col("total_rev")).alias("total_rev"),
    )


def o_top_quarter_supplier() -> str:
    return f"""
WITH sr AS MATERIALIZED (
  -- MATERIALIZED: DuckDB inlines plain CTEs per reference; the max
  -- subquery would re-aggregate with a different fold order and the
  -- float-equality selection would miss every row (bit-identical
  -- total_rev values require computing sr exactly once)
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       {_sci_sql('total_rev')} AS total_rev
FROM sr JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM sr)
"""


def q_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.heavy_shippers_of_named_parts(spark, sf_dir)
    return out.select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name"
    )


def o_heavy_shippers() -> str:
    return """
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
sq AS (SELECT l_suppkey, sum(l_quantity) AS qty
       FROM lineitem JOIN red ON l_partkey = p_partkey GROUP BY 1)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM sq
                    WHERE qty > (SELECT avg(qty) * 1.05 FROM sq))
"""


QUERIES.update(
    {
        "rel_local_volume": q_local_volume,
        "rel_returned_items": q_returned_items,
        "rel_promo_share": q_promo_share,
        "rel_top_quarter_supplier": q_top_quarter_supplier,
        "rel_heavy_shippers": q_heavy_shippers,
    }
)
_LATE_ORACLES.update(
    {
        "rel_local_volume": o_local_volume,
        "rel_returned_items": o_returned_items,
        "rel_promo_share": o_promo_share,
        "rel_top_quarter_supplier": o_top_quarter_supplier,
        "rel_heavy_shippers": o_heavy_shippers,
    }
)


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.forecast_revenue_change(spark, sf_dir)
    return out.select(
        _sci(F.col("revenue_delta")).alias("revenue_delta"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_forecast_revenue() -> str:
    return f"""
SELECT {_sci_sql('sum(l_extendedprice * l_discount)')} AS revenue_delta,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = R.national_market_share(spark, sf_dir)
    return out.select(
        F.col("o_year").cast("long").alias("o_year"),
        _sci(F.col("mkt_share")).alias("mkt_share"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def o_market_share() -> str:
    share = (
        "sum(CASE WHEN ns.n_name = 'NATION_3' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
        "/ sum(l_extendedprice * (1 - l_discount))"
    )
    return f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {_sci_sql(share)} AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY 1
"""


QUERIES.update(
    {
        "rel_forecast_revenue": q_forecast_revenue,
        "rel_market_share": q_market_share,
    }
)
_LATE_ORACLES.update(
    {
        "rel_forecast_revenue": o_forecast_revenue,
        "rel_market_share": o_market_share,
    }
)


# ------------------------------------------------------------------ #
# sliding-window activity (round-3 late batch)
# ------------------------------------------------------------------ #

SLIDE_WIDTH_S = 3600
SLIDE_STEP_S = 900


def q_ev_sliding_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import (
        sliding_active_users,
    )

    out = sliding_active_users(
        load_table(spark, sf_dir, "events"), "1 hour", "15 minutes"
    )
    return out.select(
        "window_start",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def o_ev_sliding_active() -> str:
    n = SLIDE_WIDTH_S // SLIDE_STEP_S
    return f"""
WITH t AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events),
w AS (
  SELECT user_id, ((sec // {SLIDE_STEP_S}) - i) * {SLIDE_STEP_S} AS ws
  FROM t, LATERAL unnest(generate_series(0, {n - 1})) AS g(i)
)
SELECT ws AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY 1
"""


QUERIES.update({"ev_sliding_active": q_ev_sliding_active})
_LATE_ORACLES.update({"ev_sliding_active": o_ev_sliding_active})


# ------------------------------------------------------------------ #
# executed Structured Streaming twin (round-3 late batch)
# ------------------------------------------------------------------ #


def q_ev_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlike ev_windowed_counts (the batch plan), this entry runs the
    actual streaming engine — availableNow micro-batches into a
    complete-mode memory sink — and is checked against the SAME batch
    oracle: the streaming twin must compute the batch answer."""
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_windowed_counts,
    )

    out = run_stream_windowed_counts(spark, sf_dir, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


QUERIES.update({"ev_stream_windowed": q_ev_stream_windowed})
_LATE_ORACLES.update({"ev_stream_windowed": o_ev_windowed_counts})


def q_ev_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment through the ACTUAL streaming engine
    (readStream events ⋈ broadcast static customers, complete-mode
    memory sink, availableNow) checked against the SAME batch oracle as
    ev_enriched: the streaming twin must compute the batch answer."""
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_enriched_counts,
    )

    out = run_stream_enriched_counts(spark, sf_dir)
    return out.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


QUERIES.update({"ev_stream_enriched": q_ev_stream_enriched})
_LATE_ORACLES.update({"ev_stream_enriched": o_ev_enriched})


def q_ev_stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION unbounded streaming shape — watermark + APPEND
    output mode — executed through the real engine (readStream,
    availableNow micro-batch, state-store eviction, final no-data
    batch). Unlike the complete-mode twins, state here is O(open
    windows): each window row is emitted exactly once when the
    watermark passes its end, then evicted — the only form that
    survives an unbounded 100 TB stream. Emission is STRICT
    (window_end < watermark, verified by
    tests/test_streaming_exec.py boundary case), so the oracle is the
    batch aggregation filtered to windows that closed before the final
    watermark (= max event-time second at 0s delay)."""
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_windowed_append,
    )

    out = run_stream_windowed_append(spark, sf_dir, "1 hour", "0 seconds")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_stream_append() -> str:
    return f"""
WITH mx AS (SELECT max(epoch_us(ts) // 1000000) AS m FROM events),
agg AS (
  SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n,
         {_sci_sql('sum(value)')} AS total_value
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n, total_value
FROM agg, mx
WHERE window_start + 3600 < mx.m
"""


QUERIES.update({"ev_stream_append": q_ev_stream_append})
_LATE_ORACLES.update({"ev_stream_append": o_ev_stream_append})


def q_ev_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows EXECUTED through the streaming engine in
    the production APPEND shape (round 7 — the 7th executed streaming
    entry): UpdatingSessions state-store merge per micro-batch, each
    session emitted exactly once when the watermark passes its close
    (last event + gap), state evicted behind it — the only
    sessionization form that survives an unbounded 100 TB stream. The
    oracle is the batch session replay (same strict-lag gap rule as
    ev_session_window) filtered to sessions that CLOSED before the
    final watermark — strict ``end < watermark`` in microseconds, the
    same emission rule pinned for windowed append — which on the
    bounded fixture withholds exactly each user's trailing still-open
    session (verified: stream = batch − 4 open sessions at sf0.01)."""
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_session_counts,
    )

    out = run_stream_session_counts(spark, sf_dir, gap_minutes=20)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_stream_session() -> str:
    gap_us = 20 * 60 * 1_000_000
    return f"""
WITH f AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
),
mx AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 AS wm_us FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       min(epoch_us(ts)) // 1000000 AS session_start,
       (max(epoch_us(ts)) + {gap_us}) // 1000000 AS session_end,
       count(*) AS n_events,
       {_sci_sql('sum(value)')} AS total_value
FROM s, mx
GROUP BY user_id, sid, mx.wm_us
HAVING max(epoch_us(ts)) + {gap_us} < mx.wm_us
"""


QUERIES.update({"ev_stream_session": q_ev_stream_session})
_LATE_ORACLES.update({"ev_stream_session": o_ev_stream_session})


def q_ev_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM watermarked interval join through the real engine
    (two readStream sources, state-store buffering per user key,
    event-time range eviction, append mode — the only mode stream-stream
    inner joins support). The batch twin is rel_range_join; this entry
    proves the stateful streaming form computes the same matches. Times
    are truncated-to-second event times (with_event_time), so the
    oracle replays the predicate on epoch seconds, not raw µs."""
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_click_error_join,
    )

    out = run_stream_click_error_join(spark, sf_dir)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("error_id").cast("long").alias("error_id"),
        F.col("error_time").cast("long").alias("error_s"),
        F.col("click_time").cast("long").alias("click_s"),
        _sci(F.col("click_value")).alias("click_value"),
    )


def o_ev_stream_join() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id AS error_id,
         epoch_us(ts) // 1000000 AS e_s
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS c_s, value
  FROM events WHERE event_type = 'click'
)
SELECT CAST(e.user_id AS BIGINT) AS user_id,
       CAST(e.error_id AS BIGINT) AS error_id,
       CAST(e.e_s AS BIGINT) AS error_s,
       CAST(c.c_s AS BIGINT) AS click_s,
       {_sci_sql('c.value')} AS click_value
FROM e JOIN c ON e.user_id = c.user_id
 AND c.c_s > e.e_s - 600 AND c.c_s < e.e_s
"""


QUERIES.update({"ev_stream_join": q_ev_stream_join})
_LATE_ORACLES.update({"ev_stream_join": o_ev_stream_join})


def q_ev_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful operator through the real streaming engine:
    ``applyInPandasWithState`` per-key running totals (arbitrary Python
    state per key — the template for streamed sketches, session models,
    online learners), availableNow, update-mode emissions folded to the
    final state per key. On the bounded fixture the final state equals
    the batch aggregate — the oracle twin."""
    from mahout_samsara_book_spark.streaming.stateful import (
        run_stream_stateful_totals,
    )

    out = run_stream_stateful_totals(spark, sf_dir)
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_stream_stateful() -> str:
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {_sci_sql('sum(value)')} AS total_value
FROM events GROUP BY 1
"""


QUERIES.update({"ev_stream_stateful": q_ev_stream_stateful})
_LATE_ORACLES.update({"ev_stream_stateful": o_ev_stream_stateful})


_PART_RT_SEQ = [0]


def q_fmt_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruning proof in the gate: events written to a
    Hive-partitioned layout (``event_type=…/`` directories — the 100 TB
    data-skipping primitive), read back through the partition-aware
    reader, filtered to ONE type, and aggregated. The filter never
    touches the other types' files — it prunes whole directories at
    planning time (PartitionFilters on the scan, asserted in
    tools/explain_audit.py) — and the oracle aggregates the ORIGINAL
    parquet with the same predicate, so a hash-match certifies the
    partitioned write/read/prune edge loses nothing. Output dir is
    pid-qualified + sequence-numbered (same concurrency contract as
    fmt_bucketed_join)."""
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.formats import (
        read_partitioned,
        write_partitioned,
    )
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import windowed_counts

    _PART_RT_SEQ[0] += 1
    path = register_tmpdir(
        tempfile.gettempdir()
        + f"/spark_graft_part_rt_{os.getpid()}_{_PART_RT_SEQ[0]}"
    )
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, path, ["event_type"])
    back = read_partitioned(spark, path).filter(
        F.col("event_type") == "click"
    )
    out = windowed_counts(back, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_fmt_partitioned_prune() -> str:
    return f"""
SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
       event_type, CAST(count(*) AS BIGINT) AS n,
       {_sci_sql('sum(value)')} AS total_value
FROM events WHERE event_type = 'click' GROUP BY 1, 2
"""


QUERIES.update({"fmt_partitioned_prune": q_fmt_partitioned_prune})
_LATE_ORACLES.update({"fmt_partitioned_prune": o_fmt_partitioned_prune})


_CSV_RT_SEQ = [0]


def q_fmt_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-zone ingestion edge in the gate: events → CSV (header,
    explicit timestamp format) → read back with the EXPLICIT schema
    (inference is a full extra pass at 100 TB and silently widens
    types) → windowed aggregate. Oracle aggregates the ORIGINAL
    parquet, so a hash-match certifies the CSV write/read edge —
    including microsecond TIMESTAMP_NTZ fidelity through the text
    format — loses nothing."""
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.formats import read_csv, write_csv
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import windowed_counts

    _CSV_RT_SEQ[0] += 1
    path = register_tmpdir(
        tempfile.gettempdir()
        + f"/spark_graft_csv_rt_{os.getpid()}_{_CSV_RT_SEQ[0]}"
    )
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    write_csv(ev, path)
    back = read_csv(spark, path, ev.schema)
    out = windowed_counts(back, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


QUERIES.update({"fmt_csv_roundtrip": q_fmt_csv_roundtrip})
_LATE_ORACLES.update({"fmt_csv_roundtrip": o_ev_windowed_counts})


def q_fmt_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines twin of fmt_csv_roundtrip — the other landing-zone
    format (full fidelity for nested types, pinned timestamp format,
    explicit schema on read)."""
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.formats import (
        read_jsonl,
        write_jsonl,
    )
    from mahout_samsara_book_spark.sources.tables import load_table
    from mahout_samsara_book_spark.streaming.events import windowed_counts

    _CSV_RT_SEQ[0] += 1
    path = register_tmpdir(
        tempfile.gettempdir()
        + f"/spark_graft_jsonl_rt_{os.getpid()}_{_CSV_RT_SEQ[0]}"
    )
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    write_jsonl(ev, path)
    back = read_jsonl(spark, path, ev.schema)
    out = windowed_counts(back, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


QUERIES.update({"fmt_jsonl_roundtrip": q_fmt_jsonl_roundtrip})
_LATE_ORACLES.update({"fmt_jsonl_roundtrip": o_ev_windowed_counts})


def q_fmt_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read in the gate: a 100 TB table accretes
    columns over years of ingest, so old files lack what new files
    carry. Half the events (by even/odd event_id) are written WITHOUT
    the ``value`` column (the 'old generation'), half with it; a
    ``mergeSchema`` read unifies them — old rows surface NULL values —
    and the per-type aggregate counts rows and non-null values. The
    oracle replays the generation split analytically on the original
    parquet, so the hash-match certifies missing-column null-fill and
    cross-file schema unification."""
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.tables import load_table

    _CSV_RT_SEQ[0] += 1
    path = register_tmpdir(
        tempfile.gettempdir()
        + f"/spark_graft_merge_rt_{os.getpid()}_{_CSV_RT_SEQ[0]}"
    )
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    old_gen = ev.filter(F.col("event_id") % 2 == 0).drop("value")
    new_gen = ev.filter(F.col("event_id") % 2 == 1)
    old_gen.write.parquet(f"{path}/gen=0")
    new_gen.write.parquet(f"{path}/gen=1")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=0", f"{path}/gen=1"
    )
    out = back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("value").alias("n_with_value"),
        F.sum("value").alias("value_sum"),
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_with_value").cast("long").alias("n_with_value"),
        _sci(F.col("value_sum")).alias("value_sum"),
    )


def o_fmt_schema_merge() -> str:
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_value,
       {_sci_sql('sum(CASE WHEN event_id % 2 = 1 THEN value ELSE NULL END)')}
         AS value_sum
FROM events GROUP BY 1
"""


QUERIES.update({"fmt_schema_merge": q_fmt_schema_merge})
_LATE_ORACLES.update({"fmt_schema_merge": o_fmt_schema_merge})


def q_ev_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay dedup through the REAL streaming engine:
    ``dropDuplicatesWithinWatermark`` over a doubled source (two copies
    of the events file), state bounded by the watermark horizon. The
    batch twin is ev_dedup; the oracle is the original relation (dups
    are full-row identical, so the surviving copy is immaterial)."""
    from mahout_samsara_book_spark.streaming.events import run_stream_dedup

    out = run_stream_dedup(spark, sf_dir)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("t_sec").cast("long").alias("t_sec"),
        _sci(F.col("value")).alias("value"),
    )


QUERIES.update({"ev_stream_dedup": q_ev_stream_dedup})
_LATE_ORACLES.update({"ev_stream_dedup": o_ev_dedup})


# ------------------------------------------------------------------ #
# 2D skyline + ORC sink round-trip (round-3 late batch)
# ------------------------------------------------------------------ #


def q_rel_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders minimizing (o_totalprice,
    o_orderdate-recency stand-in): an order is on the skyline iff no
    other order is ≤ on both dims with < on at least one. The 2D
    skyline needs NO pairwise join: sort by (price asc, date asc) and
    keep rows strictly below the running date minimum — one window
    pass. At 100 TB the global sort is a range-partitioned exchange
    (Spark's sort shape), still one pass; higher dims would need the
    grid/partition skyline algorithms."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    w = (
        Window.orderBy(
            F.col("o_totalprice").asc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),  # canonical tiebreak: coincident
            # points keep only the smallest key (deterministic on both
            # engines; without it, equal (price, date) pairs would keep
            # an arbitrary member)
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_min = F.min("o_orderdate").over(w)
    out = orders.withColumn("_m", run_min).filter(
        F.col("_m").isNull() | (F.col("o_orderdate") < F.col("_m"))
    )
    return out.select(
        "o_orderkey",
        _sci(F.col("o_totalprice")).alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


def o_rel_skyline() -> str:
    return f"""
WITH s AS (
  SELECT o_orderkey, o_totalprice, o_orderdate,
         min(o_orderdate) OVER (
             ORDER BY o_totalprice, o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
  FROM orders
)
SELECT o_orderkey, {_sci_sql('o_totalprice')} AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM s WHERE m IS NULL OR o_orderdate < m
"""


QUERIES.update({"rel_skyline": q_rel_skyline})
_LATE_ORACLES.update({"rel_skyline": o_rel_skyline})


_ORC_RT_SEQ = [0]
# write-once ORC layout per (sf_dir, source fingerprint) — round-8,
# VERDICT r7 item 8: re-invocations (bench reps, repeated driver calls)
# measure the READ path; the write edge is still certified because the
# first invocation in every process writes, and the oracle's hash-match
# covers whichever invocation the driver graded.  Round-9 (ADVICE r8):
# the key carries the SOURCE table's (bytes, mtime) fingerprint instead
# of id(sparkContext) — a regenerated fixture at the same path, or a
# CPython id reuse after the old context is collected, can no longer
# serve a stale layout.  The write wall-seconds are recorded per key so
# bench/SCALING can report the write edge alongside the warm read path.
_ORC_LAYOUTS: dict[tuple, str] = {}
ORC_WRITE_SECS: dict[tuple, float] = {}


def q_fmt_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink correctness in the gate: events → ORC (zlib, full
    TIMESTAMP_NTZ fidelity) → read back → windowed aggregate; the
    oracle aggregates the ORIGINAL parquet, so a hash-match certifies
    the write/read edge lost nothing. The layout is written ONCE per
    (sf_dir, source fingerprint) — like ``_q5_bucketed_layout`` — so
    repeated invocations time the READ+aggregate path, not a redundant
    re-write (the write edge's wall-seconds are recorded in
    ``ORC_WRITE_SECS`` and surfaced by bench.py as ``fmt_orc_write_sec``
    so the two are never conflated — ADVICE r8); the path is
    pid-qualified so concurrent drivers never clobber each other, and
    cached layouts are never overwritten so pending lazy reads stay
    valid."""
    import os
    import shutil
    import tempfile
    import time

    from mahout_samsara_book_spark.sources.formats import (
        read_orc,
        write_orc,
    )
    from mahout_samsara_book_spark.sources.tables import (
        load_table,
        source_fingerprint,
    )
    from mahout_samsara_book_spark.streaming.events import windowed_counts

    key = (sf_dir, source_fingerprint(sf_dir, "events"))
    path = _ORC_LAYOUTS.get(key)
    if path is None or not os.path.exists(path + "/_SUCCESS"):
        _ORC_RT_SEQ[0] += 1
        path = register_tmpdir(
            tempfile.gettempdir()
            + f"/spark_graft_orc_rt_{os.getpid()}_{_ORC_RT_SEQ[0]}"
        )
        shutil.rmtree(path, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        t0 = time.perf_counter()
        write_orc(ev, path)
        ORC_WRITE_SECS[key] = time.perf_counter() - t0
        _ORC_LAYOUTS[key] = path
    back = read_orc(spark, path)
    out = windowed_counts(back, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


QUERIES.update({"fmt_orc_roundtrip": q_fmt_orc_roundtrip})
_LATE_ORACLES.update({"fmt_orc_roundtrip": o_ev_windowed_counts})


_BKT_SEQ = [0]


def q_fmt_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-layout correctness in the gate (closes VERDICT r4
    'missing' item 4, previously pytest-only): lineitem + orders are
    written ONCE bucketed by order key into an explicit-LOCATION
    database — which works under ANY session's warehouse config, the
    reason saveAsTable was previously untestable from the driver — read
    back through the catalog (the catalog, not the reader, carries the
    bucket spec), joined on the bucket key, and aggregated. The join is
    exchange-free on both bucketed sides (plan asserted in
    tests/test_bucketing.py); the oracle runs the same join over the
    ORIGINAL parquet, so a hash-match certifies the bucketed
    write/read/join edge loses nothing. Output DB is per-invocation
    (sequence-numbered, like fmt_orc_roundtrip) so a pending lazy read
    is never clobbered by a re-run."""
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.bucketing import (
        bucketed_table,
        write_bucketed,
    )
    from mahout_samsara_book_spark.sources.tables import load_table

    _BKT_SEQ[0] += 1
    # pid-qualified: two concurrent driver processes on one host must
    # never rmtree/overwrite each other's table location (ADVICE r5)
    db = f"spark_graft_bkt_{os.getpid()}_{_BKT_SEQ[0]}"
    loc = register_tmpdir(tempfile.gettempdir() + f"/{db}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # the two bucketed writes are independent jobs into disjoint tables
    # — overlap them from driver threads (guide §2.6), same discipline
    # as the dedup index's bucket/shingle writes.  pyspark
    # InheritableThread (ADVICE r12): saveAsTable issues catalog DDL,
    # and the documented way to submit parallel driver-side jobs is an
    # InheritableThread so JVM thread-local properties (job
    # group/description/cancellation) are inherited and cleaned up —
    # plain pool threads were fine on the in-memory catalog but flaky
    # under a Hive/Derby metastore.
    from pyspark import InheritableThread

    errs: list = []

    def _run(df, table, bucket_cols, n, sort_cols) -> None:
        try:
            write_bucketed(df, table, bucket_cols, n, sort_cols)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errs.append(e)

    threads = [
        InheritableThread(
            target=_run,
            args=(li, f"{db}.lineitem_b", ["l_orderkey"], 4, ["l_orderkey"]),
        ),
        InheritableThread(
            target=_run,
            args=(
                orders, f"{db}.orders_b", ["o_orderkey"], 4, ["o_orderkey"],
            ),
        ),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    lb = bucketed_table(spark, f"{db}.lineitem_b")
    ob = bucketed_table(spark, f"{db}.orders_b")
    out = (
        lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev"),
        )
    )
    return out.select(
        "o_orderpriority",
        F.col("n_items").cast("long").alias("n_items"),
        _sci(F.col("rev")).alias("rev"),
    )


def o_fmt_bucketed_join() -> str:
    return f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {_sci_sql("sum(l_extendedprice * (1.0 - l_discount))")} AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


QUERIES.update({"fmt_bucketed_join": q_fmt_bucketed_join})
_LATE_ORACLES.update({"fmt_bucketed_join": o_fmt_bucketed_join})


# write-once layout cache: a bucketed LAYOUT's semantic is write once,
# query many — re-invocations of the Q5 chain in the same process (bench
# reps, repeated driver calls) must measure the JOIN, not re-pay the
# write. Keyed by (sf_dir, source fingerprints) — round-9 (ADVICE r8):
# a regenerated fixture changes the fingerprint and forces a fresh
# layout; session identity is covered by the catalog re-verification
# below. The db name stays pid-qualified so concurrent driver processes
# never clobber each other, and the cached tables are never overwritten
# so pending lazy reads stay valid.
_Q5B_LAYOUTS: dict[tuple, str] = {}


def _q5_bucketed_layout(spark: SparkSession, sf_dir: str) -> str:
    import os
    import shutil
    import tempfile

    from mahout_samsara_book_spark.sources.bucketing import write_bucketed
    from mahout_samsara_book_spark.sources.tables import (
        load_table,
        source_fingerprint,
    )

    key = (
        sf_dir,
        source_fingerprint(sf_dir, "lineitem"),
        source_fingerprint(sf_dir, "orders"),
        source_fingerprint(sf_dir, "customer"),
    )
    db = _Q5B_LAYOUTS.get(key)
    # re-verify through the catalog: an id() can be reused after a
    # session restart in the same process, where the cached name would
    # point at tables the fresh catalog no longer knows
    if db is not None and spark.catalog.tableExists(f"{db}.lineitem_b"):
        return db
    _BKT_SEQ[0] += 1
    db = f"spark_graft_q5b_{os.getpid()}_{_BKT_SEQ[0]}"
    loc = register_tmpdir(tempfile.gettempdir() + f"/{db}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    write_bucketed(li, f"{db}.lineitem_b", ["l_orderkey"], 8)
    write_bucketed(orders, f"{db}.orders_b", ["o_orderkey"], 8)
    write_bucketed(cust, f"{db}.customer_b", ["c_custkey"], 8)
    _Q5B_LAYOUTS[key] = db
    return db


def q_rel_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 chain over the bucketed layout (VERDICT r6 item 4): lineitem
    + orders bucketed by order key, customer bucketed by c_custkey,
    written ONCE per (session, sf_dir) into an explicit-LOCATION
    database (see ``_q5_bucketed_layout``) and read back through the
    catalog. The chain re-plans as ``revenue_by_nation_one_exchange``
    — order-grain pre-aggregation + co-bucketed joins, so the only
    fact-side exchange is the order-grain aggregate moving to the
    customer bucketing (the sf10 answer to the 23× broadcast→shuffle
    boundary on the plain chain). The oracle is the PLAIN Q5 SQL over
    the original parquet: a hash-match certifies both the layout
    round-trip and the algebraic re-plan (order-grain rollup ==
    countDistinct semantics) lose nothing. (fmt_bucketed_join keeps
    its per-invocation write deliberately — it certifies the WRITE
    edge; this query certifies the layout-consuming JOIN.)"""
    from mahout_samsara_book_spark.functions.relational import (
        revenue_by_nation_one_exchange,
    )
    from mahout_samsara_book_spark.sources.bucketing import bucketed_table
    from mahout_samsara_book_spark.sources.tables import load_table

    db = _q5_bucketed_layout(spark, sf_dir)
    out = revenue_by_nation_one_exchange(
        bucketed_table(spark, f"{db}.lineitem_b"),
        bucketed_table(spark, f"{db}.orders_b"),
        bucketed_table(spark, f"{db}.customer_b"),
        load_table(spark, sf_dir, "nation"),
    )
    return out.select(
        "n_name",
        _sci(F.col("revenue")).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


def o_rel_revenue_bucketed() -> str:
    return o_revenue_by_nation()


QUERIES.update({"rel_revenue_by_nation_bucketed": q_rel_revenue_bucketed})
_LATE_ORACLES.update(
    {"rel_revenue_by_nation_bucketed": o_rel_revenue_bucketed}
)


# ------------------------------------------------------------------ #
# first-touch session attribution, YoY growth, MAD outliers
# (round-3 late batch)
# ------------------------------------------------------------------ #

ATTR_GAP_MIN = 30


def q_ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each gap-session's total value is
    credited to the event type that OPENED the session — the marketing
    attribution shape. Same one-shuffle lag+cumsum sessionization as
    ev_sessionize, plus a per-session rank to pick the opener (fully
    deterministic: (t_us, event_id) order) and one final aggregate on
    the opener type."""
    from pyspark.sql import Window

    from mahout_samsara_book_spark.sources.tables import load_table, ts_us

    gap_us = ATTR_GAP_MIN * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("t_us", ts_us(ev))
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.withColumn(
        "ns",
        F.when(
            (F.lag("t_us").over(w).isNull())
            | (F.col("t_us") - F.lag("t_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "t_us", "event_id"
    )
    sess = (
        flagged.withColumn("rn", F.row_number().over(ws))
        .groupBy("user_id", "session_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
                "first_type"
            ),
            F.sum("value").alias("sv"),
        )
    )
    out = sess.groupBy("first_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum("sv").alias("attributed_value"),
    )
    return out.select(
        F.col("first_type").alias("event_type"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        _sci(F.col("attributed_value")).alias("attributed_value"),
    )


def o_ev_attribution() -> str:
    gap_us = ATTR_GAP_MIN * 60 * 1_000_000
    return f"""
WITH f AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM f
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS rn
  FROM s
),
sess AS (
  SELECT user_id, session_id,
         max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
         sum(value) AS sv
  FROM r GROUP BY 1, 2
)
SELECT first_type AS event_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       {_sci_sql('sum(sv)')} AS attributed_value
FROM sess GROUP BY 1
"""


def q_rel_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: the reporting shape
    every warehouse runs — join chain, yearly rollup, one lag window
    per nation. First-year growth is NULL → 'NA' (the sci convention's
    explicit null)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    out = rev.withColumn(
        "growth", F.col("revenue") / F.lag("revenue").over(w)
    )
    return out.select(
        "n_name",
        F.col("yr").cast("long").alias("yr"),
        _sci(F.col("revenue")).alias("revenue"),
        _sci(F.col("growth")).alias("growth"),
    )


def o_rel_yearly_growth() -> str:
    return f"""
WITH rev AS (
  SELECT n_name, year(o_orderdate) AS yr,
         sum(l_extendedprice * (1.0 - l_discount)) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(yr AS BIGINT) AS yr,
       {_sci_sql('revenue')} AS revenue,
       {_sci_sql('revenue / lag(revenue) OVER (PARTITION BY n_name ORDER BY yr)')} AS growth
FROM rev
"""


MAD_MULT = 5.0


def q_ev_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate: per event type, flag events whose value
    deviates from the type's MEDIAN by more than 5× the median absolute
    deviation — the heavy-tail-safe alternative to ev_anomalies'
    z-score (mean/stddev are themselves dragged by the outliers they
    hunt). Both medians are exact LOWER order statistics at rank
    ⌊(n−1)/2⌋ in (value, event_id) order — pure selection, no
    interpolation, so the replay is bit-exact. Two rank windows per
    type + one broadcast join of the per-type thresholds."""
    from pyspark.sql import Window

    from mahout_samsara_book_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        ev.withColumn("rn", F.row_number().over(w1))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rn") == F.expr("(n - 1) div 2") + 1)
        .select(F.col("event_type"), F.col("value").alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    w2 = Window.partitionBy("event_type").orderBy("adev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w2))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rn") == F.expr("(n - 1) div 2") + 1)
        .select(F.col("event_type"), F.col("adev").alias("mad"))
    )
    out = dev.join(F.broadcast(mad), "event_type").filter(
        F.col("adev") > F.lit(MAD_MULT) * F.col("mad")
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        _sci(F.col("value")).alias("value"),
        _sci(F.col("adev")).alias("adev"),
    )


def o_ev_mad_outliers() -> str:
    return f"""
WITH e AS (SELECT event_id, event_type, value FROM events),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
),
med AS (
  SELECT event_type, value AS med FROM r1
  WHERE rn = (n - 1) // 2 + 1
),
dev AS (
  SELECT e.event_id, e.event_type, e.value,
         abs(e.value - m.med) AS adev
  FROM e JOIN med m USING (event_type)
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY adev, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, adev AS mad FROM r2
  WHERE rn = (n - 1) // 2 + 1
)
SELECT CAST(d.event_id AS BIGINT) AS event_id, d.event_type,
       {_sci_sql('d.value')} AS value,
       {_sci_sql('d.adev')} AS adev
FROM dev d JOIN mad m USING (event_type)
WHERE d.adev > {MAD_MULT!r} * m.mad
"""


QUERIES.update(
    {
        "ev_attribution": q_ev_attribution,
        "rel_yearly_growth": q_rel_yearly_growth,
        "ev_mad_outliers": q_ev_mad_outliers,
    }
)
_LATE_ORACLES.update(
    {
        "ev_attribution": o_ev_attribution,
        "rel_yearly_growth": o_rel_yearly_growth,
        "ev_mad_outliers": o_ev_mad_outliers,
    }
)


# ------------------------------------------------------------------ #
# share-of-total window + session-basket affinity (round-3 late batch)
# ------------------------------------------------------------------ #


def q_rel_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue: aggregate once,
    then one unbounded window per region — the percent-of-total report
    shape (no second scan, no self-join). Share = one IEEE division of
    two identically-ordered sums? No — the sums are plain per-group
    aggregates, portable under the %.7e format; the ratio divides the
    group's own sum by the region window total."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("r_name")
    out = rev.withColumn(
        "share", F.col("revenue") / F.sum("revenue").over(w)
    )
    return out.select(
        "r_name",
        "n_name",
        _sci(F.col("revenue")).alias("revenue"),
        _sci(F.col("share")).alias("share"),
    )


def o_rel_share_of_total() -> str:
    return f"""
WITH rev AS (
  SELECT r_name, n_name,
         sum(l_extendedprice * (1.0 - l_discount)) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, {_sci_sql('revenue')} AS revenue,
       {_sci_sql('revenue / sum(revenue) OVER (PARTITION BY r_name)')} AS share
FROM rev
"""


QUERIES.update({"rel_share_of_total": q_rel_share_of_total})
_LATE_ORACLES.update({"rel_share_of_total": o_rel_share_of_total})


def q_ev_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity seasonality per event type — the
    diurnal-profile report (capacity planning, anomaly baselines).
    Hour is integer arithmetic on the µs normalization
    ((epoch_s div 3600) mod 24), so a foreign session timezone can
    never shift a bucket; one map-side-combined aggregate."""
    from mahout_samsara_book_spark.sources.tables import load_table, ts_us

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("_us", ts_us(ev))
    out = (
        ev.withColumn(
            "hour", F.expr("((_us div 1000000) div 3600) % 24")
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    return out.select(
        "event_type",
        F.col("hour").cast("long").alias("hour"),
        F.col("n").cast("long").alias("n"),
        _sci(F.col("total_value")).alias("total_value"),
    )


def o_ev_hourly_profile() -> str:
    return f"""
SELECT event_type,
       ((epoch_us(ts) // 1000000) // 3600) % 24 AS hour,
       CAST(count(*) AS BIGINT) AS n,
       {_sci_sql('sum(value)')} AS total_value
FROM events GROUP BY 1, 2
"""


QUERIES.update({"ev_hourly_profile": q_ev_hourly_profile})
_LATE_ORACLES.update({"ev_hourly_profile": o_ev_hourly_profile})


# ------------------------------------------------------------------ #
# round-8 additions: decile revenue profile, per-type burst windows
# ------------------------------------------------------------------ #


def q_rel_decile_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles: ntile(10) over per-customer lifetime
    revenue, then the per-decile head-count and revenue envelope — the
    whale-curve report behind "top decile drives X% of revenue".

    Cross-engine determinism: revenue is summed in integer CENTS
    (o_totalprice is 2-decimal; round(x*100) is exact), so the ntile
    ORDER BY is a pure bigint sort with a custkey tiebreak — a double
    sum here would let addition order flip near-equal customers into
    different deciles on different engines. Scale: the window runs over
    the per-customer aggregate (|customers|, not |orders|); the decile
    assignment is a single global sort of that contracted relation."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "rev_cents"
        ),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy(F.desc("rev_cents"), F.col("o_custkey"))
    dec = cust.withColumn("decile", F.ntile(10).over(w))
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_cents").alias("rev_cents"),
            F.min("rev_cents").alias("min_cents"),
            F.max("rev_cents").alias("max_cents"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_cust").cast("long").alias("n_cust"),
            F.col("n_orders").cast("long").alias("n_orders"),
            _sci(F.col("rev_cents") / 100.0).alias("revenue"),
            _sci(F.col("min_cents") / 100.0).alias("min_revenue"),
            _sci(F.col("max_cents") / 100.0).alias("max_revenue"),
        )
    )


def o_rel_decile_revenue() -> str:
    return f"""
WITH cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1
),
dec AS (
  SELECT *, ntile(10) OVER (ORDER BY rev_cents DESC, o_custkey) AS decile
  FROM cust
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       {_sci_sql('sum(rev_cents) / 100.0')} AS revenue,
       {_sci_sql('min(rev_cents) / 100.0')} AS min_revenue,
       {_sci_sql('max(rev_cents) / 100.0')} AS max_revenue
FROM dec GROUP BY 1
"""


def q_ev_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection on the event stream: absolute-hour buckets per
    event type, flagging hours whose count exceeds 2x the type's mean
    hourly rate — the capacity/incident trigger feeding the anomaly
    queue. The burst predicate is pure INTEGER cross-multiplication
    (n * n_hours > 2 * total), so the threshold can never drift a ulp
    between engines. Scale: one map-side-combined aggregate to hourly
    grain, one tiny per-type aggregate broadcast back over it."""
    from mahout_samsara_book_spark.sources.tables import load_table, ts_us

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("_us", ts_us(ev))
        .withColumn("hour", F.expr("(_us div 1000000) div 3600"))
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    per_type = hourly.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_hours")
    )
    joined = hourly.join(F.broadcast(per_type), "event_type")
    return (
        joined.filter(
            F.col("n") * F.col("n_hours") > F.lit(2) * F.col("total")
        )
        .select(
            "event_type",
            F.col("hour").cast("long").alias("hour"),
            F.col("n").cast("long").alias("n"),
            _sci(
                (F.col("n") * F.col("n_hours")) / F.col("total").cast("double")
            ).alias("burst_ratio"),
        )
    )


def o_ev_burst_windows() -> str:
    return f"""
WITH hourly AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, sum(n) AS total, count(*) AS n_hours
  FROM hourly GROUP BY 1
)
SELECT h.event_type, CAST(h.hour AS BIGINT) AS hour,
       CAST(h.n AS BIGINT) AS n,
       {_sci_sql('(h.n * p.n_hours) / CAST(p.total AS DOUBLE)')} AS burst_ratio
FROM hourly h JOIN per_type p ON h.event_type = p.event_type
WHERE h.n * p.n_hours > 2 * p.total
"""


QUERIES.update(
    {
        "rel_decile_revenue": q_rel_decile_revenue,
        "ev_burst_windows": q_ev_burst_windows,
    }
)
_LATE_ORACLES.update(
    {
        "rel_decile_revenue": o_rel_decile_revenue,
        "ev_burst_windows": o_ev_burst_windows,
    }
)


# ------------------------------------------------------------------ #
# round-8: EWMA smoothing (ordered sequential fold)
# ------------------------------------------------------------------ #

EWMA_ALPHA = 0.3


def q_ev_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly EWMA — the ordered-recursive fold shape; the
    oracle replays the identical float sequence as a recursive CTE."""
    out = R.event_hourly_ewma(spark, sf_dir, alpha=EWMA_ALPHA)
    return out.select(
        "event_type",
        F.col("hour").cast("long").alias("hour"),
        _sci(F.col("v")).alias("v"),
        _sci(F.col("ewma")).alias("ewma"),
    )


def o_ev_ewma_smooth() -> str:
    a = EWMA_ALPHA
    oma = 1.0 - EWMA_ALPHA
    return f"""
WITH RECURSIVE
h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, value
      FROM events),
c AS (SELECT event_type, hour, sum(value) AS v FROM h GROUP BY 1, 2),
rn AS (SELECT event_type, hour, v,
              row_number() OVER (PARTITION BY event_type ORDER BY hour)
                AS rn
       FROM c),
e AS (
  SELECT event_type, hour, v, rn, v AS ewma FROM rn WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.hour, r.v, r.rn, {a} * r.v + {oma} * e.ewma
  FROM rn r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1
)
SELECT event_type, CAST(hour AS BIGINT) AS hour,
       {{V}} AS v, {{E}} AS ewma
FROM e
""".replace("{V}", _sci_sql("v")).replace("{E}", _sci_sql("ewma"))


QUERIES.update({"ev_ewma_smooth": q_ev_ewma_smooth})
_LATE_ORACLES.update({"ev_ewma_smooth": o_ev_ewma_smooth})


# ------------------------------------------------------------------ #
# round-8: data-quality expectations report
# ------------------------------------------------------------------ #


def q_rel_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation over lineitem: per rule,
    violators counted NULL-as-violation (the three-valued-logic trap);
    one scan for the whole rule set. See relational.py:dq_expectations."""
    from mahout_samsara_book_spark.functions.relational import (
        DQ_DEFAULT_RULES,
        dq_expectations,
    )
    from mahout_samsara_book_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = dq_expectations(li, DQ_DEFAULT_RULES)
    return out.select("rule", "n_violations", "n_rows", "violation_ppm")


def o_rel_dq_expectations() -> str:
    from mahout_samsara_book_spark.functions.relational import (
        DQ_DEFAULT_RULES,
    )

    arms = []
    for name, pred in DQ_DEFAULT_RULES:
        arms.append(
            f"SELECT '{name}' AS rule,\n"
            f"  CAST(sum(CASE WHEN ({pred}) IS NULL OR NOT ({pred})"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,\n"
            f"  CAST(count(*) AS BIGINT) AS n_rows\n"
            f"FROM lineitem"
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH r AS (
{union}
)
SELECT rule, n_violations, n_rows,
       CAST((n_violations * CAST(1000000 AS BIGINT)) // n_rows AS BIGINT)
         AS violation_ppm
FROM r
"""


QUERIES.update({"rel_dq_expectations": q_rel_dq_expectations})
_LATE_ORACLES.update({"rel_dq_expectations": o_rel_dq_expectations})


def q_ev_stream_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming AS-OF enrichment through the real engine (round 9):
    per-user applyInPandasWithState carries the most recent click —
    ONE state row per user, no retained event buffer — and every
    purchase is emitted once with its prior click attached. The
    bounded availableNow run equals the batch as-of exactly, so
    ev_asof_click's oracle grades this operator too (the same
    batch-twin discipline as every other ev_stream_* entry)."""
    from mahout_samsara_book_spark.streaming.stateful import (
        run_stream_asof_click,
    )

    out = run_stream_asof_click(spark, sf_dir)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("click_id").cast("long").alias("click_id"),
        _sci(
            (F.col("t_us") - F.col("ct_us")) / F.lit(1_000_000.0)
        ).alias("gap_s"),
    )


def _o_ev_stream_asof() -> str:
    import entry_pipe

    return entry_pipe.o_ev_asof_click()


QUERIES.update({"ev_stream_asof": q_ev_stream_asof})
_LATE_ORACLES.update({"ev_stream_asof": _o_ev_stream_asof})


def q_ev_stream_asof_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARKED streaming as-of (round-10, VERDICT r9 item 7):
    unlike ev_stream_asof's arrival-order contract, out-of-order
    events buffer in state up to the watermark and flush in EVENT-TIME
    order when it advances — the event-time-correct choice for an
    unbounded deployment.  The graded run is genuinely multi-batch
    (time-split files + a heartbeat row advance the watermark across
    micro-batches — see streaming/stateful.py:run_stream_asof_wm), and
    its emissions equal the batch as-of exactly, so ev_asof_click's
    oracle grades it."""
    from mahout_samsara_book_spark.streaming.stateful import (
        run_stream_asof_wm,
    )

    out = run_stream_asof_wm(spark, sf_dir)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("click_id").cast("long").alias("click_id"),
        _sci(
            (F.col("t_us") - F.col("ct_us")) / F.lit(1_000_000.0)
        ).alias("gap_s"),
    )


QUERIES.update({"ev_stream_asof_wm": q_ev_stream_asof_wm})
_LATE_ORACLES.update({"ev_stream_asof_wm": _o_ev_stream_asof})
