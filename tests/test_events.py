"""Event-time processing: batch/streaming windowed-agg equivalence and
sessionization invariants."""

import shutil

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.sources.tables import ts_us
from mahout_samsara_book_spark.streaming.events import (
    US_PER_SEC,
    dedup_replayed_events,
    enriched_nation_counts,
    sessionize,
    stream_dedup_events,
    stream_click_error_join,
    stream_windowed_counts,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_windowed_counts_shape(events):
    out = windowed_counts(events, "1 hour").toPandas()
    assert (out.window_start % 3600 == 0).all()
    assert out.n.sum() == events.count()


def test_sessionize_invariants(events):
    sess = sessionize(events, gap_minutes=30).toPandas()
    ev_count = events.count()
    assert sess.n_events.sum() == ev_count
    assert (sess.session_end >= sess.session_start).all()
    # session ids are 1..k per user, dense
    for _, grp in sess.groupby("user_id"):
        ids = sorted(grp.session_id)
        assert ids == list(range(1, len(ids) + 1))
    # no session spans a gap larger than numbers allow: max session length
    # sanity (sessions bounded by data span)
    assert (sess.session_end - sess.session_start >= 0).all()


def test_stream_windowed_counts_matches_batch(spark, events, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev_src"))
    shutil.copy(f"{SF_DIR}/events.parquet", src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_windowed_counts(stream, "1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_win_out").toPandas()
    batch = windowed_counts(events, "1 hour").toPandas()
    max_sec = (
        events.withColumn("t_us", ts_us(events))
        .agg(F.max(F.expr(f"t_us div {US_PER_SEC}")))
        .collect()[0][0]
    )
    # append mode emits only windows finalized by the watermark —
    # STRICTLY: a window whose end equals the final watermark stays
    # open (verified by test_stream_append_boundary_strict)
    finalized = batch[batch.window_start + 3600 < max_sec]
    g = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = finalized.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g.window_start == b.window_start).all()
    assert (g.n == b.n).all()
    assert abs(g.total_value - b.total_value).max() < 1e-9


def test_stream_append_boundary_strict(spark, tmp_path_factory):
    """Pin the append-mode emission boundary the ev_stream_append
    oracle relies on: a window whose END equals the final watermark
    (max event time, 0s delay) is NOT emitted — emission is strictly
    ``window_end < watermark``. Three events: two inside [3600, 7200)
    and one exactly AT 7200 (so max_sec == 7200, the first window's
    end). If the engine emitted at ``end <= watermark`` this would
    return one row; the real engine returns zero."""
    import pandas as pd

    src = str(tmp_path_factory.mktemp("ev_boundary"))
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "event_type": ["click"] * 3,
            "value": [1.0, 2.0, 3.0],
            "ts": pd.to_datetime(
                [3_600_000_000, 3_605_000_000, 7_200_000_000], unit="us"
            ),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{src}/events.parquet"
    )
    from mahout_samsara_book_spark.streaming.events import (
        run_stream_windowed_append,
    )

    got = run_stream_windowed_append(spark, src).toPandas()
    assert len(got) == 0


def test_stream_stream_join_matches_batch(spark, events, tmp_path_factory):
    """Watermarked stream-stream interval join ≡ the same join run in
    batch (inner joins emit all matches; the watermark only bounds
    state)."""
    c_dir = str(tmp_path_factory.mktemp("clicks_src"))
    e_dir = str(tmp_path_factory.mktemp("errors_src"))
    clicks_b = events.filter(F.col("event_type") == "click")
    errors_b = events.filter(F.col("event_type") == "error")
    clicks_b.write.mode("overwrite").parquet(c_dir)
    errors_b.write.mode("overwrite").parquet(e_dir)
    cs = spark.readStream.schema(events.schema).parquet(c_dir)
    es = spark.readStream.schema(events.schema).parquet(e_dir)
    joined = stream_click_error_join(cs, es, lookback_secs=600)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ss_join_out").toPandas()
    expect = stream_click_error_join(
        clicks_b, errors_b, lookback_secs=600
    ).toPandas()
    assert len(got) == len(expect) > 0
    key = ["user_id", "error_id", "click_time"]
    g = got.sort_values(key).reset_index(drop=True)
    b = expect.sort_values(key).reset_index(drop=True)
    assert (g.error_id == b.error_id).all()
    assert abs(g.click_value - b.click_value).max() < 1e-12


def test_stream_dedup_matches_batch(spark, events, tmp_path_factory):
    """dropDuplicatesWithinWatermark over a doubled (at-least-once
    replayed) stream ≡ batch dedup of the doubled relation ≡ the
    original relation (event_id is unique in the fixture)."""
    src = str(tmp_path_factory.mktemp("dedup_src"))
    replayed = events.unionByName(events)
    replayed.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    ded = stream_dedup_events(stream, watermark="30 minutes")
    q = (
        ded.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_dedup_out").toPandas()
    expect = dedup_replayed_events(replayed).toPandas()
    assert len(got) == len(expect) == events.count()
    g = got.sort_values("event_id").reset_index(drop=True)
    b = expect.sort_values("event_id").reset_index(drop=True)
    assert (g.event_id == b.event_id).all()
    assert (g.t_sec == b.t_sec).all()
    assert abs(g.value - b.value).max() < 1e-12


def test_stream_static_enrichment_matches_batch(
    spark, events, tmp_path_factory
):
    """Stream-static broadcast join + agg (complete mode) ≡ batch."""
    src = str(tmp_path_factory.mktemp("enrich_src"))
    shutil.copy(f"{SF_DIR}/events.parquet", src)
    customers = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = enriched_nation_counts(stream, customers)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_enrich_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_enrich_out").toPandas()
    expect = enriched_nation_counts(events, customers).toPandas()
    key = ["c_nationkey", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    b = expect.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b) > 0
    assert (g.n == b.n).all()
    assert abs(g.total_value - b.total_value).max() < 1e-9


def test_stream_session_window_matches_batch(spark, events, tmp_path_factory):
    """Native session_window: streaming (availableNow, append) emits
    exactly the sessions the batch twin computes, minus any session not
    yet closed by the watermark at end-of-stream."""
    from mahout_samsara_book_spark.streaming.events import (
        session_window_agg,
        stream_session_counts,
    )

    src = str(tmp_path_factory.mktemp("ev_sess_src"))
    shutil.copy(f"{SF_DIR}/events.parquet", src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_session_counts(stream, gap_minutes=20, watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_sess_out").toPandas()
    batch = session_window_agg(events, gap_minutes=20).toPandas()
    max_sec = (
        events.withColumn("t_us", ts_us(events))
        .agg(F.max(F.expr(f"t_us div {US_PER_SEC}")))
        .collect()[0][0]
    )
    finalized = batch[batch.session_end <= max_sec]
    key = ["user_id", "session_start"]
    g = got.sort_values(key).reset_index(drop=True)
    b = finalized.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g.user_id.values == b.user_id.values).all()
    assert (g.session_start.values == b.session_start.values).all()
    assert (g.session_end.values == b.session_end.values).all()
    assert (g.n_events.values == b.n_events.values).all()


def test_session_window_gap_boundary(spark):
    """Exact-gap event MERGES into the native session (ts == last+gap
    counts as overlap); only diff > gap splits."""
    from mahout_samsara_book_spark.streaming.events import session_window_agg

    gap_us = 20 * 60 * 1_000_000
    df = spark.createDataFrame(
        [
            (1, 0, 1_000_000_000_000_000, "click", 1.0, "{}"),
            (2, 0, 1_000_000_000_000_000 + gap_us, "click", 1.0, "{}"),
            (3, 0, 1_000_000_000_000_000 + 2 * gap_us + 1, "click", 1.0, "{}"),
        ],
        "event_id long, user_id long, _us long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = session_window_agg(df, gap_minutes=20).toPandas()
    assert len(out) == 2
    assert sorted(out.n_events.tolist()) == [1, 2]


def test_funnel_requires_strict_order(spark):
    import datetime as dt

    rows = [
        # user 1: purchase BEFORE any view — must not count; then full funnel
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "purchase", 1.0, ""),
        (2, dt.datetime(2024, 1, 1, 1, 0), 1, "view", 1.0, ""),
        (3, dt.datetime(2024, 1, 1, 2, 0), 1, "click", 1.0, ""),
        (4, dt.datetime(2024, 1, 1, 3, 0), 1, "purchase", 1.0, ""),
        # user 2: click precedes first view — funnel stops at view
        (5, dt.datetime(2024, 1, 2, 0, 0), 2, "click", 1.0, ""),
        (6, dt.datetime(2024, 1, 2, 1, 0), 2, "view", 1.0, ""),
        # user 3: never views — excluded entirely
        (7, dt.datetime(2024, 1, 3, 0, 0), 3, "click", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from mahout_samsara_book_spark.streaming.events import funnel_steps

    got = {r["user_id"]: r for r in funnel_steps(ev).collect()}
    assert set(got) == {1, 2}
    assert got[1]["steps_reached"] == 3
    # the counted purchase is the one AFTER the click (03:00), not 00:00
    assert got[1]["t_purchase"] > got[1]["t_click"] > got[1]["t_view"]
    assert got[2]["steps_reached"] == 1
    assert got[2]["t_click"] is None and got[2]["t_purchase"] is None


def test_retention_offset_zero_is_cohort_size(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1, "view", 1.0, ""),
        (2, dt.datetime(2024, 1, 3, 5), 1, "view", 1.0, ""),   # offset 2
        (3, dt.datetime(2024, 1, 1, 9), 2, "click", 1.0, ""),
        (4, dt.datetime(2024, 1, 2, 9), 3, "view", 1.0, ""),   # later cohort
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from mahout_samsara_book_spark.streaming.events import retention_cohorts

    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert got[(d0, 0)] == 2       # users 1 and 2 on day 0
    assert got[(d0, 2)] == 1       # user 1 returns at offset 2
    assert got[(d0 + 1, 0)] == 1   # user 3's own cohort
