"""Event-time processing: batch/streaming windowed-agg equivalence and
sessionization invariants."""

import shutil

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.sources.tables import ts_us
from mahout_samsara_book_spark.streaming.events import (
    US_PER_SEC,
    sessionize,
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
    # append mode emits only windows finalized by the watermark
    finalized = batch[batch.window_start + 3600 <= max_sec]
    g = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = finalized.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g.window_start == b.window_start).all()
    assert (g.n == b.n).all()
    assert abs(g.total_value - b.total_value).max() < 1e-9


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
