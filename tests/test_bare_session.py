"""Adversarial driver-session simulation: the external driver builds
its OWN SparkSession without our confs (round 2 broke four event-time
queries exactly this way when the fixture's ts type changed). Clone a
session with a hostile timezone and legacy-conf setting and require
every event-time query to (a) run and (b) return the SAME rows as the
pinned-UTC session — value equality, not just schema."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

EVENT_TIME_QUERIES = [
    "ev_windowed_counts",
    "ev_sessionize",
    "ev_session_window",
    "ev_gapfill",
    "ev_funnel",
    "ev_retention",
    "rel_lead_lag",
    "rel_range_join",
    "rel_asof_events",
    "rel_asof_tolerance",
    # round-8/9 event-time additions
    "ev_burst_windows",
    "ev_ewma_smooth",
    "ev_asof_click",
]


@pytest.fixture(scope="module")
def bare(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ns.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    return ns


@pytest.mark.parametrize("name", EVENT_TIME_QUERIES)
def test_event_time_query_session_invariant(spark, bare, name):
    qs = entry.queries()
    pinned = {tuple(r) for r in qs[name](spark, SF).collect()}
    hostile = {tuple(r) for r in qs[name](bare, SF).collect()}
    assert pinned == hostile, f"{name} drifts under a non-UTC session"
