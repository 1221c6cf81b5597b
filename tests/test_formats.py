"""Round-trip fidelity for the CSV / JSONL / ORC interchange edges,
on the real fixture tables (incl. TIMESTAMP_NTZ events and
array<float> embeddings)."""

import pytest

from mahout_samsara_book_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _assert_same(a, b, key):
    pa = a.toPandas().sort_values(key).reset_index(drop=True)
    pb = b.toPandas().sort_values(key).reset_index(drop=True)
    assert list(pa.columns) == list(pb.columns)
    assert len(pa) == len(pb) > 0
    for c in pa.columns:
        va, vb = pa[c], pb[c]
        if va.dtype == object:
            assert (va.astype(str) == vb.astype(str)).all(), c
        else:
            assert (va == vb).all(), c


@pytest.mark.parametrize("fmt", ["csv", "jsonl", "orc"])
def test_events_roundtrip(spark, events, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"ev_{fmt}"))
    if fmt == "csv":
        write_csv(events, path)
        back = read_csv(spark, path, events.schema)
    elif fmt == "jsonl":
        write_jsonl(events, path)
        back = read_jsonl(spark, path, events.schema)
    else:
        write_orc(events, path)
        back = read_orc(spark, path)
    assert back.schema == events.schema
    _assert_same(events, back, "event_id")


@pytest.mark.parametrize("fmt", ["csv", "jsonl", "orc"])
def test_embeddings_nested_roundtrip(spark, embeddings, tmp_path_factory, fmt):
    # array<float> column: JSON-string serialization on CSV, native
    # on JSONL/ORC
    path = str(tmp_path_factory.mktemp(f"emb_{fmt}"))
    if fmt == "csv":
        write_csv(embeddings, path)
        back = read_csv(spark, path, embeddings.schema)
    elif fmt == "jsonl":
        write_jsonl(embeddings, path)
        back = read_jsonl(spark, path, embeddings.schema)
    else:
        write_orc(embeddings, path)
        back = read_orc(spark, path)
    assert back.schema == embeddings.schema
    a = embeddings.toPandas().sort_values("vec_id").reset_index(drop=True)
    b = back.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    for va, vb in zip(a.embedding, b.embedding):
        assert list(va) == pytest.approx(list(vb), rel=1e-6)


def test_partitioned_roundtrip_and_layout(spark, events, tmp_path_factory):
    """Hive-partitioned write/read: values and row counts survive, the
    partition column comes back (as string — directory names carry no
    type), and the pre-shuffle produces exactly ONE data file per
    partition value (the small-files contract measured in SCALING.md's
    sf10 section: 39.3s → 5.6s)."""
    import glob
    import os

    from mahout_samsara_book_spark.sources.formats import (
        read_partitioned,
        write_partitioned,
    )

    path = str(tmp_path_factory.mktemp("ev_part")) + "/tree"
    write_partitioned(events, path, ["event_type"])
    back = read_partitioned(spark, path)
    assert back.count() == events.count()
    types = {r["event_type"] for r in events.select("event_type").distinct().collect()}
    dirs = {
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(f"{path}/event_type=*")
    }
    assert dirs == types
    for d in glob.glob(f"{path}/event_type=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, f"{d}: {len(files)} files (want 1)"
    # per-type counts identical
    a = {r["event_type"]: r["n"] for r in events.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    b = {r["event_type"]: r["n"] for r in back.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert a == b
