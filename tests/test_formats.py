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
