"""Training-set assembly (operators/selection.py) + KMV sketches
(operators/sketches.py): determinism, partition/invariant contracts,
and estimator accuracy — the properties the DuckDB hash-match can't
see (idempotence under re-execution, sharding balance, estimate error
bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.selection import (
    pack_sequences,
    shard_assign,
    split_assign,
    stratified_sample,
)
from mahout_samsara_book_spark.operators.sketches import (
    kmv_distinct,
    kmv_union_distinct,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_split_assign_deterministic_and_total(docs):
    a = split_assign(docs, seed=7)
    b = split_assign(docs, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = dict(a.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # 80/10/10 within a loose binomial band on 500 docs
    assert counts["train"] > 300


def test_split_assign_seed_changes_assignment(docs):
    a = split_assign(docs, seed=1).withColumnRenamed("split", "s1")
    b = split_assign(docs, seed=2).withColumnRenamed("split", "s2")
    diff = (
        a.join(b, "doc_id")
        .filter(F.col("s1") != F.col("s2"))
        .count()
    )
    assert diff > 0


def test_stratified_sample_respects_zero_fraction(docs):
    out = stratified_sample(docs, "lang", {"en": 1.0}, seed=3)
    langs = {r[0] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # fraction 1.0 keeps every row


def test_stratified_sample_fraction_band(docs):
    out = stratified_sample(docs, "lang", {"en": 0.5}, seed=3)
    n_en = docs.filter(F.col("lang") == "en").count()
    assert 0.25 * n_en <= out.count() <= 0.75 * n_en


def test_shard_assign_positions_dense(docs):
    out = shard_assign(docs, 4, seed=5).cache()
    assert out.count() == docs.count()
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1  # dense 0..n-1
    assert out.select("shard").distinct().count() == 4
    out.unpersist()


def test_pack_sequences_offsets_within_budget(docs):
    from mahout_samsara_book_spark.functions.text import tokenize

    d = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_tok")
    )
    out = pack_sequences(d, "n_tok", 256, 4, seed=5).cache()
    assert out.count() == docs.count()
    assert out.filter((F.col("pack_off") < 0) | (F.col("pack_off") >= 256)).count() == 0
    # pack ids per shard are contiguous from 0
    per = out.groupBy("shard").agg(F.min("pack_id").alias("mn"))
    assert all(r["mn"] == 0 for r in per.collect())
    out.unpersist()


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "g string, v int"
    )
    out = kmv_distinct(df, "g", "v", k=32).collect()
    assert len(out) == 1
    assert out[0]["n_est"] == 7 and out[0]["n_seen"] == 7


def test_kmv_estimate_within_rse(spark):
    # 2000 distinct values, k=64 → RSE ≈ 1/sqrt(62) ≈ 13%; gate at 4σ
    df = spark.range(2000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    out = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert out["n_seen"] == 64
    assert abs(out["n_est"] - 2000) / 2000 < 0.52
    assert out["n_est"] > 0


def test_kmv_union_superset_of_parts(spark):
    df = spark.createDataFrame(
        [("g", i, i + 500) for i in range(400)], "g string, a long, b long"
    )
    u = kmv_union_distinct(df, "g", ("a", "b"), k=1000).collect()[0]
    # below k the union sketch is exact: |{0..399} ∪ {500..899}| = 800
    assert u["n_est"] == 800 and u["n_seen"] == 800


def test_bloom_no_false_negatives(spark):
    from mahout_samsara_book_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    df = spark.createDataFrame(
        [("g", i) for i in range(300)], "g string, v long"
    )
    bloom = bloom_build(df, "g", "v", m_bits=4096, k=4)
    hits = bloom_probe(bloom, df, "g", "v", m_bits=4096, k=4)
    assert hits.filter(~F.col("maybe_present")).count() == 0


def test_bloom_rejects_most_absent(spark):
    from mahout_samsara_book_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    present = spark.createDataFrame(
        [("g", i) for i in range(300)], "g string, v long"
    )
    absent = spark.createDataFrame(
        [("g", i) for i in range(1_000_000, 1_000_300)], "g string, v long"
    )
    bloom = bloom_build(present, "g", "v", m_bits=4096, k=4)
    fp = (
        bloom_probe(bloom, absent, "g", "v", m_bits=4096, k=4)
        .filter(F.col("maybe_present"))
        .count()
    )
    # 300 keys in 4096 bits, k=4: theoretical FP ~ (1-e^(-4*300/4096))^4
    # ~ 0.6%; gate loosely at 10%
    assert fp <= 30


def test_zorder_buckets_are_tight_rectangles(spark):
    """Fixed z-ranges must cover small rectangles in (x, y): every
    bucket's x-extent and y-extent are bounded by the bits the bucket
    shift leaves free (z>>10 fixes all but 5 x-bits and 5 y-bits)."""
    from mahout_samsara_book_spark.operators.layout import (
        zorder_layout_stats,
    )

    df = spark.range(20000).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") * 7) % 256).alias("y"),
    )
    out = zorder_layout_stats(df, "x", "y", bits=16, bucket_shift=10).toPandas()
    assert len(out) > 1
    # 10 free z-bits → 5 free bits per dimension → extent < 2^5
    assert ((out.x_max - out.x_min) < 32).all()
    assert ((out.y_max - out.y_min) < 32).all()
    assert out.n.sum() == 20000


def test_z_value_interleave_exact(spark):
    from mahout_samsara_book_spark.operators.layout import z_value

    rows = spark.createDataFrame(
        [(0b1011, 0b0110)], "x long, y long"
    ).select(z_value(F.col("x"), F.col("y"), bits=4).alias("z"))
    # interleave x=1011, y=0110 → z bits (y3 x3 y2 x2 y1 x1 y0 x0) =
    # 0 1 1 0 1 1 1 0 … little-endian: x0=1,y0=0,x1=1,y1=1,x2=0,y2=1,x3=1,y3=0
    expect = (1 << 0) | (0 << 1) | (1 << 2) | (1 << 3) | (0 << 4) | (1 << 5) | (1 << 6) | (0 << 7)
    assert rows.collect()[0]["z"] == expect


def test_chunk_documents_covers_text(spark):
    from mahout_samsara_book_spark.operators.selection import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "a" * 500), (2, "b" * 200), (3, "c" * 10), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, size=200, stride=150).toPandas()
    n = dict(out.groupby("doc_id").size())
    # 500 chars: ceil(300/150)+1 = 3 chunks; 200 → 1; 10 → 1; "" → 1
    assert n == {1: 3, 2: 1, 3: 1, 4: 1}
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    assert [len(t) for t in d1.chunk_text] == [200, 200, 200]
    # stride-150 overlap: chunk 1 starts at char 150
    assert d1.chunk_text.iloc[-1].endswith("a")
    # reassembly: first chars of consecutive chunks step by stride
    assert len(out[out.doc_id == 2].chunk_text.iloc[0]) == 200
