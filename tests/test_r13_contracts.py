"""Round-13 optimization contracts: manifest path normalization, the
index id-type write guard, the rank-carrying probe pass, and the
observe-fused loop bookkeeping."""

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.dedup import (
    _assert_index_id_type,
    _manifest_local_path,
)


def test_manifest_local_path_normalization():
    # bare local paths and host-less file: URIs are LOCAL
    assert _manifest_local_path("/tmp/idx/manifest") == "/tmp/idx/manifest"
    assert _manifest_local_path("file:/tmp/idx/manifest") == (
        "/tmp/idx/manifest"
    )
    assert _manifest_local_path("file:///tmp/idx/manifest") == (
        "/tmp/idx/manifest"
    )
    # a file: URI with a non-empty host is REMOTE (ADVICE r12), as is
    # any other scheme
    assert _manifest_local_path("file://host/tmp/idx/manifest") is None
    assert _manifest_local_path("hdfs://nn:8020/idx/manifest") is None
    assert _manifest_local_path("s3://bucket/idx/manifest") is None


def test_index_id_type_guard(spark):
    ok = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    _assert_index_id_type(ok, "doc_id")  # long — passes
    bad = ok.select(
        F.col("doc_id").cast("int").alias("doc_id"), "text"
    )
    with pytest.raises(TypeError, match="must be BIGINT/long"):
        _assert_index_id_type(bad, "doc_id")


def test_probe_rank1_is_assignment(spark):
    """ivf_probes(with_rank=True) rank 1 must equal ivf_assign under
    the shared (d2, cid) tie contract — ivf_topk/ann_ivfpq_topk derive
    the IVF assignment from it (round-13 single-pass fusion)."""
    import random

    from mahout_samsara_book_spark.operators.similarity import (
        _centers_matrix,
        ivf_assign,
        ivf_centers,
        ivf_probes,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    centers = _centers_matrix(ivf_centers(emb, 8, 9))
    got = {
        (r["q_id"], r["cid"])
        for r in ivf_probes(emb, centers, 2, with_rank=True)
        .filter(F.col("rank") == 1)
        .collect()
    }
    want = {
        (r["vec_id"], r["cid"])
        for r in ivf_assign(emb, centers).collect()
    }
    assert got == want


def test_lsls_summary_probe_converges(spark):
    """The (count, xor) summary gate must not change LSLS labels or
    stop early: a long chain needs several contraction rounds, and the
    exact probe still decides convergence."""
    from mahout_samsara_book_spark.operators.dedup import (
        connected_components_lsls,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 100)],
        "doc_a long, doc_b long",
    )
    out = {
        (r["doc_id"], r["cluster"])
        for r in connected_components_lsls(pairs).collect()
    }
    assert out == {(i, 0) for i in range(41)} | {(100, 100)}


def test_scan_parallelism_floor(spark, tmp_path):
    """_scan_parallelism_floor (guide §2.5 'unsplittable input'): a
    single-row-group parquet file above the size floor gets a
    round-robin repartition to defaultParallelism; a multi-row-group
    layout at or above the parallelism, a tiny file, and a
    non-stat-able path are all left alone — and the rows are identical
    either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mahout_samsara_book_spark.sources import tables

    p = str(tmp_path / "one_rg.parquet")
    tbl = pa.table({"k": list(range(50_000)), "v": [1.0] * 50_000})
    pq.write_table(tbl, p)  # one row group
    assert tables._row_group_count(p)[0] == 1

    df = spark.read.parquet(p)
    par = spark.sparkContext.defaultParallelism
    old_floor = tables.PAR_FLOOR_MIN_BYTES
    try:
        tables.PAR_FLOOR_MIN_BYTES = 1
        out = tables._scan_parallelism_floor(spark, df, p)
        assert "Repartition" in out._jdf.queryExecution().logical().toString()
        assert out.rdd.getNumPartitions() == par
        # identical rows, order aside
        assert sorted(r["k"] for r in out.collect()) == list(range(50_000))

        # tiny file below the floor: untouched
        tables.PAR_FLOOR_MIN_BYTES = 10**15
        same = tables._scan_parallelism_floor(spark, df, p)
        assert same is df

        # multi-row-group file at/above parallelism: untouched
        tables.PAR_FLOOR_MIN_BYTES = 1
        p2 = str(tmp_path / "many_rg.parquet")
        pq.write_table(tbl, p2, row_group_size=max(1, 50_000 // (par + 1)))
        rg2 = tables._row_group_count(p2)[0]
        assert rg2 >= par
        df2 = spark.read.parquet(p2)
        assert tables._scan_parallelism_floor(spark, df2, p2) is df2

        # non-stat-able path: untouched (assume splittable at scale)
        assert tables._row_group_count("s3://bucket/x.parquet") == (-1, 0)
        assert (
            tables._scan_parallelism_floor(
                spark, df, "s3://bucket/x.parquet"
            )
            is df
        )
    finally:
        tables.PAR_FLOOR_MIN_BYTES = old_floor
