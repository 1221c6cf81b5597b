"""Similarity search over an embedding column (north star, BASELINE.json).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  O(n·m) pairs; right for reranking and small candidate sets.
- :func:`lsh_sign_buckets` / :func:`lsh_topk` — the scale path: random-
  hyperplane (sign) LSH. Hyperplane j's component for dimension d is a
  deterministic ±1 derived from the portable hash of ``seed:j:d``, so the
  DuckDB oracle reproduces the projection bit-for-bit (no float plane
  literals needed). Buckets shrink the join from O(n²) to per-bucket;
  at 100 TB bucket width is tuned by n_planes and skew lands in AQE's
  skew-join splitting.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.dedup import _dot


def _normed(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self-join; a ≠ b):
    ``(vec_id, neighbor, cosine, rank)``. Ties broken by neighbor id."""
    base = _normed(emb, id_col, vec_col)
    l, r = base.alias("l"), base.alias("r")
    sims = l.join(r, F.col(f"l.{id_col}") != F.col(f"r.{id_col}")).select(
        F.col(f"l.{id_col}").alias("vec_id"),
        F.col(f"r.{id_col}").alias("neighbor"),
        (
            _dot(F.col("l.v"), F.col("r.v")) / (F.col("l.nrm") * F.col("r.nrm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_sign(seed: int, j: int, d: int) -> int:
    """Deterministic ±1 for hyperplane j, dimension d — parity of the
    portable 60-bit hash of 'seed:j:d' (python twin of the SQL form)."""
    h = int(hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 1 else -1


def lsh_sign_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """``(vec_id, bucket)`` — bucket = packed sign bits of ±1-projections.
    The planes are literal ±1 vectors, so each projection is one
    ``zip_with``/``aggregate`` fold — no UDF, oracle-replayable."""
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    bucket: Column | None = None
    for j in range(n_planes):
        signs = F.array(
            *[F.lit(float(plane_sign(seed, j, d))) for d in range(dim)]
        )
        proj = F.aggregate(
            F.zip_with(F.col("v"), signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return base.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to LSH candidate
    pairs, unioned over ``n_tables`` independent sign-hash tables (the
    standard multi-probe recall lever: P(found) = 1-(1-p^planes)^tables).
    ``(vec_id, neighbor, cosine, rank)``. Per-table collision prob for
    angle θ is (1-θ/π)^n_planes — size n_planes for bucket width,
    n_tables for recall."""
    base = _normed(emb, id_col, vec_col)
    cand = None
    for t in range(n_tables):
        buckets = lsh_sign_buckets(
            emb, n_planes, seed * 1000 + t, id_col, vec_col, dim
        ).withColumnRenamed("bucket", "b")
        l = buckets.alias("l")
        r = buckets.alias("r")
        pairs = l.join(
            r,
            (F.col("l.b") == F.col("r.b"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        ).select(
            F.col(f"l.{id_col}").alias("vec_id"),
            F.col(f"r.{id_col}").alias("neighbor"),
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    lv = base.select(
        F.col(id_col).alias("vec_id"),
        F.col("v").alias("v_l"),
        F.col("nrm").alias("nrm_l"),
    )
    rv = base.select(
        F.col(id_col).alias("neighbor"),
        F.col("v").alias("v_r"),
        F.col("nrm").alias("nrm_r"),
    )
    sims = (
        cand.join(lv, "vec_id")
        .join(rv, "neighbor")
        .select(
            "vec_id",
            "neighbor",
            (
                _dot(F.col("v_l"), F.col("v_r"))
                / (F.col("nrm_l") * F.col("nrm_r"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
