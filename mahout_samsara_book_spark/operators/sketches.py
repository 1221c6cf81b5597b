"""Deterministic cardinality sketches (north-star extension): KMV
(k-minimum-values / bottom-k) distinct-count estimation per group.

Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's
``approx_count_distinct`` use different hash functions and register
layouts, so their estimates can never hash-match — useless under this
repo's oracle gate. KMV over the portable md5-derived ``h60`` hash
(:mod:`..operators.hashing`) is *bit-identical in both engines*: the
sketch is just "the k smallest distinct hashes", and the estimator
``(k-1) / R_k`` (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for
the unbiased (k-1) form) is one IEEE-double division both engines
round identically.

Scale shape (100 TB): distinct-ify (group, hash) — one shuffle with
map-side partial distinct — then a per-group window keeps ranks ≤ k.
Groups are independent; skewed groups cost one sort of their distinct
hash set, never of the raw rows. For groups with < k distinct hashes
the sketch IS the exact set and the estimate is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.hashing import h60

# h60 draws uniformly from [0, 2^60): the k-th smallest hash R_k
# estimates the fraction k/n of the hash space, so n̂ = (k-1)·2^60/R_k.
_H60_SPAN_F = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """``(group, n_est, n_seen)`` — per-group distinct-count estimate.

    n_seen = number of sketch entries retained (= min(k, true distinct
    count)); when n_seen < k the group's hash set was exhausted and
    n_est is the exact distinct count; otherwise n_est =
    floor((k-1)·2^60 / R_k) with R_k the k-th smallest distinct hash.
    """
    hashed = df.select(
        F.col(group_col).alias("grp"),
        h60(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    sk = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .groupBy("grp")
        .agg(F.max("h").alias("rk"), F.count("*").alias("n_seen"))
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(_H60_SPAN_F)) / F.col("rk"))
    return sk.select(
        F.col("grp").alias(group_col),
        F.floor(est).cast("long").alias("n_est"),
        F.col("n_seen").cast("long").alias("n_seen"),
    )


def kmv_union_distinct(
    df: DataFrame,
    group_col: str,
    value_cols: tuple[str, str],
    k: int = 32,
) -> DataFrame:
    """Distinct-count estimate of the UNION of two value columns per
    group — the mergeability property that makes KMV a *sketch* rather
    than a sample: union-ing two sketches = union the hash sets, keep
    the k smallest. Expressed by stacking the columns before the same
    distinct + bottom-k pipeline (Catalyst unions the scans; one
    shuffle total)."""
    a, b = value_cols
    stacked = df.select(
        F.col(group_col).alias("grp"), F.col(a).cast("string").alias("v")
    ).unionByName(
        df.select(
            F.col(group_col).alias("grp"), F.col(b).cast("string").alias("v")
        )
    )
    return kmv_distinct(stacked, "grp", "v", k=k).withColumnRenamed(
        "grp", group_col
    )


def heavy_hitters(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(term, n)`` — the corpus's k most frequent tokens with exact
    counts (vocabulary audit / stopword discovery over a training
    corpus).

    Exact two-phase plan, not a sketch: explode → hash-aggregate on the
    term (partial map-side combine collapses each partition's counts to
    its local vocabulary before the shuffle — the vocabulary, not the
    corpus, is what moves) → global top-k via TakeOrderedAndProject
    (per-partition top-k, k-row merge on the driver; no global sort).
    Total tie-break (n DESC, term ASC) keeps the selected row set
    deterministic for the oracle. At 100 TB the shuffled payload is
    ~|vocabulary|·partitions rows of (term, long) — the same shape
    word-count has at any scale."""
    from mahout_samsara_book_spark.functions.text import tokenize

    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), F.col("term")).limit(k)
