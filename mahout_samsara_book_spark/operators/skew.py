"""Skew-aware aggregation (100 TB posture): two-phase salted group-sum.

AQE's skew-join splitting covers joins, but a groupBy on a power-law key
still funnels each hot key through one reducer. The classic fix is
salting: phase 1 aggregates on (key, salt) — spreading a hot key over
``n_salts`` reducers — phase 2 merges the per-salt partials. Results are
bit-equal in structure (sums reassociate; the oracle checks values via
the engine-portable formatting convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    key: str | Column,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → SUM-like
    (commutative, reassociable) aggregate expression over input columns.
    Phase 1 groups on (key, salt=pmod(hash, n_salts)); phase 2 sums the
    partials per key."""
    key_col = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key_col.alias("_key"), F.col("_salt"))
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    phase2 = phase1.groupBy("_key").agg(
        *[F.sum(name).alias(name) for name in aggs]
    )
    return phase2.withColumnRenamed("_key", key if isinstance(key, str) else "key")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient inner equi-join: replicate the SMALL side into
    ``n_salts`` copies (one per salt), salt each big-side row by a hash
    of its full tuple, and join on (key, salt) — a hot key's rows land
    in ``n_salts`` different reduce partitions instead of one straggler
    task. Semantically identical to ``big.join(small, key)`` (the
    oracle is the plain join); this is the manual form of what AQE
    skew-join splitting does adaptively, exposed as an operator for
    engines/pipelines where the skew is known ahead of time (e.g. a
    power-law user key in a 100 TB event join). Cost: small side
    shuffles n_salts× its size — the standard trade."""
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").alias("_salt")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
