"""Portable Bloom filter as a relational aggregate (north-star
extension): build per-group Bloom bitmaps with the engine's portable
hash family and probe them — the join-pruning / dedup-prefilter
primitive at 100 TB (ship a few KB of bitmap instead of a semi-join's
key set).

Why not ``DataFrame.stat.bloomFilter`` / ``bloom_filter_agg``: those
produce an opaque JVM sketch whose bit layout no other engine can
replay. This one is pure SQL arithmetic over the md5-derived ``h60``
(:mod:`..operators.hashing`): k probe positions per value
(double hashing: ``(h1 + i·h2) mod m``, Kirsch–Mitzenmacher), bitmap
stored as 63-bit words (``pos div 63`` / ``pos mod 63`` — the sign bit
stays clear so DuckDB's checked ``<<`` never overflows) built with
``bit_or(1 << bit)`` — bit-identical in DuckDB, so the oracle certifies
every bit.

Scale shape: the build is ONE partial-aggregated groupBy (the bitmap
words combine with ``bit_or`` map-side — the same mergeability that
makes it a sketch); the probe is a broadcast join of the tiny bitmap
relation against the probe stream, evaluated as codegen'd bit math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.hashing import h60

# h60 yields [0, 2^60); split into two independent-ish 30-bit halves
# for double hashing. Both engines compute the split with integer
# div/mod, so probe positions agree bit-for-bit.
_HALF = 1 << 30


def _positions(value: Column, m_bits: int, k: int) -> list[Column]:
    h = h60(value)
    h1 = h % _HALF
    # exact integer split: h >> 30 (double division would round the
    # 60-bit hash past the 53-bit mantissa and desync from the oracle)
    h2 = F.shiftright(h, 30)
    # degenerate h2=0 collapses to k copies of h1, which only costs
    # false-positive rate, never correctness
    return [((h1 + F.lit(i) * h2) % m_bits) for i in range(k)]


def bloom_build(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """``(group, word_idx, word_bits)`` — per-group Bloom bitmap as
    63-bit words (rows with no set bit are omitted; absent word = 0).
    One shuffle with map-side ``bit_or`` partials."""
    pos = F.explode(
        F.array(*_positions(F.col(value_col).cast("string"), m_bits, k))
    ).alias("pos")
    exploded = df.select(F.col(group_col).alias("grp"), pos)
    return (
        exploded.select(
            "grp",
            F.expr("cast(pos div 63 as bigint)").alias("word_idx"),
            # pyspark's shiftleft() only takes a literal shift count;
            # the per-row count needs the SQL form
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 63 as int))"
            ).alias("bit"),
        )
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("bit").alias("word_bits"))
        .select(
            F.col("grp").alias(group_col), "word_idx", "word_bits"
        )
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    group_col: str,
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Membership test of ``probes`` rows against the per-group bitmap:
    ``(group, value, maybe_present)`` — true iff ALL k probe bits are
    set (Bloom semantics: no false negatives, tunable false positives).

    The bitmap relation is tiny (groups × m/64 rows) and broadcast; the
    k word lookups become k broadcast-join probes aggregated with
    ``bool_and``, all JVM-side."""
    val = F.col(value_col).cast("string")
    pos_cols = _positions(val, m_bits, k)
    pr = probes.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"),
        F.posexplode(F.array(*pos_cols)).alias("i", "pos"),
    ).select(
        "grp",
        "value",
        F.expr("cast(pos div 63 as bigint)").alias("word_idx"),
        F.expr(
            "shiftleft(cast(1 as bigint), cast(pos % 63 as int))"
        ).alias("bit"),
    )
    bm = F.broadcast(
        bloom.select(
            F.col(group_col).alias("grp"), "word_idx", "word_bits"
        )
    )
    joined = pr.join(bm, ["grp", "word_idx"], "left").select(
        "grp",
        "value",
        (
            F.coalesce(F.col("word_bits"), F.lit(0)).bitwiseAND(F.col("bit"))
            != 0
        ).alias("hit"),
    )
    return (
        joined.groupBy("grp", "value")
        .agg(F.bool_and("hit").alias("maybe_present"))
        .select(
            F.col("grp").alias(group_col), "value", "maybe_present"
        )
    )


def bloom_prune_join(
    build: DataFrame,
    probes: DataFrame,
    build_key: str,
    probe_key: str,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Runtime-filter join pruning: probe rows whose key cannot be in
    ``build`` (Bloom says definitively-absent) are dropped BEFORE the
    join; survivors still go through the exact join, which removes the
    false positives. Returns the pruned ``probes`` relation.

    This is the pattern Spark's own runtime row-group filtering plays
    at 100 TB — ship a few KB of bitmap to every probe task instead of
    shuffling the probe side's full key set — expressed with the
    engine's portable bloom so the decision chain is replayable: the
    oracle is simply the exact join (no false negatives ⇒ pruning is
    semantically invisible).

    Scale shape: bitmap build is one map-side-combined aggregate over
    the (smaller) build side; the probe is a broadcast of the bitmap
    words plus codegen'd bit math per probe row; the final exact join
    runs on the (hopefully much smaller) survivor stream."""
    keys = build.select(F.col(build_key).alias("v")).withColumn(
        "grp", F.lit(0)
    )
    bloom = bloom_build(keys, "grp", "v", m_bits=m_bits, k=k)
    flags = bloom_probe(
        bloom,
        probes.select(F.col(probe_key).alias("v")).withColumn(
            "grp", F.lit(0)
        ),
        "grp",
        "v",
        m_bits=m_bits,
        k=k,
    )
    passing = flags.filter(F.col("maybe_present")).select(
        F.col("value").cast(probes.schema[probe_key].dataType).alias(probe_key)
    )
    return probes.join(passing, probe_key, "leftsemi")
