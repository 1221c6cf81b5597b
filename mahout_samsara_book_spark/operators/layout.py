"""Data-layout operators: Z-order (Morton) clustering keys — the
multi-dimensional file-layout primitive behind lakehouse OPTIMIZE
ZORDER BY. Interleaving the bits of two columns gives a 1-D sort key
whose contiguous ranges cover small rectangles in (x, y) space, so
range-partitioned files get tight min/max stats on BOTH columns and
data-skipping prunes on either predicate.

Pure integer bit arithmetic (shift/mask/or), bit-identical in DuckDB —
the oracle replays the interleave and the bucket stats exactly. At
scale the z-key feeds ``repartitionByRange(z)`` + per-file stats; here
the bucketing uses fixed z-ranges (``z >> bucket_shift``) so the
assignment is a narrow projection with no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of x and y:
    z = Σᵢ ((x>>i)&1) << 2i  |  ((y>>i)&1) << (2i+1). Constant-folded
    into one codegen'd expression (≤ 62 result bits for bits ≤ 31)."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value` (same shift/mask terms)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_shift: int = 18,
) -> DataFrame:
    """``(z_bucket, n, x_min, x_max, y_min, y_max)`` — cluster rows into
    fixed z-ranges and report each bucket's bounding rectangle: the
    data-skipping statistics a z-ordered file layout would publish.
    Tight rectangles (x_max−x_min and y_max−y_min both ≪ global range)
    are the property that makes min/max pruning work on either
    dimension. One partial-aggregated shuffle on the bucket key."""
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    z = z_value(x, y, bits=bits)
    return (
        df.select(
            F.shiftright(z, bucket_shift).alias("z_bucket"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
