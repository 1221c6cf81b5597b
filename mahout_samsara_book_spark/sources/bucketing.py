"""Storage layout: bucketed tables (co-located joins) and Hive-style
partitioned parquet (planning-time partition pruning).

At cluster scale the dominant cost of repeatedly joining or aggregating
big tables on the same key is the exchange, not the compute. Writing a
fact table ONCE bucketed (and optionally sorted) by that key makes every
later equi-join/aggregation on it exchange-free: the parquet scan
reports the bucket hash-partitioning as its ``outputPartitioning``, so
Catalyst drops the shuffle on every bucketed side (and the sort, when
``sort_cols`` matches the join key and each bucket holds one file).

The reference has no persistent storage layout at all (matrices enter
via ``drmParallelize`` / sequence files — SURVEY §2A A1/A23); bucketing
is the Spark-native answer to the same co-location concern its vertical
blockification addresses in-memory. ``tests/test_bucketing.py`` asserts
the exchange-free plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_cols``.

    ``num_buckets`` is a layout decision: pick so one bucket of the
    LARGEST co-located table fits an executor's task comfortably
    (~128-512 MB of parquet at 100 TB scale). All tables that will be
    joined must share the bucket count and key to co-locate.
    """
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its layout metadata (the catalog,
    not the reader, carries the bucket spec — ``spark.read.parquet`` on
    the same files would lose it)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout: one directory per
    partition-column value. The complementary pruning lever to
    bucketing — equality/range predicates on ``partition_cols`` prune
    entire directories at PLANNING time (the scan's ``PartitionFilters``,
    asserted in ``tests/test_bucketing.py``), so a 100 TB table filtered
    to one day/type reads only that slice. Choose low-cardinality,
    always-filtered columns; high-cardinality keys belong in bucketing
    or sort order instead (millions of tiny directories kill the
    listing)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back (partition columns are recovered
    from the directory structure)."""
    return spark.read.parquet(path)
