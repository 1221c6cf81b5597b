"""Scan-parallelism guard shared across operators.

A whole fixture table fits ONE ``maxPartitionBytes`` split, and parquet
row groups are the splitting floor — so a small file arrives as a
single scan partition and every narrow stage Catalyst pipelines onto it
(tokenize/explode, quantize, candidate generation) runs on one core
regardless of cluster size. ``ensure_min_partitions`` widens such
inputs to the session's default parallelism; on any real-scale table
(more splits than cores) it is a structural no-op, so the guard costs
nothing at 100 TB while keeping small-corpus throughput scan-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Small-file inputs arrive as one or two scan partitions (a whole
    fixture table fits one ``maxPartitionBytes`` split), and every stage
    Catalyst pipelines onto that scan — candidate self-joins, explode +
    partial aggregation — then runs on ONE core regardless of cluster
    size. Repartition up to the session's default parallelism when the
    plan is below it; when the scan is already wide (any real-scale
    table) this is a no-op, so no gratuitous shuffle at 100 TB."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
