"""Samsara-style session facade (A22 — the reference threads an implicit
``DistributedContext``: ``TWCNB.scala:30``, ``BahmaniSketch.scala:42``).

A user of the reference writes ``drmParallelize(mx)(ctx)`` /
``drmBroadcast(v)``; here the context is an explicit object wrapping the
SparkSession, with snake_case twins of the DSL entry points, so porting a
Samsara driver program is a mechanical rename:

    ctx = SamsaraContext.get_or_create()
    drm_a = ctx.drm_parallelize(mx, num_partitions=2)
    beta = dridge(drm_a, y, lam=0.1)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from mahout_samsara_book_spark.drm.drm import Drm, drm_broadcast
from mahout_samsara_book_spark.session import get_spark


class SamsaraContext:
    """The engine handle: owns the SparkSession and provides every DSL
    source operator (A1, A17, A18, A23, A24 surfaces)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def get_or_create(cls, **session_kwargs) -> "SamsaraContext":
        return cls(get_spark(**session_kwargs))

    # -- sources (A1) -------------------------------------------------- #

    def drm_parallelize(
        self, mx: np.ndarray, num_partitions: int | None = None
    ) -> Drm:
        return Drm.from_numpy(self.spark, mx, num_partitions)

    def drm_from_columns(self, df: DataFrame, key, cols) -> Drm:
        return Drm.from_columns(df, key, cols)

    def drm_from_parquet(
        self, path: str, key: str, cols: list[str]
    ) -> Drm:
        return Drm.from_columns(self.spark.read.parquet(path), key, cols)

    # -- broadcast (A18) ----------------------------------------------- #

    def drm_broadcast(self, value: np.ndarray):
        return drm_broadcast(self.spark, value)

    # -- relational escape hatch -------------------------------------- #

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, sf_dir: str, name: str) -> DataFrame:
        from mahout_samsara_book_spark.sources.tables import load_table

        return load_table(self.spark, sf_dir, name)

    def stop(self) -> None:
        self.spark.stop()
