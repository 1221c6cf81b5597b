"""Scalar int8 embedding quantization (north-star extension: the
storage/serving compression step of a 100 TB embedding pipeline).

Per-vector symmetric absmax quantization — the scheme vector stores and
LLM weight/activation pipelines use for 4× compression with ~1e-2
recall loss: ``scale = max|x| / 127``, ``q_i = round(x_i / scale)``,
reconstruction ``x̂_i = q_i · scale``.

Determinism contract (what lets DuckDB replay it bit-for-bit): the
float32 parquet values widen to float64 identically on both engines;
absmax / divide / round-half-away-from-zero are single correctly-
rounded IEEE ops; and the reconstruction-error sum folds the dimensions
sequentially in index order (Spark ``F.aggregate`` over the in-order
array ≡ DuckDB ``list_aggregate(..., 'sum')`` — the same pairing
emb_outliers relies on).

Scale shape: one narrow projection, zero shuffles — every vector
quantizes inside its own scan partition, so this runs at whatever rate
the parquet scan runs. No UDF: all ops are codegen'd higher-order
array functions on the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quant_cols(vec_col: str):
    """(scale, codes) column expressions for one embedding column. A
    zero vector (absmax 0) keeps scale 0 and all-zero codes rather than
    dividing by zero; both engines take the same branch."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    codes = F.when(
        amax == F.lit(0.0), F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.round(x / scale).cast("int")))
    return scale, codes


def int8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, scale, codes)`` — absmax int8 codes per vector."""
    scale, codes = _quant_cols(vec_col)
    return emb.select(
        F.col(id_col), scale.alias("scale"), codes.alias("codes")
    )


def int8_recon_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, scale, mse, code_l1)`` — per-vector reconstruction
    audit: mean squared error of ``q·scale`` vs the original (the
    metric that gates whether int8 serving is acceptable), plus the
    exact-integer L1 of the codes as a content checksum.

    One narrow projection, no join, no shuffle: codes and error derive
    from the same row. The MSE folds dims in index order (sequential
    left fold), so the oracle's ``list_aggregate`` replays the
    identical float sequence."""
    scale, codes = _quant_cols(vec_col)
    withq = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        scale.alias("scale"),
        codes.alias("codes"),
    )
    err2 = F.zip_with(
        F.col("v"),
        F.col("codes"),
        lambda x, c: (x - c.cast("double") * F.col("scale"))
        * (x - c.cast("double") * F.col("scale")),
    )
    mse = F.aggregate(
        err2, F.lit(0.0), lambda acc, x: acc + x
    ) / F.size(F.col("v")).cast("double")
    l1 = F.aggregate(
        F.transform(F.col("codes"), lambda c: F.abs(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return withq.select(
        F.col(id_col),
        F.col("scale"),
        mse.alias("mse"),
        l1.alias("code_l1"),
    )
