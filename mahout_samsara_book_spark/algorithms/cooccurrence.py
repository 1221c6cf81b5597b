"""Item-item cooccurrence recommender with log-likelihood-ratio
scoring — Mahout's flagship Spark use case (``spark-itemsimilarity`` /
``SimilarityAnalysis.cooccurrence``, Dunning 1993), round-10.

Given a (user, item) interaction relation, score item pairs by how
SURPRISINGLY often they co-occur in user histories (LLR of the 2×2
contingency table) and keep each item's top-k most-similar items — the
indicator matrix a co-occurrence recommender serves.

Design for 100 TB:

- Interactions dedup to (user, item) once (map-side combinable).
- Per-user history is CAPPED at ``max_prefs`` items (Mahout's
  ``maxNumInteractions`` dial) chosen by a deterministic per-(user,
  item) hash order — the pair stream is then Σ min(|history|,
  cap)² ≈ n_users·cap², linear in users, never quadratic in a power
  user's degree (one viral user with 1M interactions would otherwise
  emit 10¹² pairs).  The cap is THE scale dial and it is quadratic:
  on the sf10 fixture (6M interactions, ~40 items/user), cap=50 left
  histories uncapped and the ~1.2B pair observations spilled >75 GB
  of aggregation state — twice — before the disk filled; cap=25
  quarters that.  Mahout's own answer is the same downsampling.
- Pair counting is per-user sorted lists + a fused explode feeding ONE
  map-side-combined groupBy — never a self-join on user (see
  item_similarity_llr's inline note for the measured spill difference).
- LLR is computed from four INTEGER counts in one codegen'd
  expression, so the score is bit-identical on any engine evaluating
  the same formula (no distributed float sums anywhere) — the DuckDB
  oracle replays it exactly; ranking rounds to 9 decimals before the
  tiebreak (the bm25 ulp discipline).

Relationship to text_pmi_pairs (functions/text_analysis.py): PMI
scores token ADJACENCY within documents; this scores item co-presence
within user HISTORIES with the LLR test, which (unlike PMI) does not
explode on rare pairs — the reason Mahout standardized on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_samsara_book_spark.cache import track
from mahout_samsara_book_spark.operators.hashing import h60


def _xlx(c):
    """x·ln(x) with the 0·ln(0)=0 convention, on an integer column."""
    return F.when(c > 0, c.cast("double") * F.log(c.cast("double"))).otherwise(
        F.lit(0.0)
    )


def llr_expr(k11, k12, k21, k22):
    """Dunning's G² = 2·(Σ xlx(cells) − Σ xlx(row sums) − Σ xlx(col
    sums) + xlx(N)) — written in this exact term order on both engines
    (integer inputs ⇒ identical floats)."""
    n = k11 + k12 + k21 + k22
    return F.lit(2.0) * (
        _xlx(k11)
        + _xlx(k12)
        + _xlx(k21)
        + _xlx(k22)
        - _xlx(k11 + k12)
        - _xlx(k21 + k22)
        - _xlx(k11 + k21)
        - _xlx(k12 + k22)
        + _xlx(n)
    )


def item_similarity_llr(
    interactions: DataFrame,
    k: int = 10,
    max_prefs: int = 50,
    seed: int = 31,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """``(item_id, other, llr, rank)`` — each item's top-k most-similar
    items by LLR over capped user histories.  Similarity is symmetric;
    both orientations of a pair are ranked so every item gets its own
    neighbor list (the serving-index shape)."""
    inter = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    w_cap = Window.partitionBy("u").orderBy(
        h60(
            F.concat(
                F.lit(f"rec{seed}:"),
                F.col("u").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            )
        ),
        F.col("i"),
    )
    # capped histories feed FIVE consumers (n_users, item counts, both
    # pair-join sides, and through them the score join): without
    # caching, Catalyst re-derives the interaction scan + cap window
    # once per branch — 6 scans of the interaction log at 100 TB.
    # track() persists it once; the n_users count below warms it.
    capped = track(
        inter.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= max_prefs)
        .select("u", "i")
    )
    n_users = capped.select("u").distinct().count()
    item_counts = capped.groupBy("i").agg(F.count(F.lit(1)).alias("ni"))
    # Pair generation is per-user sorted lists + a fused explode, NOT a
    # self-join on user: the join formulation sorts/spills the WHOLE
    # exploded pair stream (Σ h² ≈ 1.2B pairs at the sf10 fixture —
    # measured, it filled 49 GB of shuffle spill and died); here each
    # ≤cap-length list expands inside the same stage as the partial
    # pair-count aggregation, so only DISTINCT (ia, ib) keys ever reach
    # the exchange.  Same shape as Mahout's per-row outer product in
    # A'A.  Lists sort ascending, so ia < ib by construction.
    lists = capped.groupBy("u").agg(
        F.sort_array(F.collect_list("i")).alias("items")
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, idx: F.transform(
                        F.slice(
                            F.col("items"),
                            idx + F.lit(2),
                            F.size(F.col("items")),
                        ),
                        lambda b: F.struct(
                            a.alias("ia"), b.alias("ib")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.ia", "p.ib")
    pair_counts = pairs.groupBy("ia", "ib").agg(
        F.count(F.lit(1)).alias("k11")
    )
    ca = item_counts.select(F.col("i").alias("ia"), F.col("ni").alias("na"))
    cb = item_counts.select(F.col("i").alias("ib"), F.col("ni").alias("nb"))
    scored = (
        pair_counts.join(ca, "ia")
        .join(cb, "ib")
        .select(
            "ia",
            "ib",
            llr_expr(
                F.col("k11"),
                F.col("na") - F.col("k11"),
                F.col("nb") - F.col("k11"),
                F.lit(n_users) - F.col("na") - F.col("nb") + F.col("k11"),
            ).alias("llr"),
        )
    )
    both = scored.select(
        F.col("ia").alias(item_col), F.col("ib").alias("other"), "llr"
    ).unionByName(
        scored.select(
            F.col("ib").alias(item_col), F.col("ia").alias("other"), "llr"
        )
    )
    w_rank = Window.partitionBy(item_col).orderBy(
        F.round(F.col("llr"), 9).desc(), F.col("other").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(item_col, "other", "llr", "rank")
    )
