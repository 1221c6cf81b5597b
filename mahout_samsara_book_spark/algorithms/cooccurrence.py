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


def _kln(k, r, c, n):
    """One cell of the relative-entropy form: k·ln((k·N)/(r·c)) with
    the 0-cell → 0 convention.  All four counts cast to double BEFORE
    multiplying (k·N overflows int64 near 100 TB scale), and the ratio
    is formed as ONE division so the log's argument is O(1) — see
    llr_expr."""
    kd, rd, cd, nd = (x.cast("double") for x in (k, r, c, n))
    return F.when(
        k > 0, kd * F.log(kd * nd / (rd * cd))
    ).otherwise(F.lit(0.0))


def llr_expr(k11, k12, k21, k22):
    """Dunning's G² in the RELATIVE-ENTROPY form
    2·Σ_cells k_ij·ln(k_ij·N / (row_i·col_j)) — mathematically the
    xlx-of-marginals form, but numerically stable where that one is
    not: the xlx form sums terms of magnitude N·ln N (~2e7 at one
    million users) that cancel to an O(1) score, amplifying the
    last-ulp difference between the JVM's and the oracle engine's
    ln() by N·ln N / G² (measured at sf1: flipped the 8th printed
    digit of rec_cross_llr scores).  Here every term is O(G²)
    magnitude — each cell count multiplies the log of an O(1)
    observed/expected ratio — so a 1-ulp ln() difference stays ~1e-15
    relative and the %.7e print is safe (same residual class as a
    single un-iterated distributed sum).  Term order and the exact
    float op shapes (one division, left-assoc adds) are mirrored in
    the oracle SQL."""
    n = k11 + k12 + k21 + k22
    ra, rb = k11 + k12, k21 + k22
    ca, cb = k11 + k21, k12 + k22
    return F.lit(2.0) * (
        _kln(k11, ra, ca, n)
        + _kln(k12, ra, cb, n)
        + _kln(k21, rb, ca, n)
        + _kln(k22, rb, cb, n)
    )


def _distinct_by_user(
    df: DataFrame, user_col: str, item_col: str
) -> DataFrame:
    """(u, i) distinct interactions, hash-partitioned by u (round-12,
    guide §2.4): repartition the RAW relation by user once, then the
    (u, i) distinct (clustered by a superset of the partitioning) and
    every per-user consumer downstream — the cap window, the history
    collect_list — run exchange-free on top of the same exchange.  The
    unfused form paid two full shuffles of the relation (distinct on
    (u, i), then the window's repartition by u); this pays one shuffle
    of the raw rows — a win whenever the duplicate factor is below 2
    (sf0.1 purchases: 1.02×; the events side: <1.5×), and one fewer
    exchange/stage at every scale.  Skew note: a power user's raw rows
    land in one partition here, which is exactly the skew the cap
    window already had to absorb — same bound, one stage earlier."""
    return (
        df.select(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .repartition("u")
        .distinct()
    )


def item_similarity_llr(
    interactions: DataFrame,
    k: int = 10,
    max_prefs: int = 50,
    seed: int = 31,
    user_col: str = "user_id",
    item_col: str = "item_id",
    _inter: DataFrame | None = None,
) -> DataFrame:
    """``(item_id, other, llr, rank)`` — each item's top-k most-similar
    items by LLR over capped user histories.  Similarity is symmetric;
    both orientations of a pair are ranked so every item gets its own
    neighbor list (the serving-index shape).  ``_inter`` lets
    :func:`similarity_analysis` pass the shared distinct (u, i)
    relation so the compose scans the primary once."""
    inter = (
        _distinct_by_user(interactions, user_col, item_col)
        if _inter is None
        else _inter
    )
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
    # (Round-12 tried folding the count into the plan as a one-row
    # broadcast scalar to save this job — measured SLOWER, min 10.8 s
    # vs 8.1 s at sf0.1 with 19-45 s spikes: the BroadcastExchange
    # build serializes the cache materialization against the main
    # query's stages and the BroadcastNestedLoopJoin breaks codegen
    # around the score projection.  Round-13 tried the OTHER direction
    # too — counting n_users on the raw relation, provably equal for
    # cap >= 1, so the cache materializes lazily inside the final job —
    # and interleaved A/B said that also LOSES 10-20% (raw 4.2-4.6 s vs
    # warmed 3.2-3.8 s on rec_item_llr at sf0.1): the raw count re-runs
    # the primary build join that the cached distinct already holds,
    # and the final job overlaps worse when it must also materialize
    # the caches.  The eager cache-warming count stays.)
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
    # similarity is symmetric: emit BOTH orientations of each scored
    # pair map-side with one explode (round-13, guide §1.2) — the
    # previous two-arm union referenced the scored subtree twice, and
    # the physical planner does not reliably reuse the pair-aggregate
    # exchange across union arms, so the most expensive stage could
    # execute once per orientation
    both = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias(item_col),
                    F.col("ib").alias("other"),
                    F.col("llr"),
                ),
                F.struct(
                    F.col("ib").alias(item_col),
                    F.col("ia").alias("other"),
                    F.col("llr"),
                ),
            )
        ).alias("e")
    ).select(f"e.{item_col}", "e.other", "e.llr")
    w_rank = Window.partitionBy(item_col).orderBy(
        F.round(F.col("llr"), 9).desc(), F.col("other").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(item_col, "other", "llr", "rank")
    )

def cross_similarity_llr(
    primary: DataFrame,
    secondary: DataFrame,
    k: int = 10,
    max_prefs: int = 50,
    max_prefs_secondary: int | None = None,
    seed: int = 31,
    user_col: str = "user_id",
    item_col: str = "item_id",
    _inter_primary: DataFrame | None = None,
) -> DataFrame:
    """CROSS-cooccurrence — Mahout's ``SimilarityAnalysis.cooccurrences``
    with a secondary action matrix (round-11): the A′B indicator of the
    universal-recommender story.  ``primary`` holds the action being
    recommended (e.g. purchase: user × item_a) and ``secondary`` a
    correlated cheaper action (e.g. view/click: user × item_b, a
    DIFFERENT item space is fine); the output ``(item_id, other, llr,
    rank)`` ranks, for each PRIMARY item, the secondary items whose
    user sets overlap it most surprisingly — "people who bought A
    also viewed B".  Unlike :func:`item_similarity_llr` the matrix is
    NOT symmetric, so only the primary orientation is ranked.

    Contingency cells per (a, b): k11 = users with BOTH primary-a and
    secondary-b; row/col totals are each side's per-item user counts
    (after capping); N = the distinct-user universe across BOTH capped
    relations (users present on one side only still shape the table —
    Mahout's row count of the paired matrices).

    Scale shape mirrors item_similarity_llr, with the dial now
    RECTANGULAR: per-user pair volume is |A_u|·|B_u| ≤ cap_a·cap_b, so
    the stream is n_users·cap_a·cap_b — linear in users, never
    quadratic in a power user's degree on either side.  Both histories
    cap by deterministic per-(user, item) hash order (independent
    tags, so the two sides' samples are uncorrelated).  Pair
    generation is ONE co-partitioned join of the two per-user sorted
    lists (both grouped by u — the exchange is shared) feeding a fused
    nested-transform explode inside the partial pair-count aggregation:
    only distinct (a, b) keys reach the shuffle, never the raw pair
    stream.  LLR from four integer counts in one codegen'd expression —
    no distributed float sums, bit-exact oracle replay."""
    cap_b = max_prefs if max_prefs_secondary is None else max_prefs_secondary

    def _capped(df: DataFrame, tag: str, cap: int, pre=None) -> DataFrame:
        # one hash(u) exchange shared by the distinct AND the cap
        # window (see _distinct_by_user); `pre` is the compose's shared
        # distinct primary
        rel = (
            _distinct_by_user(df, user_col, item_col)
            if pre is None
            else pre
        )
        w = Window.partitionBy("u").orderBy(
            h60(
                F.concat(
                    F.lit(tag),
                    F.col("u").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            F.col("i"),
        )
        return (
            rel.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("u", "i")
        )

    # each capped side feeds three consumers (its item counts, the
    # user-universe count, its pair-join side) — track() persists one
    # scan + cap window per side; the N count below warms both (the
    # raw-relation count variant was tried and measured slower in
    # round-13 — see item_similarity_llr's inline note).
    pa = track(_capped(primary, f"recxA{seed}:", max_prefs, _inter_primary))
    sb = track(_capped(secondary, f"recxB{seed}:", cap_b))
    n_users = (
        pa.select("u").unionByName(sb.select("u")).distinct().count()
    )
    ca = pa.groupBy("i").agg(F.count(F.lit(1)).alias("na")).select(
        F.col("i").alias("a"), "na"
    )
    cb = sb.groupBy("i").agg(F.count(F.lit(1)).alias("nb")).select(
        F.col("i").alias("b"), "nb"
    )
    lists_a = pa.groupBy("u").agg(
        F.sort_array(F.collect_list("i")).alias("as_")
    )
    lists_b = sb.groupBy("u").agg(
        F.sort_array(F.collect_list("i")).alias("bs_")
    )
    pairs = (
        lists_a.join(lists_b, "u")
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("as_"),
                        lambda a: F.transform(
                            F.col("bs_"),
                            lambda b: F.struct(
                                a.alias("a"), b.alias("b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    pair_counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("k11")
    )
    scored = (
        pair_counts.join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            llr_expr(
                F.col("k11"),
                F.col("na") - F.col("k11"),
                F.col("nb") - F.col("k11"),
                F.lit(n_users) - F.col("na") - F.col("nb") + F.col("k11"),
            ).alias("llr"),
        )
    )
    w_rank = Window.partitionBy("a").orderBy(
        F.round(F.col("llr"), 9).desc(), F.col("b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a").alias(item_col),
            F.col("b").alias("other"),
            "llr",
            "rank",
        )
    )

def similarity_analysis(
    primary: DataFrame,
    secondaries: list[DataFrame] | None = None,
    k: int = 10,
    max_prefs: int = 50,
    seed: int = 31,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> list[DataFrame]:
    """Mahout's ``SimilarityAnalysis.cooccurrences`` signature: the
    primary action matrix plus any number of secondary action
    matrices, returning ``[A′A indicator, A′B₁, A′B₂, ...]`` — the
    full universal-recommender input in one call.  Element 0 is
    :func:`item_similarity_llr` on the primary; each further element
    is :func:`cross_similarity_llr` against that secondary (all with
    the same caps/seed, so a serving layer can union them by source).
    The compose shares ONE distinct (u, i) primary relation across
    every indicator (round-12): the cap windows differ per indicator
    (independent hash tags — Mahout's uncorrelated downsampling), but
    the distinct interactions they cap are the same rows, so the
    primary scan + repartition + distinct runs once and is cached;
    each extra secondary previously re-derived it (a full interaction
    scan + shuffle per indicator at 100 TB).  Each indicator keeps its
    own plan otherwise."""
    shared = track(_distinct_by_user(primary, user_col, item_col))
    outs = [
        item_similarity_llr(
            primary, k=k, max_prefs=max_prefs, seed=seed,
            user_col=user_col, item_col=item_col, _inter=shared,
        )
    ]
    for sec in secondaries or []:
        outs.append(
            cross_similarity_llr(
                primary, sec, k=k, max_prefs=max_prefs, seed=seed,
                user_col=user_col, item_col=item_col,
                _inter_primary=shared,
            )
        )
    return outs
