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


def kmv_intersect_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """``(grp_a, grp_b, n_common, inter_est)`` — theta-sketch-style
    INTERSECTION cardinality estimate for every pair of groups: the set
    operation KMV union can't express (union keeps the k smallest of a
    merged set; intersection needs the common survivors below a shared
    threshold — the theta-sketch trick).

    Per group, the bottom-k distinct hashes form the sketch and the
    k-th smallest is its threshold θ (an exhausted group — fewer than k
    distinct values — keeps θ at the full hash span, making its sketch
    the exact set). For a pair, θ_ab = min(θ_a, θ_b); the estimator is
    |{h ∈ S_a ∩ S_b : h ≤ θ_ab}| · span/θ_ab — which degrades to the
    EXACT intersection count when both sides are exhausted. All sketch
    math is integer md5 hashes (oracle-replayable bit-for-bit); only
    the final scale-up divides floats.

    Scale shape: one distinct + per-group bottom-k window builds every
    sketch in one pass; the pair join runs over k-row sketches (≤ k·G
    rows total), never the raw sets — G groups cost G²/2 joins of
    k-row relations, independent of corpus size."""
    hashed = df.select(
        F.col(group_col).alias("grp"),
        h60(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    entries = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    thetas = entries.groupBy("grp").agg(
        F.max("h").alias("rk"), F.count("*").alias("n_seen")
    ).select(
        "grp",
        F.when(F.col("n_seen") < k, F.lit(int(_H60_SPAN_F)))
        .otherwise(F.col("rk"))
        .alias("theta"),
    )
    ea = entries.select(F.col("grp").alias("grp_a"), "h")
    eb = entries.select(F.col("grp").alias("grp_b"), "h")
    ta = thetas.select(
        F.col("grp").alias("grp_a"), F.col("theta").alias("th_a")
    )
    tb = thetas.select(
        F.col("grp").alias("grp_b"), F.col("theta").alias("th_b")
    )
    common = (
        ea.join(eb, "h")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .join(F.broadcast(ta), "grp_a")
        .join(F.broadcast(tb), "grp_b")
        .filter(F.col("h") <= F.least("th_a", "th_b"))
        .groupBy("grp_a", "grp_b")
        .agg(
            F.count("*").alias("n_common"),
            F.first(F.least("th_a", "th_b")).alias("th"),
        )
    )
    return common.select(
        "grp_a",
        "grp_b",
        F.col("n_common").cast("long").alias("n_common"),
        (
            F.col("n_common").cast("double")
            * F.lit(_H60_SPAN_F)
            / F.col("th").cast("double")
        ).alias("inter_est"),
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
    from mahout_samsara_book_spark.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(docs.select(text_col))
    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), F.col("term")).limit(k)


# ------------------------------------------------------------------ #
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — the bounded-memory
# frequency table for 100 TB token streams
# ------------------------------------------------------------------ #


def cms_build(
    docs: DataFrame,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
    text_col: str = "text",
) -> DataFrame:
    """``(r, bucket, c)`` — a depth×width Count-Min sketch of the token
    stream: row r's bucket for token t is ``(a_r·h31(t) + b_r) mod P31
    mod width`` over the portable md5-derived hash family
    (:mod:`.hashing`), so the DuckDB oracle reproduces every counter
    exactly.

    Scale shape: explode → ONE hash-aggregate on (r, bucket) with
    map-side combine — each partition collapses to ≤ depth·width partial
    rows before the shuffle, so the exchanged payload is O(depth·width·
    partitions) REGARDLESS of corpus size: the whole point of a sketch.
    The materialized sketch (depth·width rows) broadcasts anywhere."""
    from mahout_samsara_book_spark.functions.text import tokenize
    from mahout_samsara_book_spark.operators.hashing import (
        affine,
        h31,
        hash_family,
    )

    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
    fam = hash_family(depth, seed)
    rows = [
        toks.select(
            F.lit(r).cast("long").alias("r"),
            (affine(h31(F.col("term")), a, b) % F.lit(width)).alias("bucket"),
        )
        for r, (a, b) in enumerate(fam)
    ]
    stacked = rows[0]
    for other in rows[1:]:
        stacked = stacked.unionByName(other)
    return stacked.groupBy("r", "bucket").agg(F.count("*").alias("c"))


def cms_estimate(
    docs: DataFrame,
    probes: DataFrame,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """``(term, n_est)`` — point-query the sketch for each probe term:
    n_est = min over rows of the term's counter, the classic CMS upper
    bound (n_est ≥ true count always; ε ≈ e/width overestimate w.p.
    1−e^−depth). Probe terms are a small relation — the join of probes
    × sketch is broadcast on the sketch side (depth·width rows)."""
    from mahout_samsara_book_spark.operators.hashing import (
        affine,
        h31,
        hash_family,
    )

    sk = cms_build(docs, width, depth, seed, text_col)
    fam = hash_family(depth, seed)
    keyed = [
        probes.select(
            F.col(term_col).alias("term"),
            F.lit(r).cast("long").alias("r"),
            (affine(h31(F.col(term_col)), a, b) % F.lit(width)).alias(
                "bucket"
            ),
        )
        for r, (a, b) in enumerate(fam)
    ]
    stacked = keyed[0]
    for other in keyed[1:]:
        stacked = stacked.unionByName(other)
    hit = stacked.join(F.broadcast(sk), ["r", "bucket"], "left").select(
        "term", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return hit.groupBy("term").agg(F.min("c").cast("long").alias("n_est"))


# ------------------------------------------------------------------ #
# HyperLogLog (Flajolet et al. 2007) — portable register layout so the
# DuckDB oracle replays the registers AND the estimate bit-for-bit
# (Spark's native approx_count_distinct HLL++ can never hash-match a
# different engine; same rationale as KMV above)
# ------------------------------------------------------------------ #

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """``(grp, j, mj)`` — per-group HLL registers: j = top b bits of
    h60(value), mj = max over the group's values of rho(low bits) where
    rho = position of the first 1-bit from the MSB of the (60−b)-bit
    remainder (1-based; low == 0 → 60−b+1). rho is computed with
    integer/bit ops only (``length(bin(low))`` = bit_length in BOTH
    engines) — no floats, so registers are exactly replayable.

    Scale: one hash-aggregate on (grp, j) with map-side max combine —
    ≤ m rows per group cross the wire per partition."""
    low_bits = 60 - b
    h = h60(F.col(value_col).cast("string"))
    low = h % F.lit(1 << low_bits)
    rho = F.when(low == 0, F.lit(low_bits + 1)).otherwise(
        F.lit(low_bits) - F.length(F.bin(low)) + 1
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.shiftright(h, low_bits).cast("long").alias("j"),
            rho.alias("rho"),
        )
        .groupBy("grp", "j")
        .agg(F.max("rho").cast("long").alias("mj"))
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """``(group, n_est, n_regs)`` — per-group HLL distinct-count
    estimate from the portable registers. m = 2^b registers; raw
    estimate α_m·m²/Σ2^−M_j (absent registers contribute 2^0 = 1),
    with the standard small-range linear-counting correction
    (est ≤ 2.5m and zero registers present → m·ln(m/V)).

    The harmonic sum folds the ≤ m register terms in FIXED j order
    (sorted list fold, ≤ 64 addends/group) so Spark and the oracle add
    in the same sequence — same associativity discipline as pq_mse."""
    m = 1 << b
    regs = hll_registers(df, group_col, value_col, b)
    folded = regs.groupBy("grp").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("j", "mj"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(2.0), -x["mj"].cast("double")),
        ).alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    # registers never touched by any value contribute 2^-0 each
    harm = F.col("s_present") + (F.lit(m) - F.col("n_regs")).cast("double")
    raw = F.lit(_hll_alpha(m) * m * m) / harm
    zeros = (F.lit(m) - F.col("n_regs")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return folded.select(
        F.col("grp").alias(group_col),
        F.floor(est).cast("long").alias("n_est"),
        F.col("n_regs").cast("long").alias("n_regs"),
    )


def sample_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99),
    k: int = 256,
    seed: int = 17,
) -> DataFrame:
    """``(group, q, est)`` — per-group quantile estimates from a
    deterministic bottom-k-by-hash uniform sample (the mergeable
    quantile sketch a 100 TB pipeline uses when exact per-group sorts
    are off the table).

    Determinism contract: ``key_col`` SHOULD uniquely identify rows
    within a group — the hash is drawn from the key, so duplicate keys
    are correlated (sampled together), skewing the draw toward
    repeated keys. The selection itself stays deterministic either way
    (ties fall through to the value ordering below).

    The sample is the k rows whose portable hash ``h60(seed:key)`` is
    smallest — a uniform without-replacement sample that is MERGEABLE
    by construction (bottom-k of a union = bottom-k of the per-shard
    bottom-k's), unlike a Bernoulli sample whose size drifts. The
    estimate for quantile q is the exact order statistic of the sample
    at index ``floor((n_eff − 1)·q)`` in ``(value, key)`` order — pure
    selection, no interpolation arithmetic, so the replay is
    bit-exact on any engine.

    Scale shape: one row_number window per group over the hash order
    (the same partial-sort shuffle KMV uses — a cluster does this with
    a per-partition top-k combiner), then ONE tiny per-group sort of
    ≤ k retained rows. Nothing global, nothing driver-side; error is
    the standard ±O(1/√k) sample-quantile bound."""
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.col(key_col).alias("key"),
        h60(
            F.concat(
                F.lit(f"q{seed}:"), F.col(key_col).cast("string")
            )
        ).alias("h"),
    )
    # ("h", "key", "v"): the hash ranks the sample; "key" breaks hash
    # collisions; the final "v" makes selection deterministic even when
    # key_col is NOT unique (duplicate keys share h, so without it
    # row_number would pick an arbitrary duplicate's value). With a
    # unique key (recommended — the sample is then a true uniform
    # without-replacement draw) the "v" term never fires.
    w = Window.partitionBy("grp").orderBy("h", "key", "v")
    sample = hashed.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    sorted_vals = F.array_sort(
        F.collect_list(F.struct(F.col("v"), F.col("key")))
    )
    agg = sample.groupBy("grp").agg(
        sorted_vals.alias("sv"), F.count("*").alias("n_eff")
    )
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    out = agg.select(
        "grp",
        "n_eff",
        F.explode(qs).alias("q"),
        F.col("sv"),
    ).select(
        "grp",
        "q",
        F.element_at(
            F.col("sv"),
            (
                F.floor(
                    (F.col("n_eff") - F.lit(1)).cast("double") * F.col("q")
                )
                + F.lit(1)
            ).cast("int"),
        )["v"].alias("est"),
    )
    return out.select(
        F.col("grp").alias(group_col), "q", "est"
    )
