"""Text analysis for training-data pipelines (north star, BASELINE.json):
language ID, quality scoring, token counting, document fingerprinting.
Every function is a pure Spark SQL expression pipeline, replayable by the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_samsara_book_spark.cache import cached_count

from mahout_samsara_book_spark.functions.text import tokenize
from mahout_samsara_book_spark.partitioning import ensure_min_partitions
from mahout_samsara_book_spark.operators.hashing import P31, h31

# Tiny deterministic stopword profiles (top function words). The langid
# heuristic scores token overlap with each profile — the standard
# stopword-coverage shortcut for n-gram language ID.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "que"],
    "zh": ["de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"],
}

# BPE-ish pre-tokenization: letter runs | digit runs | single non-space
# symbol — the classic GPT-2-style pre-tokenizer shape, regex-only.
BPE_ISH_PATTERN = r"[\p{L}]+|[\p{Nd}]+|[^\p{L}\p{Nd}\s]"

WS_PATTERN = r"\s+"


def langid_best(toks) -> "F.Column":
    """Expression form of the language-ID argmax over a tokens column:
    a struct ``(lang, score)`` of the best stopword-coverage language
    (score desc, lang asc tiebreak). Shared by :func:`language_id` and
    the fused quality+lang stage in ``operators.pipeline`` so a caller
    that already materialized tokens pays for them exactly once."""
    n_tok = F.greatest(F.size(toks), F.lit(1))

    def coverage(words: list[str]):
        # single-arg lambda: F.filter treats 2-arg lambdas as (elem, idx)
        return F.size(F.filter(toks, lambda t: t.isin(words))) / n_tok

    scores = [
        (lang, coverage(words)) for lang, words in sorted(LANG_PROFILES.items())
    ]
    pairs = F.array(
        *[
            F.struct(F.lit(lang).alias("lang"), s.alias("score"))
            for lang, s in scores
        ]
    )
    # max by (score desc, lang asc): array_sort then take first
    return F.array_sort(
        pairs,
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, lang_pred, lang_score)`` — argmax of stopword coverage
    (ties broken by language code; zero coverage → 'und').

    Tokens are materialized in their OWN projection: higher-order
    functions evaluate interpreted (outside whole-stage codegen's
    subexpression elimination), so inlining ``tokenize`` into each
    language's filter would re-run the regex split once per language per
    row. CollapseProject keeps a multiply-referenced non-cheap alias in
    its own stage — measured ~2.7× on the langid query."""
    base = ensure_min_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("_toks")
    )
    best = langid_best(F.col("_toks"))
    return base.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, ws_tokens, bpe_ish_tokens, n_chars)`` — whitespace
    token count and a BPE-style pre-tokenizer count, regex-only."""
    text = F.col(text_col)
    ws = F.size(
        F.filter(F.split(text, WS_PATTERN), lambda t: t != "")
    )
    bpe = F.size(
        F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))
    )
    docs = ensure_min_partitions(docs.select(id_col, text_col))
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document quality in [0,1] from cheap surface features:
    stopword ratio, alpha ratio, mean token length band, length band —
    the standard pretraining-corpus filters (Gopher/C4-style rules),
    linearized. ``(doc_id, stopword_ratio, alpha_ratio, mean_tok_len,
    quality)``."""
    # tokens materialized in their own projection — see language_id's
    # docstring (HOFs evaluate interpreted; avoid per-use re-tokenize)
    base = ensure_min_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.col(text_col),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    q = quality_exprs(F.col(text_col), F.col("_toks"))
    return base.select(
        F.col(id_col),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["mean_tok_len"].cast("double").alias("mean_tok_len"),
        q["quality"].alias("quality"),
    )


def quality_exprs(text, toks) -> dict:
    """Expression form of the quality features over (text, tokens)
    columns — shared by :func:`quality_score` and the fused stage in
    ``operators.pipeline`` (one tokenization per corpus scan)."""
    n_tok = F.greatest(F.size(toks), F.lit(1))
    en_stop = LANG_PROFILES["en"]
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(en_stop))) / n_tok
    )
    alpha_chars = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    alpha_ratio = alpha_chars / F.greatest(F.length(text), F.lit(1))
    mean_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / n_tok
    len_band = F.when((F.size(toks) >= 10) & (F.size(toks) <= 100000), 1.0).otherwise(0.3)
    tok_band = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.3)
    quality = F.least(
        F.lit(1.0),
        (
            0.35 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
            + 0.35 * alpha_ratio
            + F.lit(0.15) * len_band
            + F.lit(0.15) * tok_band
        ),
    )
    return {
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "mean_tok_len": mean_len,
        "quality": quality,
    }


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tok, dup_token_frac, top_bigram_frac)`` — the
    Gopher-style repetition filters: fraction of non-unique tokens and
    the share of bigram occurrences claimed by the single most frequent
    bigram (high values flag boilerplate / keyword-stuffed docs).

    Shape at scale: one explode + ONE aggregation keyed on
    (doc_id, bigram) then a per-doc rollup — both map-side combinable,
    both partitioned by doc_id-derived keys so skew is bounded by the
    longest single document, never by corpus size. The unigram stats
    ride along as row-local array expressions (no second pass)."""
    # tokens materialized in their own projection — HOF arguments
    # evaluate interpreted and re-run per use-site (see language_id);
    # inlining tokenize() into the three consumers below measured 4×
    # slower at sf0.1
    toks = F.col("_toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = ensure_min_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("_n_uniq"),
        F.explode_outer(bigrams).alias("_gram"),
    )
    counts = base.groupBy(id_col, "n_tok", "_n_uniq", "_gram").agg(
        F.count("*").alias("_c")
    )
    gram_c = F.when(F.col("_gram").isNotNull(), F.col("_c"))
    agg = counts.groupBy(id_col, "n_tok", "_n_uniq").agg(
        F.max(gram_c).alias("_top"),
        F.sum(gram_c).alias("_tot"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.when(
            F.col("n_tok") > 0,
            1.0 - F.col("_n_uniq").cast("double") / F.col("n_tok").cast("double"),
        )
        .otherwise(0.0)
        .alias("dup_token_frac"),
        F.when(
            F.col("_tot") > 0,
            F.col("_top").cast("double") / F.col("_tot").cast("double"),
        )
        .otherwise(0.0)
        .alias("top_bigram_frac"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    fold over token hashes with acc = (acc·31 + h31(token)) mod P31 —
    equal only for identical token sequences (whitespace/punct
    normalized away by the tokenizer). ``(doc_id, fingerprint)``."""
    hashes = F.transform(tokenize(F.col(text_col)), lambda t: h31(t))
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(P31),
    )
    docs = ensure_min_partitions(docs.select(id_col, text_col))
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_bigrams, avg_logp)`` — corpus-trained bigram
    language-model quality score: train add-one-smoothed bigram
    probabilities over the WHOLE corpus, then score each document by
    the mean log-probability of its own bigrams,

        P(w₂|w₁) = (c(w₁,w₂) + 1) / (ctx(w₁) + V)

    with ``ctx(w₁)`` the count of w₁ as a bigram context and ``V`` the
    corpus vocabulary size. This is the classic perplexity-flavored
    quality gate of training-data pipelines (low avg_logp ⇒ text that
    doesn't look like the corpus: boilerplate, noise, wrong language).

    Scale shape: token explode → per-user-partition window (lead) →
    two map-side-combined count aggregates (bigram, context) → two
    hash equi-joins back on token keys (broadcast-able while the
    vocabulary is small, plain shuffled hash joins when it isn't) →
    per-doc ordered fold. Nothing driver-side except the vocabulary
    cardinality (one long). The per-doc mean folds bigram log-probs in
    position order so the oracle replays the identical float sequence
    (same discipline as graph.pagerank's ordered incoming-mass fold).

    Documents with fewer than two tokens contribute no bigrams and are
    absent from the output (both engines agree by construction).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = toks.select(
        F.col(id_col),
        "pos",
        "tok",
        F.lead("tok").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    bc = bg.groupBy("tok", "nxt").agg(F.count("*").alias("cnt"))
    ctx = bc.groupBy("tok").agg(F.sum("cnt").alias("ctx_cnt"))
    # scalar literal the plan needs — plan-fingerprint-cached so
    # repeat builds are job-free (cache.cached_count)
    vocab = cached_count(toks.select("tok").distinct())
    logp = F.log(
        (F.col("cnt") + F.lit(1)).cast("double")
        / (F.col("ctx_cnt") + F.lit(int(vocab))).cast("double")
    )
    scored = (
        bg.join(bc, ["tok", "nxt"])
        .join(ctx, "tok")
        .select(F.col(id_col), "pos", logp.alias("logp"))
    )
    ordered_sum = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("logp").alias("v")))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["v"],
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (ordered_sum / F.count("*").cast("double")).alias("avg_logp"),
    )


def pmi_pairs(
    docs: DataFrame,
    min_cooc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(a, b, cooc, pmi)`` — document-level pointwise mutual
    information between token pairs,

        PMI(a,b) = ln( (cooc(a,b) · N) / (df(a) · df(b)) )

    with ``cooc`` the number of docs containing BOTH tokens, ``df`` the
    per-token document frequency, and N the corpus size — the standard
    collocation / word-association miner of corpus curation (finds
    boilerplate phrases and template artifacts that repeat across
    documents).

    Scale shape (round-13, guide §2.4): the per-doc DISTINCT token SET
    is already the basket — ``array_sort(array_distinct(tokenize))``
    is row-local — so the basket projection that
    graph.cooccurrence_edges pays a groupBy(doc)+collect_set shuffle
    for here costs ZERO exchanges, and the one tokenize pass is shared
    (tracked) by both consumers: the map-side pair fan-out feeding the
    pair-keyed counting aggregate (with the ``min_cooc`` HAVING filter
    keeping the pair relation sparse), and the df aggregate.  The
    previous form scanned + tokenized the corpus twice AND shuffled
    the full exploded token stream into baskets.  The PMI arithmetic
    is a fixed double-op sequence so the oracle replays it
    bit-for-bit. Per-doc pair fan-out is quadratic in distinct-token
    count; cap or chunk pathological documents upstream
    (sel_chunk_docs) before mining."""
    from mahout_samsara_book_spark.cache import track
    from mahout_samsara_book_spark.functions.text import tokenize
    from mahout_samsara_book_spark.partitioning import (
        ensure_min_partitions,
    )

    base = track(
        ensure_min_partitions(docs.select(F.col(text_col))).select(
            F.array_sort(
                F.array_distinct(tokenize(F.col(text_col)))
            ).alias("xs")
        )
    )
    xs = F.col("xs")
    # identical pair emission to cooccurrence_edges' unpacked path:
    # (a, b) with a < b from the sorted distinct-token array, exploded
    # map-side, repartitioned on the pair key BEFORE the counting
    # aggregate (the round-8 scale fix — the pair stream is almost all
    # unique keys, so a raw-stream partial aggregate combines nothing)
    pair_structs = F.flatten(
        F.transform(
            xs,
            lambda x, i: F.transform(
                F.slice(xs, i + F.lit(2), F.size(xs) - i - F.lit(1)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        base.filter(F.size(xs) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .repartition("a", "b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= F.lit(int(min_cooc)))
    )
    dfc = base.select(F.explode(xs).alias("t")).groupBy("t").agg(
        F.count("*").alias("dfc")
    )
    n_docs = cached_count(docs)
    num = F.col("cooc").cast("double") * F.lit(float(n_docs))
    den = F.col("dfa").cast("double") * F.col("dfb").cast("double")
    return (
        pairs.join(dfc.select(F.col("t").alias("a"), F.col("dfc").alias("dfa")), "a")
        .join(dfc.select(F.col("t").alias("b"), F.col("dfc").alias("dfb")), "b")
        .select("a", "b", "cooc", F.log(num / den).alias("pmi"))
    )


def js_divergence_by_group(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(grp_a, grp_b, js)`` — Jensen–Shannon divergence between the
    unigram term distributions of every group pair (a < b): the
    corpus-drift / domain-shift metric (0 = identical language use,
    ln 2 = disjoint vocabularies).

    Decomposition that avoids a full-outer term join: over the SHARED
    vocabulary fold ``p·ln(2p/(p+q)) + q·ln(2q/(p+q))``; terms unique
    to one side contribute exactly ``ln 2`` times their missing mass,
    recovered as ``1 − Σ_shared p`` (and symmetrically q) — so one
    inner join plus three ordered folds per pair replaces the sparse
    full-outer. All folds run in term order on both engines, making
    the float trajectory replayable.

    Scale shape: distributions are per-group aggregates (map-side
    combined); the pair join is on the term key (vocabulary-sized, not
    corpus-sized), and groups are few — the whole comparison is
    O(pairs · shared vocab)."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(tokenize(F.col(text_col))).alias("t"),
    )
    cnt = toks.groupBy("g", "t").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("g").agg(F.sum("n").alias("tot"))
    dist = cnt.join(tot, "g").select(
        "g", "t", (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p")
    )
    a = dist.select(
        F.col("g").alias("grp_a"), "t", F.col("p").alias("pa")
    )
    b = dist.select(
        F.col("g").alias("grp_b"), "t", F.col("p").alias("pb")
    )
    shared = a.join(b, "t").filter(F.col("grp_a") < F.col("grp_b"))
    term = (
        F.col("pa") * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
        + F.col("pb") * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))
    )
    scored = shared.select("grp_a", "grp_b", "t", term.alias("c"), "pa", "pb")

    def _fold(col_name):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col(col_name).alias("v")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    agg = scored.groupBy("grp_a", "grp_b").agg(
        _fold("c").alias("s1"),
        _fold("pa").alias("spa"),
        _fold("pb").alias("spb"),
    )
    # fully-disjoint pairs share no term, produce no join row, and
    # would silently vanish — their JS is exactly ln 2. Build the pair
    # universe from the (tiny) group list and default the folds to 0.
    groups = dist.select(F.col("g")).distinct()
    ga = groups.select(F.col("g").alias("grp_a"))
    gb = groups.select(F.col("g").alias("grp_b"))
    pairs = ga.crossJoin(gb).filter(F.col("grp_a") < F.col("grp_b"))
    full = pairs.join(agg, ["grp_a", "grp_b"], "left").select(
        "grp_a",
        "grp_b",
        F.coalesce(F.col("s1"), F.lit(0.0)).alias("s1"),
        F.coalesce(F.col("spa"), F.lit(0.0)).alias("spa"),
        F.coalesce(F.col("spb"), F.lit(0.0)).alias("spb"),
    )
    import math

    js = F.lit(0.5) * (
        F.col("s1")
        + F.lit(math.log(2.0))
        * ((F.lit(1.0) - F.col("spa")) + (F.lit(1.0) - F.col("spb")))
    )
    return full.select("grp_a", "grp_b", js.alias("js"))
