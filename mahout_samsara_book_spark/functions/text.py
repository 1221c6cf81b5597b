"""Text vectorization (SURVEY §2D D1; reference
``naiveBayesExample/.../NaiveBayesServlet.scala:76-106``).

Tokenization contract (``NaiveBayesServlet.scala:80-83``): lowercase,
split on runs of non-letter/non-digit (``[^\\p{L}\\p{Nd}]+``), unigram
counts. TF-IDF weight is Mahout's ``TFIDF`` class, which wraps Lucene's
classic DefaultSimilarity:

    weight(t, d) = sqrt(tf) * (ln(N / (df + 1)) + 1)

All of it is pure Spark SQL (regexp split + explode + groupBy + joins) —
no UDFs, fully pushdown/codegen-friendly, and relationally checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^\p{L}\p{Nd}]+"


def tokenize(text: Column) -> Column:
    """lowercase → split on non-letter/digit runs → drop empty tokens."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != ""
    )


def term_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Unigram counts per document: ``(doc_id, term, tf)``.

    The tokenize+explode is the corpus's hottest narrow stage, so the
    scan-parallelism guard widens small-file inputs before it (no-op on
    any real-scale table — see ``partitioning.py``)."""
    from mahout_samsara_book_spark.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(docs.select(id_col, text_col))
    return (
        docs.select(id_col, F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(counts: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(term, df)`` — number of docs containing each term. ``counts``
    is unique per (doc, term) by construction, so a plain count suffices
    (a countDistinct would add a needless distinct-aggregate phase)."""
    return counts.groupBy("term").agg(F.count("*").alias("df"))


def build_dictionary(counts: DataFrame) -> DataFrame:
    """``(term, index)`` with dense 0-based indexes in term sort order —
    the deterministic replacement for the reference's SequenceFile
    dictionary (``NaiveBayesServlet.scala:45-48``; FIXTURES.md F7)."""
    from pyspark.sql import Window

    w = Window.orderBy("term")
    return (
        counts.select("term")
        .distinct()
        .select("term", (F.row_number().over(w) - 1).alias("index"))
    )


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, term, tfidf)`` with the Lucene/Mahout weight.

    N (corpus size) rides along as a broadcast scalar subquery — no
    eager driver-side count, so callers stay single-job; df comes from
    a broadcast-joined term table (vocabulary ≪ corpus at scale).
    """
    counts = counts if counts is not None else term_counts(docs, id_col, text_col)
    n_df = docs.select(id_col).distinct().agg(
        F.count("*").cast("double").alias("_n")
    )
    dfs = doc_frequencies(counts, id_col)
    return (
        counts.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n_df))
        .select(
            id_col,
            "term",
            (
                F.sqrt(F.col("tf"))
                * (F.log(F.col("_n") / (F.col("df") + 1.0)) + 1.0)
            ).alias("tfidf"),
        )
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 2,
    head_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(term, df, total_tf, head_postings)`` — the search-index build
    step: per term, document frequency, total term frequency, and the
    first ``head_k`` doc ids of the doc-id-sorted posting list.

    The head cap is the scale contract: a stop-word's full posting list
    at 100 TB is the corpus itself, so the index build emits bounded
    blocks (real engines shard postings the same way) while ``df`` /
    ``total_tf`` still summarize the full list. The cap is applied
    BEFORE collection — rank per term, keep only rank ≤ head_k in the
    list aggregate — so no reducer ever materializes an unbounded
    array (collect-then-slice would). The rank window and the final
    aggregate share the term partitioning, so Catalyst plans one
    exchange for both."""
    from pyspark.sql import Window

    counts = term_counts(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("term").orderBy(id_col)
    ranked = counts.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("rn") <= F.lit(int(head_k)), F.col(id_col))
            )
        ).alias("head_postings"),
    )
    return agg.filter(F.col("df") >= F.lit(int(min_df)))
