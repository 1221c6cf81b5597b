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
    """Unigram counts per document: ``(doc_id, term, tf)``."""
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
