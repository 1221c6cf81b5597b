"""Structured-streaming classification (SURVEY §2A note + §7 M4).

The reference's only 'streaming' element is a long-lived servlet loop
(``NaiveBayesServlet.scala:68-71``). Its idiomatic Spark upgrade is a
Structured Streaming pipeline: ``readStream`` over arriving documents →
stateless scoring against the static (broadcast) model → sink via
``foreachBatch``. Scoring is stateless, so no watermarks or state stores
are required — each micro-batch reuses the batch predictor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mahout_samsara_book_spark.algorithms.naive_bayes import predict_text_nb


def start_stream_scoring(
    docs_stream: DataFrame,
    weights: DataFrame,
    df_terms: DataFrame,
    n_docs: int,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Score a stream of documents; append predictions to ``out_path``
    parquet. ``docs_stream`` is any streaming DataFrame with
    (id_col, text_col); the model (weights + training-corpus df/N — IDF
    must come from training, not the micro-batch) is static and broadcast
    into each micro-batch join."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        preds = predict_text_nb(
            batch_df, weights, df_terms, n_docs, id_col, text_col
        )
        preds.write.mode("append").parquet(out_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
