"""Legacy Hadoop SequenceFile ingest (A23 — ``NaiveBayesServlet.scala:
45-64`` reads ``(Text → IntWritable)`` dictionary and ``(IntWritable →
LongWritable)`` df-count SequenceFiles).

The engine's canonical store is two-column parquet (SURVEY §1.1), but
bug-for-bug ingest of existing Mahout artifacts needs the real format:
these helpers round-trip through Spark's SequenceFile support with
automatic Writable conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_dictionary_sequence_file(dictionary: DataFrame, path: str) -> None:
    """``(term string, index int)`` → SequenceFile[Text, IntWritable]."""
    rdd = dictionary.rdd.map(lambda r: (r["term"], int(r["index"])))
    rdd.saveAsSequenceFile(path)


def read_dictionary_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """SequenceFile[Text, IntWritable] → ``(term, index)`` DataFrame —
    the servlet's init-time dictionary load, DataFrame-native."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "term string, index long")


def write_df_counts_sequence_file(df_counts: DataFrame, path: str) -> None:
    """``(index int, df long)`` → SequenceFile[IntWritable, LongWritable];
    the reference stores corpus size under index -1 (FIXTURES.md F7)."""
    rdd = df_counts.rdd.map(lambda r: (int(r["index"]), int(r["df"])))
    rdd.saveAsSequenceFile(path)


def read_df_counts_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "index long, df long")
