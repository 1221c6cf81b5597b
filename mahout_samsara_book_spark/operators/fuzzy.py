"""Fuzzy (approximate string) self-join via deletion neighborhoods —
the FastSS family (Bocek et al. 2007): two strings are within edit
distance 1 iff they share a member of each other's 1-deletion
neighborhood, so candidate generation is an equi-join on generated
variants, NEVER an all-pairs product.

Scale shape (100 TB of names/titles): variants per string = length+1,
so the exploded relation is O(total characters); the join shuffles on
the variant string (AQE splits hot variants — short common strings);
the final Levenshtein verify runs only on candidate pairs. Both the
variant generator (substring arithmetic) and the verifier (classic
Levenshtein, integer) are engine-portable, so the DuckDB oracle
replays the exact pair set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column) -> Column:
    """Array of the string itself + every single-character deletion.
    ``transform(sequence(...))`` keeps the generator inside codegen —
    no UDF."""
    one_del = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    return F.array_union(F.array(s), one_del)


def fuzzy_self_join(
    names: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """``(id_a, id_b, name_a, name_b, dist)`` — all pairs of distinct
    rows whose names are within ``max_dist`` (≤ 1 guaranteed complete
    by the deletion-neighborhood property; equal names match too).
    id_a < id_b canonicalizes each unordered pair."""
    v = names.select(
        F.col(id_col).alias("vid"),
        F.col(name_col).alias("vname"),
        F.explode(deletion_variants(F.col(name_col))).alias("variant"),
    ).distinct()
    l, r = v.alias("l"), v.alias("r")
    cand = (
        l.join(r, F.col("l.variant") == F.col("r.variant"))
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(
            F.col("l.vid").alias("id_a"),
            F.col("r.vid").alias("id_b"),
            F.col("l.vname").alias("name_a"),
            F.col("r.vname").alias("name_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
