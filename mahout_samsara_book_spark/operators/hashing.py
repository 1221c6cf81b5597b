"""Portable deterministic hashing shared by the dedup / similarity /
fingerprint operators (SURVEY §7 M5 north-star extensions).

The correctness oracle runs in DuckDB, so every hash must be computable
bit-identically in BOTH engines from ANSI-ish SQL. The scheme:

    h60(s) = first 15 hex chars of md5(s) as an integer  ∈ [0, 2^60)
    h31(s) = h60(s) mod P31,  P31 = 2^31 − 1 (Mersenne prime)

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to long
- DuckDB: ``('0x' || substring(md5(s), 1, 15))::BIGINT``

Universal-hash family for MinHash: ``h_i(x) = (a_i·x + b_i) mod P31``
with (a_i, b_i) drawn from a seeded PRNG — the same literals are baked
into both the Spark plan and the generated oracle SQL. Products stay
below 2^62, so everything fits signed 64-bit in both engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1


def h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def h31(col: Column) -> Column:
    return h60(col) % F.lit(P31)


def h31_sql(expr: str) -> str:
    return f"({h60_sql(expr)} % {P31})"


def hash_family(k: int, seed: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs, a ∈ [1, P31), b ∈ [0, P31)."""
    rng = random.Random(seed)
    return [(rng.randrange(1, P31), rng.randrange(0, P31)) for _ in range(k)]


def affine(col: Column, a: int, b: int) -> Column:
    return (F.lit(a) * col + F.lit(b)) % F.lit(P31)


def affine_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * {expr} + {b}) % {P31})"
