"""Synthesize an sf1-scale fixture by replicating the driver's sf0.1
tables 10x — SCALING experiment input ONLY (registered queries always
run against the driver's /root/testdata fixtures; this exists so
SCALING.md can carry an empirical 100x->1000x row, VERDICT r2 item 10).

Replication preserves join semantics and per-key data distributions:

- fact/dim keys shift per replica r (orderkey +r*10M, custkey/user_id
  +r*10k, partkey/suppkey +r*1M, doc_id/vec_id/event_id offset) so
  every foreign-key join matches exactly one replica's parent rows and
  per-user/per-order group sizes stay IDENTICAL to sf0.1 — group count
  scales, group width doesn't, which is how real growth behaves.
- document text gets a per-replica token suffix (every word w -> w<r>),
  so the shingle vocabulary scales with the corpus and per-shingle df
  stays sf0.1-sized. Without it, replicas are exact near-dups of each
  other and the dedup pair stream grows quadratically in the replica
  count — a property of the cloned corpus, not of the operators.
- nation/region are dimensions — copied once, unreplicated.

Usage: python tools/make_scale_fixture.py [src_sf_dir] [dst_dir] [reps]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_scaling/sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key-shift expressions per table: {col: shift_per_replica}
SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000, "c_nationkey": 0},
    "supplier": {"s_suppkey": 1_000_000, "s_nationkey": 0},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "embeddings": {"vec_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
}
DIMS = ["nation", "region"]


def replicate(con: duckdb.DuckDBPyConnection, table: str) -> None:
    cols = [
        r[0]
        for r in con.execute(
            f"SELECT column_name FROM (DESCRIBE SELECT * FROM "
            f"'{SRC}/{table}.parquet')"
        ).fetchall()
    ]
    shifts = SHIFTS[table]
    exprs = []
    for c in cols:
        if c in shifts and shifts[c]:
            exprs.append(f"{c} + r * {shifts[c]} AS {c}")
        elif table == "embeddings" and c == "embedding":
            # per-replica direction jitter (coordinate (vec_id + r) % dim
            # gets +r*3e-3): exact vector clones make every ANN top-k
            # frontier a wall of cosine==1.0 ties that different summation
            # orders break differently — a property of the cloned corpus,
            # not of the operators (real corpora dedup exact clones before
            # ANN). Replica-pair cosine separation is SECOND order in the
            # jitter (1 - O(d^2/2)), so d=3e-3 puts the gaps at ~5e-6 —
            # resolvable by the 1e-8-rel %.7e output format and 10 orders
            # above cross-engine float noise, while replicas stay
            # near-dups (cosine > 0.99999) for every registry threshold.
            exprs.append(
                "CASE WHEN r = 0 THEN embedding ELSE "
                "list_transform(embedding, (x, i) -> CAST(x + CASE WHEN "
                "(i - 1) = ((vec_id + r) % len(embedding)) THEN r * 0.003 "
                "ELSE 0 END AS FLOAT)) END AS embedding"
            )
        elif table == "documents" and c == "text":
            # per-replica token suffix keeps shingle df scale-invariant
            exprs.append(
                "CASE WHEN r = 0 THEN text ELSE "
                "regexp_replace(text, '([a-z0-9]+)', "
                "'\\1' || r::VARCHAR, 'g') END AS text"
            )
        else:
            exprs.append(c)
    sel = ", ".join(exprs)
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet', "
        f"range({REPS}) t(r)) TO '{DST}/{table}.parquet' "
        f"(FORMAT parquet)"
    )
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/{table}.parquet'"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in SHIFTS:
        replicate(con, t)
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied (dim)")


if __name__ == "__main__":
    main()
