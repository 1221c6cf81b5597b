"""PageRank over relational edges vs a numpy power-iteration control,
and the deletion-neighborhood fuzzy join vs brute-force edit distance."""

import numpy as np
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.fuzzy import fuzzy_self_join
from mahout_samsara_book_spark.operators.graph import (
    pagerank,
    transition_edges,
)


def test_transition_edges_counts(spark):
    rows = [
        (1, 10, 1, "a"),
        (2, 10, 2, "b"),
        (3, 10, 3, "a"),
        (4, 20, 1, "a"),
        (5, 20, 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in transition_edges(ev).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def _np_pagerank(edges, d, iters):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    P = np.zeros((n, n))
    for s, t, w in edges:
        P[idx[t], idx[s]] = w / out_w[s]
    dangling = np.array([v not in out_w for v in nodes], dtype=float)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = float(r @ dangling)
        r = (1 - d) / n + d * (P @ r + dm / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_control(spark):
    edges = [
        ("a", "b", 3),
        ("b", "c", 2),
        ("c", "a", 1),
        ("a", "c", 1),
        ("c", "d", 1),  # d is dangling
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["pr"] for r in pagerank(df, 0.85, 8).collect()}
    want = _np_pagerank(edges, 0.85, 8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # probability mass is conserved by the dangling redistribution
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_fuzzy_join_complete_for_distance_one(spark):
    names = ["widget", "widgets", "gadget", "wídget", "bolt", "bol"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join(df).collect()
    }
    # brute-force control
    import itertools

    def lev(a, b):
        m = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        m[:, 0] = range(len(a) + 1)
        m[0, :] = range(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i, j] = min(
                    m[i - 1, j] + 1,
                    m[i, j - 1] + 1,
                    m[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return int(m[-1, -1])

    want = {
        (i, j): lev(names[i], names[j])
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 1
    }
    assert got == want
    assert (0, 1) in got and (4, 5) in got  # widget/widgets, bolt/bol


def test_fuzzy_join_matches_equal_names(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same")], "id long, name string"
    )
    out = fuzzy_self_join(df).collect()
    assert len(out) == 1 and out[0]["dist"] == 0
