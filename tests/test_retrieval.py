"""BM25 retrieval: hand-computed scores on a tiny corpus, and the
scale-shape contracts (bounded candidate stream, TakeOrdered top-m for
the weighted sample)."""

import math

from pyspark.sql import functions as F

from mahout_samsara_book_spark.functions.text import bm25_topk


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    rows = [
        (1, "spark spark hash join"),
        (2, "hash table scan"),
        (3, "window filter scan scan"),
        (4, "merge sort run"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(
        docs, [("q1", ["spark", "hash"])], topk=4
    ).collect()
    n, avgdl = 4, (4 + 3 + 4 + 3) / 4
    exp = {
        1: _bm25(2, 1, n, 4, avgdl) + _bm25(1, 2, n, 4, avgdl),
        2: _bm25(1, 2, n, 3, avgdl),
    }
    got = {r.doc_id: r.score for r in out}
    assert set(got) == set(exp)  # docs 3/4 match no term
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-12
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[1] == 1 and ranks[2] == 2  # doc 1 double-matches


def test_bm25_partial_match_scores_not_null(spark):
    # a doc matching only ONE of a query's terms must still score
    # (the fixed-order fold coalesces missing terms to 0, it doesn't
    # NULL the whole sum)
    docs = spark.createDataFrame(
        [(1, "spark only here"), (2, "hash alone")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, [("q", ["spark", "hash"])], topk=5).collect()
    assert len(out) == 2
    assert all(r.score is not None for r in out)


def test_weighted_sample_is_take_ordered(spark):
    """The global top-m must plan as TakeOrderedAndProject (bounded
    per-partition heaps), never a single-partition sort window."""
    import __spark_entry__
    import entry_m5

    __spark_entry__.queries()  # wires entry_m5's sci helpers
    df = entry_m5.q_sel_weighted_sample(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    rows = df.collect()
    assert len(rows) == min(entry_m5.WS_M, n_docs)
    # ranks are 1..m and keys ascend with rank
    ks = [float(r.key) for r in sorted(rows, key=lambda r: r.rank)]
    assert ks == sorted(ks)


def test_bm25_term_shared_across_queries(spark):
    """The broadcast (term → query) map fans one term's postings to
    every query containing it — a doc matching 'spark' must score in
    BOTH queries, with equal scores where the query folds see the same
    matched set."""
    docs = spark.createDataFrame(
        [(1, "spark runs fast"), (2, "hash table"), (3, "sort merge")],
        "doc_id long, text string",
    )
    out = bm25_topk(
        docs, [("qa", ["spark"]), ("qb", ["spark", "hash"])], topk=5
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score
    assert set(by_q["qa"]) == {1}
    assert set(by_q["qb"]) == {1, 2}
    # doc 1 matches only 'spark' in both queries -> identical score
    assert abs(by_q["qa"][1] - by_q["qb"][1]) < 1e-15


def test_bpe_merges_hand_computed(spark):
    """Tiny corpus with a known merge sequence: 'b c' dominates round 1
    (3 occurrences vs 2 for 'a b'), then 'a bc' (the merged token
    re-pairs) wins round 2."""
    from mahout_samsara_book_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "x b c y")],
        "doc_id long, text string",
    )
    rules = {
        r.merge_rank: (r.tok_a, r.tok_b, r.merged, r.n_pair)
        for r in bpe_merges(docs, k=2).collect()
    }
    assert rules[1] == ("b", "c", "bc", 3)
    # after merging: 'a bc d' / 'a bc' / 'x bc y' -> 'a bc' appears twice
    assert rules[2] == ("a", "bc", "abc", 2)


def test_bpe_merges_self_repeat_contract(spark):
    """The documented separator-consuming semantics, pinned exactly:
    in 'a a a a' the ('a','a') replace consumes the middle separator,
    so the rewritten state is 'aa a a' (NOT 'aa aa') — and round 2's
    (n DESC, a, b) argmax over {(aa,a): 1, (a,a): 1} is the lexical
    winner ('a','a'). The oracle replays the identical sequence."""
    from mahout_samsara_book_spark.functions.text import bpe_merges

    docs = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    rules = [
        (r.tok_a, r.tok_b, r.n_pair)
        for r in bpe_merges(docs, k=2).collect()
    ]
    assert rules[0] == ("a", "a", 3)  # counted BEFORE merging
    assert rules[1] == ("a", "a", 1)  # 'aa a a': lexical tie-winner


def test_ivf_persisted_matches_in_session(spark, tmp_path):
    """The persisted index must reproduce the in-session build exactly:
    same centers, same inverted lists, same top-k."""
    from mahout_samsara_book_spark.operators.similarity import (
        ivf_persist,
        ivf_topk,
        ivf_topk_persisted,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfidx")
    ivf_persist(emb, path, n_centers="auto", seed=9)
    a = {
        (r.vec_id, r.rank): r.neighbor
        for r in ivf_topk_persisted(emb, path, k=3, nprobe=2).collect()
    }
    b = {
        (r.vec_id, r.rank): r.neighbor
        for r in ivf_topk(emb, k=3, n_centers="auto", nprobe=2, seed=9).collect()
    }
    assert a == b and len(a) > 0


def test_bm25_empty_queries_and_empty_corpus(spark):
    """Edge guards: an empty query set or an empty corpus returns an
    empty (query_id, doc_id, score, rank) frame instead of raising
    (avgdl would be NULL, isin([]) would break the postings filter)."""
    docs = spark.createDataFrame(
        [(1, "spark hash")], "doc_id long, text string"
    )
    for out in (
        bm25_topk(docs, []),
        bm25_topk(docs, [("q", [])]),
        bm25_topk(docs.limit(0), [("q", ["spark"])]),
    ):
        assert out.columns == ["query_id", "doc_id", "score", "rank"]
        assert out.count() == 0


def test_bm25_relational_fold_parity_200_terms(spark):
    """A 200-term query set dispatches to the relational HOF fold
    (expression-tree size O(1) in vocabulary); its scores must be
    bit-identical to the literal superset fold on the same corpus —
    both sum the same present-term values in sorted-term order."""
    rows = [
        (i, " ".join(f"t{(i * 7 + j * 3) % 220}" for j in range(30)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = [f"t{i}" for i in range(200)]
    queries = [
        (f"q{i}", terms[i * 40 : (i + 1) * 40]) for i in range(5)
    ]
    kw = dict(topk=7)
    rel = bm25_topk(docs, queries, literal_fold_max_terms=64, **kw)
    lit = bm25_topk(docs, queries, literal_fold_max_terms=10**9, **kw)
    # the default dispatch threshold really routes 200 terms to the
    # HOF path: the literal fold would carry one conditional sum per
    # term in the aggregate expressions
    assert "aggregate(" in rel._jdf.queryExecution().analyzed().toString().lower()
    a = {(r.query_id, r.doc_id): (r.score, r.rank) for r in rel.collect()}
    b = {(r.query_id, r.doc_id): (r.score, r.rank) for r in lit.collect()}
    assert a == b and len(a) == 5 * 7


def test_bpe_chars_hand_computed(spark):
    """Char-level mode on a corpus with a known merge sequence.
    'the the ten' pre-splits to ' t h e</w> | t h e</w> | t e n</w> '.
    Round 1 pairs: (t,h):2 (h,e</w>):2 (t,e):1 (e,n</w>):1 — tie on 2
    breaks lexically to (h, e</w>). State: ' t he</w> | t he</w> |
    t e n</w> '. Round 2: (t,he</w>):2 wins. Barrier pairs must never
    be counted, and no merge may cross a word boundary."""
    from mahout_samsara_book_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "the the ten")], "doc_id long, text string"
    )
    rules = {
        r.merge_rank: (r.tok_a, r.tok_b, r.merged, r.n_pair)
        for r in bpe_merges(docs, k=2, level="char").collect()
    }
    assert rules[1] == ("h", "e</w>", "he</w>", 2)
    assert rules[2] == ("t", "he</w>", "the</w>", 2)


def test_bpe_chars_barrier_never_merges(spark):
    """A corpus engineered so the most frequent RAW adjacency is the
    cross-word pair: 'a b a b a b' has (a</w>, |) / (|, b</w>) etc.
    dominating — all barrier pairs. The trainer must pick a within-word
    pair or stop; every learned rule's tokens exclude the barrier."""
    from mahout_samsara_book_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "ab ab xy"), (2, "ab xy")], "doc_id long, text string"
    )
    rules = bpe_merges(docs, k=3, level="char").collect()
    assert len(rules) > 0
    for r in rules:
        assert "|" not in (r.tok_a, r.tok_b)
    # (a, b</w>) appears 3 times — the clear round-1 winner
    top = rules[0]
    assert (top.tok_a, top.tok_b, top.n_pair) == ("a", "b</w>", 3)


def test_bm25_fold_dispatch_boundary_in_plan(spark):
    """The literal-vs-HOF fold dispatch must actually flip the physical
    plan at literal_fold_max_terms (VERDICT r9 item 5): below the cap
    the aggregate is a chain of conditional sums (no collect_list); above
    it the plan collects + sorts (term, s) pairs and folds with the
    aggregate HOF."""
    docs = spark.createDataFrame(
        [(1, "spark hash join"), (2, "window scan filter")],
        "doc_id long, text string",
    )
    queries = [("q1", ["spark", "hash"]), ("q2", ["window", "scan"])]

    def plan(**kw):
        return bm25_topk(docs, queries, topk=3, **kw)._jdf.queryExecution().optimizedPlan().toString()

    literal = plan(literal_fold_max_terms=64)
    assert "collect_list" not in literal
    hof = plan(literal_fold_max_terms=2)  # 4 distinct terms > 2
    assert "collect_list" in hof and "array_sort" in hof
    # and the two paths agree bit-for-bit on the same input
    a = sorted(map(tuple, bm25_topk(docs, queries, topk=3, literal_fold_max_terms=64).collect()))
    b = sorted(map(tuple, bm25_topk(docs, queries, topk=3, literal_fold_max_terms=2).collect()))
    assert a == b
