"""Tests for the round-3 LLM-curation operators: decontamination,
domain mixture sampling, repetition stats, heavy hitters."""

import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.functions.text_analysis import (
    repetition_stats,
)
from mahout_samsara_book_spark.operators.selection import (
    decontaminate,
    domain_mix_sample,
)
from mahout_samsara_book_spark.operators.sketches import heavy_hitters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_crafted(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a"),          # all-dup: 4 tokens, 1 uniq; bigram "a a" ×3
            (2, "a b c d"),          # no dup: 3 distinct bigrams
            (3, "x y x y x"),        # bigrams: xy yx xy yx → top 2/4
            (4, "solo"),             # 1 token → no bigrams
        ],
    )
    got = {
        r["doc_id"]: r
        for r in repetition_stats(df).collect()
    }
    assert got[1]["n_tok"] == 4
    assert got[1]["dup_token_frac"] == pytest.approx(0.75)
    assert got[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert got[2]["dup_token_frac"] == pytest.approx(0.0)
    assert got[2]["top_bigram_frac"] == pytest.approx(1.0 / 3.0)
    assert got[3]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[4]["n_tok"] == 1
    assert got[4]["top_bigram_frac"] == 0.0


def test_heavy_hitters_exact(spark):
    df = _docs(
        spark,
        [(1, "apple apple banana"), (2, "apple banana cherry"), (3, "date")],
    )
    rows = heavy_hitters(df, k=3).collect()
    assert [(r["term"], r["n"]) for r in rows] == [
        ("apple", 3),
        ("banana", 2),
        ("cherry", 1),  # tie with date → term ASC wins
    ]


def test_decontaminate_flags_overlap(spark):
    eval_df = _docs(spark, [(100, "the quick brown fox jumps over it")])
    train = _docs(
        spark,
        [
            # contains eval 5-gram "the quick brown fox jumps"
            (1, "prefix words the quick brown fox jumps suffix"),
            # same vocabulary, different order: no shared 5-gram
            (2, "fox brown quick the jumps over it none"),
            (3, "completely unrelated text about sparks and rows here"),
        ],
    )
    got = {r["doc_id"]: r for r in decontaminate(train, eval_df, n=5).collect()}
    assert got[1]["contaminated"] and got[1]["n_hits"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert not got[3]["contaminated"]
    assert set(got) == {1, 2, 3}  # every train doc present


def test_domain_mix_deterministic_and_bounded(spark):
    rows = [(i, f"text {i}", ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = domain_mix_sample(
        df, "dom", {"a": 0.7, "b": 0.3}, sample_frac=0.4, seed=1
    )
    got1 = sorted(r["doc_id"] for r in out.collect())
    got2 = sorted(
        r["doc_id"]
        for r in domain_mix_sample(
            df, "dom", {"a": 0.7, "b": 0.3}, sample_frac=0.4, seed=1
        ).collect()
    )
    assert got1 == got2  # replayable
    by_dom = (
        df.filter(F.col("doc_id").isin(got1))
        .groupBy("dom")
        .count()
        .collect()
    )
    counts = {r["dom"]: r["count"] for r in by_dom}
    assert "c" not in counts  # weight 0 → dropped
    # targets: 0.7*0.4*300 = 84 from a, 0.3*0.4*300 = 36 from b (± hash noise)
    assert 60 <= counts["a"] <= 100
    assert 20 <= counts["b"] <= 55
    # never oversample beyond the stratum
    assert counts["a"] <= 100 and counts["b"] <= 100


def test_domain_mix_takes_whole_short_domain(spark):
    # domain "rare" has 5 rows but its target is 0.9*0.5*105 ≈ 47 →
    # rate caps at 1.0 and ALL rare rows are kept
    rows = [(i, "t", "big") for i in range(100)] + [
        (100 + i, "t", "rare") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = domain_mix_sample(df, "dom", {"rare": 0.9, "big": 0.1}, 0.5, seed=2)
    rare = [r for r in out.collect() if r["dom"] == "rare"]
    assert len(rare) == 5


def test_pq_encode_geometry(spark):
    import numpy as np

    from mahout_samsara_book_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=64).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_codebooks(emb, m=8, k=4, seed=1).collect()
    assert len(books) == 32  # M×K codewords
    assert all(len(r["sub"]) == 8 for r in books)
    enc = pq_encode(emb, m=8, k=4, seed=1).collect()
    # exactly one code per (vector, subspace), codes within range
    assert len(enc) == 40 * 8
    assert all(0 <= r["code"] < 4 and r["d2"] >= 0.0 for r in enc)
    # a sampled codebook row encodes ITSELF with d2 == 0 in every subspace
    sampled_ids = {
        r["vec_id"]
        for r in emb.collect()
    }
    zero_docs = {
        r["vec_id"]
        for r in enc
        if r["d2"] == 0.0
    }
    assert zero_docs  # the k sampled rows hit their own codewords
    assert zero_docs <= sampled_ids


def test_ivfpq_ranks_are_dense_topk(spark):
    import numpy as np

    from mahout_samsara_book_spark.operators.similarity import ann_ivfpq_topk

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=64).tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_ivfpq_topk(emb, topk=3, n_centers=8, nprobe=2, pq_k=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))  # dense 1..k
        assert len(rs) <= 3
        # ad2 non-decreasing with rank
        srt = sorted(rs, key=lambda r: r["rank"])
        assert all(
            srt[i]["ad2"] <= srt[i + 1]["ad2"] + 1e-12
            for i in range(len(srt) - 1)
        )
        assert all(r["neighbor"] != q for r in rs)


def test_canonical_by_quality_picks_best(spark):
    from mahout_samsara_book_spark.operators.pipeline import (
        canonical_by_quality,
    )

    # two near-identical docs (LSH pair) with different quality: the
    # longer, cleaner one must win regardless of id order
    good = "the quick brown fox jumps over the lazy dog and runs far away"
    near = good + " x"
    docs = spark.createDataFrame(
        [(5, near), (9, good), (100, "zzz qqq")],
        "doc_id long, text string",
    )
    out = canonical_by_quality(docs, n=3, k=8, bands=4, seed=7, threshold=0.5)
    rows = out.collect()
    # only the near-dup pair forms a cluster; one canonical row
    assert len(rows) == 1
    [r] = rows
    assert r["cluster"] == 5  # cluster label = min member id
    assert r["doc_id"] in (5, 9)
