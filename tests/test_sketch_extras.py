"""Count-Min, portable HLL, priority sampling, and the Lloyd IVF
refinement step (round-3 extensions). Each test pins the defining
mathematical property of the sketch, not just shapes — CMS never
undercounts, HLL lands within its theoretical error envelope, priority
sampling is without-replacement and weight-monotone, Lloyd means are
exact conditional means."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_samsara_book_spark.operators.selection import priority_sample
from mahout_samsara_book_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_distinct,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cms_never_undercounts_and_is_tight_for_heavy_terms(spark):
    texts = ["alpha beta gamma"] * 30 + ["delta epsilon"] * 5 + ["zeta"]
    docs = _docs(spark, texts)
    probes = spark.createDataFrame(
        [("alpha",), ("delta",), ("zeta",), ("missing",)], "term string"
    )
    est = {
        r["term"]: r["n_est"]
        for r in cms_estimate(docs, probes, width=64, depth=4).collect()
    }
    exact = {"alpha": 30, "delta": 5, "zeta": 1, "missing": 0}
    for term, true_n in exact.items():
        assert est[term] >= true_n, term  # the CMS one-sided guarantee
    # heavy term over a lightly-loaded sketch: estimate is exact
    assert est["alpha"] == 30


def test_cms_counter_mass_equals_stream_length(spark):
    texts = ["a b c d", "a a b"]
    docs = _docs(spark, texts)
    sk = cms_build(docs, width=32, depth=3)
    per_row = (
        sk.groupBy("r").agg(F.sum("c").alias("s")).orderBy("r").collect()
    )
    # every row of the sketch sees the whole 7-token stream once
    assert [r["s"] for r in per_row] == [7, 7, 7]


def test_hll_exactish_small_and_bounded_large(spark):
    rows = [("small", f"u{i}") for i in range(20)] + [
        ("large", f"v{i}") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {
        r["grp"]: r["n_est"]
        for r in hll_distinct(df, "grp", "val", b=6).collect()
    }
    # m=64 → σ ≈ 1.04/√64 = 13%; linear counting keeps small groups tight
    assert abs(out["small"] - 20) <= 4
    assert abs(out["large"] - 5000) / 5000 < 0.4


def test_priority_sample_without_replacement_and_weight_bias(spark):
    rows = [(i, "g", 1000.0 if i < 3 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = priority_sample(df, "lang", "w", k=10, seed=3).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 10  # without replacement, exact k
    # weight 1000 vs 1: the three heavy rows are ~certain to be drawn
    assert {0, 1, 2} <= set(ids)


def test_priority_sample_deterministic_across_runs(spark):
    rows = [(i, "a" if i % 2 else "b", float(i + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    a = sorted(map(tuple, priority_sample(df, "lang", "w", k=5).collect()))
    b = sorted(map(tuple, priority_sample(df, "lang", "w", k=5).collect()))
    assert a == b


def test_ivf_refine_is_exact_member_mean(spark):
    from mahout_samsara_book_spark.operators.similarity import (
        ivf_assign,
        ivf_centers,
        ivf_refine,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(200, 64))
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    refined = ivf_refine(emb, n_centers=16).collect()
    assign = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(emb, ivf_centers(emb, 16)).collect()
    }
    got = {}
    for r in refined:
        got.setdefault(r["cid"], np.zeros(64))[r["pos"]] = r["c"]
    for cid, center in got.items():
        members = [vecs[i] for i, c in assign.items() if c == cid]
        np.testing.assert_allclose(
            center, np.mean(members, axis=0), rtol=1e-12
        )
    # the refinement must strictly reduce total quantization error
    # vs the sampled centers it warm-starts from (Lloyd monotonicity)
    sampled = {
        r["cid"]: np.array(r["center"])
        for r in ivf_centers(emb, 16).collect()
    }
    err_before = sum(
        np.sum((vecs[i] - sampled[c]) ** 2) for i, c in assign.items()
    )
    err_after = sum(
        np.sum((vecs[i] - got[c]) ** 2) for i, c in assign.items()
    )
    assert err_after < err_before


def test_sample_quantiles_exact_when_small(spark):
    # groups smaller than k: the "sample" is the whole group, so the
    # estimate is the exact order statistic floor((n-1)q)
    from mahout_samsara_book_spark.operators.sketches import sample_quantiles

    rows = [("a", float(v), v) for v in range(100)] + [
        ("b", 5.0, 100), ("b", 1.0, 101), ("b", 9.0, 102)
    ]
    df = spark.createDataFrame(rows, "grp string, value double, key long")
    out = sample_quantiles(
        df, "grp", "value", "key", quantiles=(0.0, 0.5, 1.0), k=256
    )
    got = {(r["grp"], r["q"]): r["est"] for r in out.collect()}
    assert got[("a", 0.0)] == 0.0
    assert got[("a", 0.5)] == 49.0  # floor(99*0.5)=49
    assert got[("a", 1.0)] == 99.0
    assert got[("b", 0.5)] == 5.0


def test_sample_quantiles_bounded_sample(spark):
    # with k=16 over 1000 values the estimate must come from the sample
    # (16 retained rows) and lie within the value range
    from mahout_samsara_book_spark.operators.sketches import sample_quantiles

    rows = [("g", float(v), v) for v in range(1000)]
    df = spark.createDataFrame(rows, "grp string, value double, key long")
    out = sample_quantiles(df, "grp", "value", "key", quantiles=(0.5,), k=16)
    [r] = out.collect()
    assert 0.0 <= r["est"] <= 999.0
    # median of a uniform sample of 16 from U[0,1000): loose 3-sigma band
    assert 150.0 <= r["est"] <= 850.0


def test_kmv_intersect_exact_when_exhausted_and_close_otherwise(spark):
    """Theta-style intersection: when both groups hold fewer than k
    distinct values the sketch IS the set and the estimate must be the
    exact intersection count; with k below the distinct counts the
    estimate must land within the KMV error band of truth."""
    from pyspark.sql import functions as F

    from mahout_samsara_book_spark.operators.sketches import (
        kmv_intersect_distinct,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .alias("a")
        .join(
            ev.select("event_type", "user_id").distinct().alias("b"),
            ["user_id"],
        )
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("grp_a"),
            F.col("b.event_type").alias("grp_b"),
        )
        .count()
        .collect()
    )
    truth = {(r.grp_a, r.grp_b): r["count"] for r in exact}

    # exhausted regime: k far above every distinct count → exact
    big = {
        (r.grp_a, r.grp_b): (r.n_common, r.inter_est)
        for r in kmv_intersect_distinct(
            ev, "event_type", "user_id", k=1_000_000
        ).collect()
    }
    assert set(big) == set(truth)
    for pair, (n_common, est) in big.items():
        assert n_common == truth[pair]
        assert abs(est - truth[pair]) < 1e-6

    # sketch regime: k=256 → within ~3/sqrt(k) relative of truth
    sk = {
        (r.grp_a, r.grp_b): r.inter_est
        for r in kmv_intersect_distinct(
            ev, "event_type", "user_id", k=256
        ).collect()
    }
    for pair, t in truth.items():
        assert abs(sk[pair] - t) / t < 3.0 / (256 ** 0.5) + 0.05, (
            pair,
            sk[pair],
            t,
        )
