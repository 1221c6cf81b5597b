"""SequenceFile legacy ingest (A23) and IVF similarity search."""

import numpy as np
import pytest

from mahout_samsara_book_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_centers,
    ivf_topk,
)
from mahout_samsara_book_spark.sources.legacy import (
    read_df_counts_sequence_file,
    read_dictionary_sequence_file,
    write_df_counts_sequence_file,
    write_dictionary_sequence_file,
)


def test_sequence_file_roundtrip(spark, tmp_path_factory):
    dic = spark.createDataFrame(
        [("alpha", 0), ("beta", 1), ("gamma", 2)], "term string, index long"
    )
    dfc = spark.createDataFrame(
        [(-1, 100), (0, 10), (1, 7), (2, 3)], "index long, df long"
    )
    p1 = str(tmp_path_factory.mktemp("seq")) + "/dict"
    p2 = str(tmp_path_factory.mktemp("seq")) + "/dfc"
    write_dictionary_sequence_file(dic, p1)
    write_df_counts_sequence_file(dfc, p2)
    got_dic = read_dictionary_sequence_file(spark, p1).toPandas()
    got_dfc = read_df_counts_sequence_file(spark, p2).toPandas()
    assert sorted(map(tuple, got_dic.to_numpy())) == [
        ("alpha", 0),
        ("beta", 1),
        ("gamma", 2),
    ]
    assert sorted(map(tuple, got_dfc.to_numpy())) == [
        (-1, 100),
        (0, 10),
        (1, 7),
        (2, 3),
    ]


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_centers_deterministic(embeddings):
    c1 = ivf_centers(embeddings, n_centers=8, seed=9).toPandas()
    c2 = ivf_centers(embeddings, n_centers=8, seed=9).toPandas()
    assert list(c1.cid) == list(range(8))
    m1 = np.array(c1.sort_values("cid").center.tolist())
    m2 = np.array(c2.sort_values("cid").center.tolist())
    assert np.array_equal(m1, m2)


def test_ivf_assign_partitions_all(embeddings):
    centers = ivf_centers(embeddings, n_centers=8, seed=9)
    assign = ivf_assign(embeddings, centers).toPandas()
    assert len(assign) == embeddings.count()
    assert assign.vec_id.is_unique
    assert set(assign.cid) <= set(range(8))
    # a centroid's own source vector must map to itself (distance 0)
    cpdf = centers.toPandas()
    emb = embeddings.toPandas().set_index("vec_id")
    for _, row in cpdf.iterrows():
        src = [
            vid
            for vid, e in emb.embedding.items()
            if np.array_equal(np.array(e, dtype=np.float64), np.array(row.center))
        ]
        for vid in src:
            assert int(assign.set_index("vec_id").loc[vid, "cid"]) == int(row.cid)


def test_ivf_topk_recall(embeddings):
    exact = cosine_topk(embeddings, k=1).toPandas()
    approx = ivf_topk(embeddings, k=1, n_centers=8, nprobe=3, seed=9).toPandas()
    merged = exact.merge(approx, on="vec_id", suffixes=("_e", "_a"))
    recall = (merged.neighbor_e == merged.neighbor_a).mean()
    # 3 of 8 coarse cells probed; random-sample centroids on near-orthogonal
    # data — recall well above the 3/8 floor signals the index works
    assert recall > 0.45
    assert (merged.cosine_a <= merged.cosine_e + 1e-12).all()


def test_kmeans_lloyd_invariants(spark):
    import numpy as np

    from mahout_samsara_book_spark.operators.similarity import kmeans_lloyd

    rng = np.random.default_rng(5)
    # two well-separated blobs
    pts = np.vstack(
        [rng.normal(0, 0.1, (40, 4)), rng.normal(5, 0.1, (40, 4))]
    ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_lloyd(emb, iters=3, n_centers=2, seed=9).collect()
    sizes = {r["cid"]: r["n_members"] for r in out}
    assert sum(sizes.values()) == 80 and len(sizes) == 2
    # each centroid sits inside one blob (coordinates near 0 or near 5)
    cents = {}
    for r in out:
        cents.setdefault(r["cid"], {})[r["pos"]] = r["c"]
    for cid, cs in cents.items():
        mean0 = sum(cs.values()) / len(cs)
        assert abs(mean0) < 0.5 or abs(mean0 - 5) < 0.5
