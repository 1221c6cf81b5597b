"""Algorithm gates from BASELINE.md: BFGS L1<1e-7 within 40 iters;
TWCNB-vs-library score agreement norm<1e-6; Bahmani weights sum to 1."""

import numpy as np
import pytest

from mahout_samsara_book_spark.algorithms.bahmani import (
    compute_point_weights,
    d_sample,
)
from mahout_samsara_book_spark.algorithms.bfgs import bfgs, newton_step
from mahout_samsara_book_spark.algorithms.twcnb import (
    twcnb_predict,
    twcnb_score,
    twcnb_train,
)
from mahout_samsara_book_spark.drm.drm import Drm
from mahout_samsara_book_spark.kernels.incore import (
    gaussian_view,
    symmetric_uniform_view,
    uniform_view,
)

# ---------------------------------------------------------------- BFGS


def test_bfgs_paraboloid():
    """F6 fixture: f(x) = (x-c)ᵀ diag(2, .5) (x-c) - 3.5, argmin (3,5),
    start (45,-32), ≤40 iters, L1 < 1e-7 (MyAppSuite.scala:114-133)."""
    c = np.array([3.0, 5.0])
    q = np.diag([2.0, 0.5])

    def f(x):
        d = x - c
        return float(d @ q @ d) - 3.5

    def grad(x):
        return 2.0 * (q @ (x - c))

    x = bfgs(f, grad, np.array([45.0, -32.0]), max_iter=40, epsilon=1e-7)
    assert np.abs(x - c).sum() < 1e-7


def test_bfgs_rosenbrock_ls():
    """Harder surface with a backtracking line search plugged in (the
    line-search slot is the reference's extension point, BFGS.scala:69)."""

    def f(x):
        return float((1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2)

    def grad(x):
        return np.array(
            [
                -2 * (1 - x[0]) - 400 * x[0] * (x[1] - x[0] ** 2),
                200 * (x[1] - x[0] ** 2),
            ]
        )

    def backtrack(fn, x, d):
        a = 1.0
        fx = fn(x)
        while fn(x + a * d) > fx and a > 1e-12:
            a *= 0.5
        return a

    x = bfgs(f, grad, np.array([-1.2, 1.0]), max_iter=200, line_search=backtrack)
    assert np.abs(x - 1.0).sum() < 1e-5


# ---------------------------------------------------------------- TWCNB


@pytest.fixture(scope="module")
def nb_fixture(spark):
    """F1: 50 docs × 100 terms × 4 classes, seeded (TWCNBSuite.scala:29-52)."""
    rng = np.random.Generator(np.random.PCG64(1235))
    labels = rng.integers(0, 4, 50)
    counts = np.floor(uniform_view(50, 100, 1234) * 5.0)
    drm = Drm.from_numpy(spark, counts, num_partitions=2)
    relabeled = drm.map_block(lambda keys, block: (labels[keys], block))
    return labels, counts, relabeled


def test_twcnb_vs_mllib_complement_nb(spark, nb_fixture):
    """Dual-implementation oracle (TWCNBSuite.scala:106-139): our TWCNB θ
    against MLlib NaiveBayes(modelType='complement'); score matrices agree
    with NEGATED sign within norm 1e-6 — the same `+` comparison the
    reference uses against Mahout's ComplementaryNBClassifier."""
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.linalg import Vectors

    labels, counts, relabeled = nb_fixture
    model = twcnb_train(relabeled, alpha=1.0)
    assert model.weights.shape == (100, 4)
    assert list(model.labels) == [0, 1, 2, 3]

    test_counts = np.floor(uniform_view(30, 100, 2345) * 5.0)
    drm_test = Drm.from_numpy(spark, test_counts, num_partitions=2)
    ours = twcnb_score(drm_test, model, normalized=False).collect()

    train_df = spark.createDataFrame(
        [(float(labels[i]), Vectors.dense(counts[i])) for i in range(50)],
        ["label", "features"],
    )
    mllib = NaiveBayes(modelType="complement", smoothing=1.0).fit(train_df)
    theirs = test_counts @ np.array(mllib.theta.toArray()).T

    assert np.linalg.norm(ours + theirs) < 1e-6  # TWCNBSuite.scala:139 gate


def test_twcnb_predict_labels(spark, nb_fixture):
    labels, counts, relabeled = nb_fixture
    model = twcnb_train(relabeled)
    # predictions on the training docs should beat chance comfortably
    drm = Drm.from_numpy(spark, counts, num_partitions=2)
    pred = twcnb_predict(drm, model).orderBy("row_id").toPandas()
    assert set(pred["label"]).issubset({0, 1, 2, 3})
    assert len(pred) == 50


# ---------------------------------------------------------------- Bahmani


@pytest.fixture(scope="module")
def cluster_fixture(spark):
    """F3: 4 true centers × 50 points, 5 dims, seed 12345
    (MyAppSuite.scala:135-157)."""
    true_centers = symmetric_uniform_view(4, 5, 12345) * 30.0
    offsets = gaussian_view(200, 5, 12345)
    pts = np.repeat(true_centers, 50, axis=0) + offsets
    return true_centers, Drm.from_numpy(spark, pts, num_partitions=4)


def test_bahmani_sketch(cluster_fixture):
    true_centers, drm = cluster_fixture
    centers, y = d_sample(drm, sketch_size=30, iterations=5, seed=12345)
    assert y.ncol == 7  # label, d², 5 features (F3 expected Y geometry)
    # sketch size is stochastic around 30 (+1 seed row)
    assert 5 <= centers.shape[0] <= 90
    # every true cluster is represented by a nearby candidate
    from mahout_samsara_book_spark.kernels.incore import dist

    d = dist(true_centers, centers)
    assert d.min(axis=1).max() < 30.0
    # weights: normalized histogram, sums to 1 (BahmaniSketch.scala:172-173)
    w = compute_point_weights(y, centers.shape[0])
    assert np.isclose(w.sum(), 1.0)
    assert np.all(w >= 0)
    y.unpersist()


def test_bahmani_vs_mllib_kmeans_cost(spark, cluster_fixture):
    """Quality gate vs the MLlib twin (SURVEY C8: KMeans initMode
    'k-means||' implements the same Bahmani et al. paper): clustering
    cost using our sketch's best-k centers is within 2× of a fully
    trained MLlib k-means|| run."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.linalg import Vectors

    from mahout_samsara_book_spark.kernels.incore import dist

    from mahout_samsara_book_spark.algorithms.bahmani import reduce_sketch

    true_centers, drm = cluster_fixture
    pts = drm.collect()
    centers, y = d_sample(drm, sketch_size=30, iterations=5, seed=12345)
    y.unpersist()
    # the k-means|| follow-on: weighted k-means on the sketch → k=4
    w = compute_point_weights_from(pts, centers)
    final4 = reduce_sketch(centers, w, k=4, seed=1)
    our_cost = dist(pts, final4).min(axis=1).sum()

    df = spark.createDataFrame(
        [(Vectors.dense(p),) for p in pts], ["features"]
    )
    km = KMeans(k=4, initMode="k-means||", seed=1, maxIter=20).fit(df)
    mllib_cost = km.summary.trainingCost
    assert our_cost < 2.0 * mllib_cost


def compute_point_weights_from(pts, centers):
    from mahout_samsara_book_spark.kernels.incore import dist

    assign = dist(pts, centers).argmin(axis=1)
    w = np.bincount(assign, minlength=centers.shape[0]).astype(float)
    return w / w.sum()


def test_bahmani_deterministic(cluster_fixture):
    _, drm = cluster_fixture
    c1, y1 = d_sample(drm, sketch_size=20, iterations=3, seed=77)
    c2, y2 = d_sample(drm, sketch_size=20, iterations=3, seed=77)
    assert np.allclose(c1, c2)
    assert np.allclose(y1.collect(), y2.collect())
    y1.unpersist()
    y2.unpersist()


def test_power_iteration_matches_eigh():
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectra import power_iteration

    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 16))
    x[:, 0] += 3.0  # plant a dominant direction
    g = x.T @ x
    v = power_iteration(g, iters=25)
    evals, evecs = np.linalg.eigh(g)
    top = evecs[:, -1]
    cos = abs(float(v @ top))
    assert cos > 0.999999
    assert np.isclose(np.linalg.norm(v), 1.0)


def test_power_iteration_fixed_trajectory():
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectra import power_iteration

    g = np.array([[2.0, 1.0], [1.0, 2.0]])
    v = power_iteration(g, iters=1)
    # one step from (1/sqrt2, 1/sqrt2): G v = (3/sqrt2, 3/sqrt2) -> renorm
    assert np.allclose(v, [1 / 2 ** 0.5, 1 / 2 ** 0.5])


def test_leading_component_matches_eigh(spark):
    """Power iteration (8 rounds, all-ones start) recovers the dominant
    eigenvector of XᵀX on a well-separated spectrum, and projections
    equal X @ e."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import (
        leading_component,
    )

    rng = np.random.RandomState(7)
    # strong rank-1 direction + noise -> clear spectral gap
    direction = rng.randn(16)
    x = np.outer(rng.randn(400), direction) + 0.05 * rng.randn(400, 16)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    comp, proj_df = leading_component(emb, dim=16, iters=8)
    comp = np.asarray(comp)
    evals, evecs = np.linalg.eigh(x.T @ x)
    top = evecs[:, -1]
    assert abs(float(comp @ top)) > 1 - 1e-9  # same direction (±)
    proj = {r.vec_id: r.proj for r in proj_df.collect()}
    want = x @ comp
    got = np.array([proj[i] for i in range(400)])
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_leading_components_topk_matches_eigh(spark):
    """Deflated power iteration recovers the top-3 eigenvectors (up to
    sign) on a well-separated spectrum; projections are X @ E."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import (
        leading_components,
    )

    rng = np.random.RandomState(11)
    # three strong orthogonal directions with separated scales
    q, _ = np.linalg.qr(rng.randn(16, 3))
    x = (
        rng.randn(500, 3) * np.array([10.0, 6.0, 3.0])
    ) @ q.T + 0.01 * rng.randn(500, 16)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    comps, proj_df = leading_components(emb, dim=16, k=3, iters=12)
    e = np.array(comps)
    evals, evecs = np.linalg.eigh(x.T @ x)
    for c in range(3):
        top = evecs[:, -1 - c]
        assert abs(float(e[c] @ top)) > 1 - 1e-6, c
    # near-orthogonal: deflation leaves residual mixing that decays
    # with the iteration count ((lambda2/lambda1)^iters), not to zero
    assert abs(float(e[0] @ e[1])) < 1e-4
    assert abs(float(e[1] @ e[2])) < 1e-4
    rows = {r.vec_id: (r.p0, r.p1, r.p2) for r in proj_df.collect()}
    got = np.array([rows[i] for i in range(500)])
    assert np.allclose(got, x @ e.T, rtol=1e-10, atol=1e-10)


def test_item_similarity_llr_hand_computed(spark):
    """LLR of a hand-built 2×2 contingency table, plus the degree cap
    and symmetry contracts."""
    import math

    from mahout_samsara_book_spark.algorithms.cooccurrence import (
        item_similarity_llr,
    )

    # 6 users: A&B co-occur in 3 histories, A alone in 2, B alone in 1
    rows = []
    for u in (1, 2, 3):
        rows += [(u, "A"), (u, "B")]
    for u in (4, 5):
        rows.append((u, "A"))
    rows.append((6, "B"))
    inter = spark.createDataFrame(rows, "user_id long, item_id string")
    out = item_similarity_llr(inter, k=5).collect()
    got = {(r.item_id, r.other): r.llr for r in out}
    assert set(got) == {("A", "B"), ("B", "A")}

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    k11, k12, k21, k22 = 3, 2, 1, 0  # n_users=6, nA=5, nB=4
    want = 2.0 * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(k11 + k12) - xlx(k21 + k22)
        - xlx(k11 + k21) - xlx(k12 + k22)
        + xlx(6)
    )
    assert abs(got[("A", "B")] - want) < 1e-12
    assert got[("A", "B")] == got[("B", "A")]  # symmetric

    # degree cap: a power user's history is truncated to max_prefs,
    # so pair volume is bounded by cap², not degree²
    power = spark.createDataFrame(
        [(1, f"i{j}") for j in range(100)] + [(2, "i0"), (2, "i1")],
        "user_id long, item_id string",
    )
    pairs = item_similarity_llr(power, k=1000, max_prefs=10)
    items_seen = {
        r.item_id for r in pairs.collect()
    }
    # ≤ 10 hash-chosen items from user 1 plus user 2's pair
    assert len(items_seen) <= 12


def test_cross_similarity_llr_hand_computed(spark):
    """Cross-action LLR (A′B): hand-built 2×2 table where the user
    universe spans BOTH capped relations, output ranked only in the
    primary orientation, rectangular history caps honored."""
    import math

    from mahout_samsara_book_spark.algorithms.cooccurrence import (
        cross_similarity_llr,
    )

    # primary (purchases): users 1,2,3 bought A; 4,5 bought C
    primary = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "C"), (5, "C")],
        "user_id long, item_id string",
    )
    # secondary (views): users 1,2 viewed X; 6 viewed X (no purchase);
    # user 3 viewed Y
    secondary = spark.createDataFrame(
        [(1, "X"), (2, "X"), (6, "X"), (3, "Y")],
        "user_id long, item_id string",
    )
    out = cross_similarity_llr(primary, secondary, k=5).collect()
    got = {(r.item_id, r.other): r.llr for r in out}
    # only primary→secondary orientations, only co-occurring pairs
    assert set(got) == {("A", "X"), ("A", "Y")}

    def kln(k, r, c, n):
        return k * math.log(k * n / (r * c)) if k > 0 else 0.0

    # N = |{1..6}| = 6; for (A, X): k11=2 (users 1,2), nA=3, nX=3
    k11, k12, k21, k22 = 2, 1, 1, 2
    want = 2.0 * (
        kln(k11, k11 + k12, k11 + k21, 6)
        + kln(k12, k11 + k12, k12 + k22, 6)
        + kln(k21, k21 + k22, k11 + k21, 6)
        + kln(k22, k21 + k22, k12 + k22, 6)
    )
    assert abs(got[("A", "X")] - want) < 1e-12

    # rectangular caps: a power user's SECONDARY history truncates at
    # max_prefs_secondary while the primary side keeps its own cap
    power_sec = spark.createDataFrame(
        [(1, f"s{j}") for j in range(100)],
        "user_id long, item_id string",
    )
    small_pri = spark.createDataFrame(
        [(1, "P")], "user_id long, item_id string"
    )
    pairs = cross_similarity_llr(
        small_pri, power_sec, k=1000, max_prefs=10,
        max_prefs_secondary=7,
    ).collect()
    assert len(pairs) == 7  # one primary item × capped secondary


def test_ssvd_project_matches_numpy_svd(spark):
    """Randomized SSVD recovers the top-k right singular vectors and
    singular values of a well-separated spectrum (up to sign), with
    orthonormal components and projections equal to X @ V."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import ssvd_project

    rng = np.random.RandomState(11)
    q, _ = np.linalg.qr(rng.randn(16, 3))
    x = (
        rng.randn(500, 3) * np.array([10.0, 6.0, 3.0])
    ) @ q.T + 0.01 * rng.randn(500, 16)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    comps, sigmas, proj_df = ssvd_project(
        emb, dim=16, k=3, oversample=3, iters=8, seed=17
    )
    e = np.array(comps)
    _, s_np, vt = np.linalg.svd(x, full_matrices=False)
    for c in range(3):
        assert abs(float(e[c] @ vt[c])) > 1 - 1e-6, c
        # σ from the quantized gram: 7-digit inputs bound the error
        assert abs(sigmas[c] - s_np[c]) / s_np[c] < 1e-5, c
    # subspace iteration orthonormalizes jointly — tighter than the
    # deflated power iteration's residual mixing
    assert abs(float(e[0] @ e[1])) < 1e-9
    assert abs(float(e[1] @ e[2])) < 1e-9
    rows = {r.vec_id: (r.p0, r.p1, r.p2) for r in proj_df.collect()}
    got = np.array([rows[i] for i in range(500)])
    assert np.allclose(got, x @ e.T, rtol=1e-10, atol=1e-10)


def test_dspca_project_matches_numpy_centered_svd(spark):
    """dSPCA = SSVD of the mean-centered matrix, computed without
    materializing it (bordered gram): components match numpy SVD of
    X - mean (up to sign), projections equal (X - mean) @ V."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import dspca_project

    rng = np.random.RandomState(11)
    q, _ = np.linalg.qr(rng.randn(16, 3))
    x = (
        rng.randn(500, 3) * np.array([10.0, 6.0, 3.0])
    ) @ q.T + 0.01 * rng.randn(500, 16)
    x = x + 5.0  # a strong mean the uncentered SSVD would latch onto
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    comps, sigmas, proj_df = dspca_project(
        emb, dim=16, k=3, oversample=3, iters=8, seed=17
    )
    e = np.array(comps)
    xc = x - x.mean(axis=0)
    _, s_np, vt = np.linalg.svd(xc, full_matrices=False)
    for c in range(3):
        assert abs(float(e[c] @ vt[c])) > 1 - 1e-6, c
        assert abs(sigmas[c] - s_np[c]) / s_np[c] < 1e-4, c
    rows = {r.vec_id: (r.p0, r.p1, r.p2) for r in proj_df.collect()}
    got = np.array([rows[i] for i in range(500)])
    # the engine's mean correction derives from the 7-digit-quantized
    # bordered gram (column sums ~2.5e3 quantized to %.6e → μ·v offset
    # ~1e-6) — compare at the quantization scale, not machine epsilon
    assert np.allclose(got, xc @ e.T, rtol=1e-5, atol=1e-4)


def test_thin_qr_orthonormal_and_reconstructs(spark):
    """Cholesky-QR: R upper-triangular with G = R'R, requested Q
    columns orthonormal, and Q[:, :c] @ R[:c-ish] reconstructing A's
    projection — checked against numpy's QR up to column signs."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import thin_qr

    rng = np.random.RandomState(7)
    x = rng.randn(400, 12)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    r, q_df = thin_qr(emb, dim=12, out_cols=4)
    r = np.array(r)
    # upper-triangular, positive diagonal, R'R == gram (to quantization)
    assert np.allclose(r, np.triu(r))
    assert (np.diag(r) > 0).all()
    assert np.allclose(r.T @ r, x.T @ x, rtol=1e-5, atol=1e-3)
    rows = {v.vec_id: (v.q0, v.q1, v.q2, v.q3) for v in q_df.collect()}
    q = np.array([rows[i] for i in range(400)])
    # orthonormal columns (CholeskyQR precision on a well-conditioned A)
    assert np.allclose(q.T @ q, np.eye(4), atol=1e-6)
    # matches numpy's thin QR up to per-column sign
    qn, _ = np.linalg.qr(x)
    for c in range(4):
        # 7-digit gram quantization bounds per-column agreement ~1e-7
        assert abs(float(q[:, c] @ qn[:, c])) > 1 - 1e-6, c
    # Q @ R reconstructs: q_c . R row span -> x's first columns
    assert np.allclose(q @ r[:4, :], x - (np.eye(400) - q @ q.T) @ x,
                       atol=1e-6)


def test_als_project_near_optimal_rank_k(spark):
    """Full-matrix regularized ALS converges to the rank-k SVD
    subspace: reconstruction ‖A − U·Vᵀ‖_F is within a few percent of
    numpy's optimal rank-k, and U's columns span the top-k left
    singular subspace."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import als_project

    rng = np.random.RandomState(11)
    q, _ = np.linalg.qr(rng.randn(16, 4))
    x = (
        rng.randn(400, 4) * np.array([10.0, 7.0, 5.0, 3.0])
    ) @ q.T + 0.01 * rng.randn(400, 16)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    v, w, u_df = als_project(emb, dim=16, k=4, reg=0.01, iters=6, seed=23)
    v = np.array(v).T   # 16 × 4 (columns)
    rows = {r.vec_id: (r.u0, r.u1, r.u2, r.u3) for r in u_df.collect()}
    u = np.array([rows[i] for i in range(400)])
    # projections really are A @ W
    assert np.allclose(u, x @ np.array(w).T, rtol=1e-9, atol=1e-9)
    # reconstruction within 5% of the optimal rank-4 truncation
    err = np.linalg.norm(x - u @ v.T)
    uu, ss, vvt = np.linalg.svd(x, full_matrices=False)
    opt = np.linalg.norm(x - (uu[:, :4] * ss[:4]) @ vvt[:4])
    assert err < 1.05 * opt + 1e-9, (err, opt)
    # U spans the top-4 left singular subspace (principal angles ~0)
    qu, _ = np.linalg.qr(u)
    overlap = np.linalg.norm(qu.T @ uu[:, :4])
    # ‖Quᵀ·U_svd‖_F = 2 when the 4-dim subspaces coincide
    assert overlap > 1.99, overlap


def test_row_similarity_llr_via_token_role(spark):
    """spark-rowsimilarity shape: docs sharing tokens rank each other;
    a doc with disjoint vocabulary gets no neighbors."""
    from mahout_samsara_book_spark.algorithms.cooccurrence import (
        item_similarity_llr,
    )
    from mahout_samsara_book_spark.functions.text import tokenize
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles partition the join keys"),
            (2, "spark joins shuffle on the partition keys"),
            (3, "violets are blue and roses are red"),
        ],
        "doc_id long, text string",
    )
    inter = docs.select(
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
        "doc_id",
    )
    out = item_similarity_llr(
        inter, k=5, max_prefs=100, user_col="tok", item_col="doc_id"
    ).collect()
    pairs = {(r.doc_id, r.other) for r in out}
    assert (1, 2) in pairs and (2, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_similarity_analysis_composes_indicators(spark):
    """SimilarityAnalysis.cooccurrences signature parity: element 0 is
    the A'A indicator, element i the A'B_i cross indicator, all with
    shared caps/seed."""
    from mahout_samsara_book_spark.algorithms.cooccurrence import (
        cross_similarity_llr,
        item_similarity_llr,
        similarity_analysis,
    )

    primary = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A")],
        "user_id long, item_id string",
    )
    sec = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y")],
        "user_id long, item_id string",
    )
    got = similarity_analysis(primary, [sec], k=5)
    assert len(got) == 2
    want0 = sorted(map(tuple, item_similarity_llr(primary, k=5).collect()))
    want1 = sorted(
        map(tuple, cross_similarity_llr(primary, sec, k=5).collect())
    )
    assert sorted(map(tuple, got[0].collect())) == want0
    assert sorted(map(tuple, got[1].collect())) == want1


def test_decompositions_partitioning_invariant(spark):
    """The 7-digit gram/Ω quantization must absorb partial-sum ORDER
    differences, not just one lucky partitioning: every decomposition
    query is bit-identical under an adversarial session (64 KB splits,
    7 shuffle partitions) vs the default one."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    q = e.queries()
    ns = spark.newSession()
    ns.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    ns.conf.set("spark.sql.shuffle.partitions", "7")
    for name in ["emb_ssvd", "emb_dspca", "emb_qr_thin", "emb_als"]:
        base = sorted(map(tuple, q[name](spark, sf).collect()))
        got = sorted(map(tuple, q[name](ns, sf).collect()))
        assert got == base, name


def test_thin_qr2_recovers_orthonormality_at_high_kappa(spark):
    """CholeskyQR2 (VERDICT r11 item 6): at κ(A) = 1e6 the single
    CholeskyQR pass loses orthonormality at the classical ε·κ² rate
    (~1e-4), and the self-composition recovers it to working
    precision while still reconstructing Q·R = A."""
    import numpy as np

    from mahout_samsara_book_spark.algorithms.spectral import (
        _chol_qr_pass,
        thin_qr2,
    )

    rng = np.random.RandomState(12)
    n, dim = 400, 8
    u, _ = np.linalg.qr(rng.randn(n, dim))
    v, _ = np.linalg.qr(rng.randn(dim, dim))
    s = np.logspace(0, -6, dim)  # kappa = 1e6
    x = u @ np.diag(s) @ v.T
    assert 3e5 < np.linalg.cond(x) < 3e6
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )

    def q_mat(df):
        rows = {r[0]: list(r[1:]) for r in df.collect()}
        return np.array([rows[i] for i in range(n)])

    # single pass (quantization off — isolating the FLOAT breakdown):
    # visibly non-orthonormal at eps*kappa^2
    _, q1_df = _chol_qr_pass(
        emb, dim, dim, "vec_id", "embedding", quantize=False
    )
    q1 = q_mat(q1_df)
    err1 = np.abs(q1.T @ q1 - np.eye(dim)).max()
    assert err1 > 1e-8, f"fixture not kappa-hard enough: {err1}"

    r, q_df = thin_qr2(emb, dim, out_cols=dim)
    q = q_mat(q_df)
    err2 = np.abs(q.T @ q - np.eye(dim)).max()
    assert err2 < 1e-12, err2
    assert err2 < err1 * 1e-3  # the second pass genuinely repaired it
    r = np.array(r)
    assert np.allclose(r, np.triu(r))
    assert (np.diag(r) > 0).all()
    assert np.allclose(q @ r, x, atol=1e-9)
