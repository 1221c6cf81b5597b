"""SURVEY §2B line-by-line: every in-core matrix/vector operator the
reference exercises, pinned to its numpy/scipy equivalent — the engine's
kernel layer IS numpy (inside block closures and on the driver), so this
file is the checkable parity evidence for B1-B16.

Reference use-sites cited per case (see SURVEY.md §2B for the table).
"""

import numpy as np
import pytest

from mahout_samsara_book_spark.kernels.incore import (
    dist,
    gaussian_view,
    solve,
    symmetric_uniform_view,
    uniform_view,
)


@pytest.fixture()
def mx():
    return symmetric_uniform_view(5, 4, 11)


def test_b1_matmul_matvec_dot(mx):
    # MMul.scala:46, BFGS.scala:34,56 — mxA %*% mxB, mx %*% vec, dot
    b = uniform_view(4, 3, 12)
    v = gaussian_view(4, 1, 13)[:, 0]
    assert (mx @ b).shape == (5, 3)
    assert (mx @ v).shape == (5,)
    assert np.isclose(v @ v, float(np.sum(v * v)))


def test_b2_cross_outer():
    # BFGS.scala:54,56 — a cross b (outer product)
    a, b = np.array([1.0, 2.0]), np.array([3.0, 4.0, 5.0])
    assert np.allclose(np.outer(a, b), [[3, 4, 5], [6, 8, 10]])


def test_b3_solve_inverse(mx):
    # LinearRegression.scala:33,80 — solve(A, b) / solve(A)
    a = mx.T @ mx + np.eye(4)
    b = gaussian_view(4, 1, 14)[:, 0]
    assert np.allclose(a @ solve(a, b), b)
    assert np.allclose(solve(a) @ a, np.eye(4), atol=1e-10)


def test_b4_eye_diagv_diagonal_view():
    # BFGS.scala:26,55; LinearRegression.scala:27,80 — eye, diagv,
    # in-place diagonal update (mxA.diagv += lambda)
    a = uniform_view(3, 3, 15).copy()
    d0 = a.copy()
    a[np.diag_indices_from(a)] += 0.5  # the ridge pattern
    assert np.allclose(np.diag(a), np.diag(d0) + 0.5)
    assert np.allclose(np.diag(np.array([1.0, 2.0])), [[1, 0], [0, 2]])
    assert np.allclose(np.eye(2), [[1, 0], [0, 1]])


def test_b5_constructors_like_sparse():
    # dense/dvec/DenseMatrix/SparseRowMatrix/like — MyAppSuite.scala:78,
    # TWCNB.scala:68, MMul.scala:37-39
    dense = np.array([[1.0, 2.0], [3.0, 4.0]])
    assert np.zeros_like(dense).shape == dense.shape  # mx.like(r,c)
    # SparseRowMatrix(r,c) with a single random-access nonzero — the
    # repo's own numpy-only CSR (kernels/sparse.py), not scipy
    from mahout_samsara_book_spark.kernels.sparse import CsrMatrix

    sm = CsrMatrix.from_coo(
        np.array([0]), np.array([1]), np.array([5.0]), (2, 3)
    )
    assert sm.nnz == 1 and sm.to_dense()[0, 1] == 5.0
    assert sm.shape == (2, 3)


def test_b6_views_seeded():
    # Matrices.uniformView/symmetricUniformView/gaussianView —
    # TWCNBSuite.scala:36,42; identical for identical seeds, bounded
    assert np.array_equal(uniform_view(4, 4, 1), uniform_view(4, 4, 1))
    u = uniform_view(100, 10, 2)
    su = symmetric_uniform_view(100, 10, 2)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert su.min() >= -1.0 and su.max() < 1.0


def test_b7_functional_assignment(mx):
    # mx ::= {(r,c,v) => expr}, vec := sqrt _ — TWCNB.scala:111,126
    a = np.abs(mx.copy()) + 1.0
    r, c = np.indices(a.shape)
    a2 = np.log(a / (r + c + 1))  # cell-wise with index access
    assert a2.shape == a.shape
    v = np.sqrt(np.abs(mx[0]))  # vec := sqrt _
    assert np.all(v >= 0)


def test_b8_elementwise_algebra(mx):
    # += -= *= /= ^= scalar broadcast — TWCNB.scala:117, BFGS.scala:41
    a = mx.copy()
    a += 2.0
    a /= 4.0
    a **= 2  # ^= 2
    assert np.allclose(a, ((mx + 2.0) / 4.0) ** 2)


def test_b9_norms_sum(mx):
    # norm / norm(1) / norm(2), sum — BFGS.scala:48, MyAppSuite.scala:86
    v = mx[0]
    assert np.isclose(np.linalg.norm(mx), np.sqrt(np.sum(mx * mx)))
    assert np.isclose(np.abs(v).sum(), np.linalg.norm(v, 1))
    assert np.isclose(float(np.sum(mx)), mx.sum())


def test_b10_slicing_views_and_mutation(mx):
    # mx(r1 until r2, ::), mx(::, c), mx(i,::) := vec, mx(::,0) = 1 —
    # MMul.scala:46,51, BahmaniSketch.scala:117-119, TWCNB.scala:94
    a = mx.copy()
    assert a[1:3, :].shape == (2, 4)
    a[2, :] = np.arange(4.0)  # row assignment through view
    assert np.allclose(a[2], [0, 1, 2, 3])
    a[:, 0] = 1.0  # column fill
    assert np.all(a[:, 0] == 1.0)


def test_b11_rbind_cbind(mx):
    # TWCNB.scala:81, BahmaniSketch.scala:24,91 — vstack/hstack
    assert np.vstack([mx, mx]).shape == (10, 4)
    assert np.hstack([mx, mx]).shape == (5, 8)


def test_b12_dist_pairwise(mx):
    # dist(mxC) — BahmaniSketch.scala:122 — pairwise SQUARED distances
    d = dist(mx)
    brute = ((mx[:, None, :] - mx[None, :, :]) ** 2).sum(-1)
    assert np.allclose(d, brute, atol=1e-10)


def test_b13_marginal_sums(mx):
    # rowSums/colSums — TWCNB.scala:110, MyAppSuite.scala:191
    assert np.allclose(mx.sum(axis=1), [row.sum() for row in mx])
    assert np.allclose(mx.sum(axis=0), [mx[:, j].sum() for j in range(4)])


def test_b14_iteration_sparse_aware():
    # for (row <- mxA) with row.index; getNumNondefaultElements —
    # BahmaniSketch.scala:124-149, TWCNB.scala:59-63
    a = np.array([[0.0, 1.0], [0.0, 0.0], [2.0, 3.0]])
    nnz_per_row = np.count_nonzero(a, axis=1)
    assert list(nnz_per_row) == [1, 0, 2]
    nonempty = a[nnz_per_row > 0]  # the TWCNB empty-row strip
    assert nonempty.shape == (2, 2)
    for i, row in enumerate(a):  # row cursor with index
        assert row.shape == (2,) and i in (0, 1, 2)


def test_b15_cloned_isolation(mx):
    # mx.cloned — TWCNBSuite.scala:36,42 — defensive copy
    a = mx.copy()
    b = a.copy()
    b[0, 0] = 999.0
    assert a[0, 0] != 999.0


def test_b16_cellwise_scalar_funcs(mx):
    # log/abs/sqrt cell-wise — TWCNB.scala:126, BahmaniSketch.scala:134
    p = np.abs(mx) + 0.1
    assert np.allclose(np.exp(np.log(p)), p)
    assert np.allclose(np.sqrt(p) ** 2, p)
