"""In-core sparse flavor (B5/B14): CsrMatrix kernels and the sparse
map_block/allreduce_block paths on a wide matrix whose dense form would
be orders of magnitude larger than its nonzeros."""

import numpy as np
import pytest

from mahout_samsara_book_spark.drm.drm import Drm
from mahout_samsara_book_spark.kernels.sparse import CsrMatrix

NCOL = 50_000  # dense block: 200×50k×8 = 80 MB; nnz: 200×4×8 ≈ 6 KB


def _wide_fixture():
    rng = np.random.RandomState(7)
    rows, cols, vals = [], [], []
    for i in range(200):
        for j in rng.choice(NCOL, size=4, replace=False):
            rows.append(i)
            cols.append(int(j))
            vals.append(float(rng.rand() + 0.5))
    return (
        np.array(rows, dtype=np.int64),
        np.array(cols, dtype=np.int64),
        np.array(vals),
    )


def test_csr_kernels_match_dense():
    a = np.array([[0.0, 2.0, 0.0], [1.0, 0.0, 3.0], [0.0, 0.0, 0.0], [4.0, 5.0, 6.0]])
    c = CsrMatrix.from_dense(a)
    assert c.nnz == 6
    assert np.allclose(c.to_dense(), a)
    assert np.allclose(c.row_sums(), a.sum(axis=1))
    assert np.allclose(c.col_sums(), a.sum(axis=0))
    b = np.arange(6, dtype=np.float64).reshape(3, 2)
    assert np.allclose(c.dot_dense(b), a @ b)
    assert np.allclose(c.scale_rows(np.array([1.0, 2.0, 3.0, 0.5])).to_dense(),
                       a * np.array([1.0, 2.0, 3.0, 0.5])[:, None])
    assert np.allclose(c.map_values(np.log1p).to_dense()[a != 0],
                       np.log1p(a)[a != 0])


def test_csr_from_coo_unsorted():
    rows = np.array([2, 0, 2, 1])
    cols = np.array([1, 0, 0, 2])
    vals = np.array([5.0, 1.0, 4.0, 3.0])
    c = CsrMatrix.from_coo(rows, cols, vals, (3, 3))
    expect = np.array([[1.0, 0, 0], [0, 0, 3.0], [4.0, 5.0, 0]])
    assert np.allclose(c.to_dense(), expect)


@pytest.fixture(scope="module")
def wide_drm(spark):
    rows, cols, vals = _wide_fixture()
    coo = spark.createDataFrame(
        [(int(r), int(c), float(v)) for r, c, v in zip(rows, cols, vals)],
        schema="row_id long, pos int, v double",
    ).repartition(4)
    return Drm.from_coo(coo, ncol=NCOL), (rows, cols, vals)


def test_sparse_map_block_row_normalize(wide_drm):
    """TF-IDF shape: L1 row-normalization via the sparse flavor — fn sees
    a CsrMatrix (never a dense 200×50k block) and returns CSR; narrow
    output checked against numpy."""
    d, (rows, cols, vals) = wide_drm

    def norm(keys, block):
        # runs on executors: a wrong flavor must fail the job itself
        if type(block).__name__ != "CsrMatrix":
            raise TypeError(f"expected CsrMatrix, got {type(block)}")
        s = block.row_sums()
        # project to 2 columns: (row_sum, nnz-weighted mean) so collect
        # stays tiny while exercising CSR kernels
        out = np.stack([s, block.dot_dense(np.ones(NCOL)).ravel() / 4.0], axis=1)
        return keys, out

    out = d.map_block(norm, ncol=2, flavor="sparse")
    keys, mat = out.collect_keys_matrix()
    expect_sum = np.bincount(rows, weights=vals, minlength=200)
    order = np.argsort(keys)
    assert np.allclose(mat[order, 0], expect_sum)
    assert np.allclose(mat[order, 1], expect_sum / 4.0)


def test_sparse_allreduce_colsum_subset(wide_drm):
    """Per-corpus colsums (the TWCNB per-class weight shape) via sparse
    allreduce: each partition contributes an O(nnz) partial."""
    d, (rows, cols, vals) = wide_drm
    probe = np.sort(np.unique(cols))[:16]

    def part(keys, block):
        return block.col_sums()[probe]

    got = d.allreduce_block(part, lambda a, b: a + b, flavor="sparse").ravel()
    expect = np.zeros(NCOL)
    np.add.at(expect, cols, vals)
    assert np.allclose(got, expect[probe])


def test_sparse_matches_dense_flavor(spark):
    """Same fn on a small matrix: sparse and dense flavors agree (sparse
    converts fn's CSR arg transparently via to_dense)."""
    a = np.array([[0.0, 2.0, 0.0], [1.0, 0.0, 3.0], [4.0, 5.0, 6.0]])
    d = Drm.from_numpy(spark, a, num_partitions=2)

    def double_dense(keys, block):
        return keys, np.asarray(block * 2.0)

    def double_sparse(keys, block):
        return keys, block.map_values(lambda v: v * 2.0)

    dd = d.map_block(double_dense).collect()
    ds_keys, ds = d.map_block(double_sparse, flavor="sparse").collect_keys_matrix()
    assert np.allclose(dd, 2 * a)
    assert np.allclose(ds[np.argsort(ds_keys)], 2 * a)
