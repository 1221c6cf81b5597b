"""C10 reproduction gates (MThreadSuite.scala:20-52, MMul.scala:21-55):
parallel-vs-serial equivalence norm < 1e-5 on the reference's exact
shapes, balanced split properties."""

import numpy as np

from mahout_samsara_book_spark.kernels.incore import uniform_view
from mahout_samsara_book_spark.kernels.mthread import create_splits, mmul_par


def test_create_splits_balanced():
    # MMul.scala createSplits: contiguous, covering, sizes differ by ≤1
    for n, k in [(10, 3), (5000, 16), (3, 7), (1, 1)]:
        sp = create_splits(n, k)
        assert sp[0][0] == 0 and sp[-1][1] == n
        assert all(a1 == b0 for (_, a1), (b0, _) in zip(sp, sp[1:]))
        sizes = [b - a for a, b in sp]
        assert max(sizes) - min(sizes) <= 1


def test_mmul_par_equivalence_gate():
    # the reference's exact benchmark shapes, its < 1e-5 Frobenius gate
    a = uniform_view(5000, 350, 1234)
    b = uniform_view(350, 300, 1235)
    control = a @ b
    par = mmul_par(a, b, n_threads=8)
    assert float(np.linalg.norm(control - par)) < 1e-5


def test_mmul_par_shapes_and_errors():
    a = uniform_view(7, 3, 1)
    b = uniform_view(3, 2, 2)
    assert np.allclose(mmul_par(a, b, n_threads=32), a @ b)  # k > nrow
    try:
        mmul_par(a, a)
        raise AssertionError("expected shape mismatch")
    except ValueError:
        pass
