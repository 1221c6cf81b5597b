"""In-core matrix/vector kernels (SURVEY §2B).

The reference's in-core layer is Mahout's Matrix/Vector algebra; here every
in-core object is a numpy array, both on the driver and inside Arrow-batched
UDF closures. numpy's BLAS already gives the multithreaded in-core matmul the
reference hand-rolls (``myMahoutApp/.../mthread/MMul.scala:21-55``), so there
is no separate threaded kernel.

Deterministic "matrix view" factories mirror Mahout's
``Matrices.uniformView / symmetricUniformView / gaussianView``
(use-sites ``TWCNBSuite.scala:36,42``, ``MyAppSuite.scala:32,145,148``,
``MThreadSuite.scala:26-27``): seeded virtual random matrices. We do not
reproduce Mahout's PRNG bit-for-bit — tests assert statistical/algebraic
properties with tolerances, exactly as the reference's own suites do
(SURVEY §5) — but the factories are pure functions of (rows, cols, seed).
"""

from __future__ import annotations

import numpy as np


def _gen(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


def uniform_view(rows: int, cols: int, seed: int) -> np.ndarray:
    """U[0,1) matrix, deterministic in (rows, cols, seed)."""
    return _gen(seed).random((rows, cols))


def symmetric_uniform_view(rows: int, cols: int, seed: int) -> np.ndarray:
    """U[-1,1) matrix, deterministic in (rows, cols, seed)."""
    return _gen(seed).random((rows, cols)) * 2.0 - 1.0


def gaussian_view(rows: int, cols: int, seed: int) -> np.ndarray:
    """N(0,1) matrix, deterministic in (rows, cols, seed)."""
    return _gen(seed).standard_normal((rows, cols))


def solve(a: np.ndarray, b: np.ndarray | None = None) -> np.ndarray:
    """``solve(A, b)`` / ``solve(A)`` = inverse — LinearRegression.scala:33,80."""
    if b is None:
        return np.linalg.inv(a)
    return np.linalg.solve(a, np.asarray(b, dtype=np.float64))


def dist(m: np.ndarray, n: np.ndarray | None = None) -> np.ndarray:
    """Pairwise *squared* Euclidean distance matrix of rows — the in-core
    ``dist(mxC)`` used by the Bahmani sketch (``BahmaniSketch.scala:122``).

    ``dist(M)[i, j] = ||M[i] - M[j]||^2``; with a second operand,
    ``dist(M, N)[i, j] = ||M[i] - N[j]||^2``. Computed via the expanded
    form with clamping at zero (cancellation can give tiny negatives).
    """
    m = np.asarray(m, dtype=np.float64)
    n2 = m if n is None else np.asarray(n, dtype=np.float64)
    sq_m = np.einsum("ij,ij->i", m, m)
    sq_n = sq_m if n is None else np.einsum("ij,ij->i", n2, n2)
    d = sq_m[:, None] + sq_n[None, :] - 2.0 * (m @ n2.T)
    np.maximum(d, 0.0, out=d)
    return d
