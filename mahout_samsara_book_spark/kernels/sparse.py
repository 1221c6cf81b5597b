"""Minimal in-core CSR matrix — the sparse in-core flavor (SURVEY §2B
B5/B14; reference ``SparseRowMatrix`` / ``RandomAccessSparseVector``
use-sites ``TWCNB.scala:68``, ``MMul.scala:37-39``,
``NaiveBayesServlet.scala:85``).

scipy is not available in this environment, so this is a numpy-only
implementation of the standard public CSR layout (``data`` /
``indices`` / ``indptr``) with just the kernels the block operators
need. All ops are vectorized over the nonzeros — nothing here is
O(rows × cols).
"""

from __future__ import annotations

import numpy as np


class CsrMatrix:
    """Compressed sparse row matrix over float64 nonzeros.

    ``data[indptr[i]:indptr[i+1]]`` are row i's values,
    ``indices[...]`` the matching column ids. ``shape = (nrow, ncol)``.
    """

    __slots__ = ("data", "indices", "indptr", "shape")

    def __init__(
        self,
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: tuple[int, int],
    ):
        self.data = np.asarray(data, dtype=np.float64)
        self.indices = np.asarray(indices, dtype=np.int64)
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.shape = (int(shape[0]), int(shape[1]))
        if len(self.indptr) != self.shape[0] + 1:
            raise ValueError(
                f"indptr length {len(self.indptr)} != nrow+1 ({self.shape[0]+1})"
            )

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def from_coo(
        cls,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        shape: tuple[int, int],
    ) -> "CsrMatrix":
        """Build from triplet arrays; ``rows`` are LOCAL indices
        0..nrow-1. Triplets may arrive in any order; duplicates are NOT
        merged (callers that need sum-merge aggregate upstream — the
        relational COO layer already does)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = np.bincount(rows, minlength=shape[0])
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return cls(vals, cols, indptr, shape)

    @classmethod
    def from_dense(cls, block: np.ndarray) -> "CsrMatrix":
        block = np.asarray(block, dtype=np.float64)
        rows, cols = np.nonzero(block)
        return cls.from_coo(rows, cols, block[rows, cols], block.shape)

    # ------------------------------------------------------------------ #
    # views / conversions
    # ------------------------------------------------------------------ #

    @property
    def nnz(self) -> int:
        return len(self.data)

    def row_ids_expanded(self) -> np.ndarray:
        """Row index of every nonzero (COO row vector) — O(nnz)."""
        return np.repeat(
            np.arange(self.shape[0], dtype=np.int64), np.diff(self.indptr)
        )

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=np.float64)
        out[self.row_ids_expanded(), self.indices] = self.data
        return out

    # ------------------------------------------------------------------ #
    # kernels (all O(nnz) or O(nnz·k))
    # ------------------------------------------------------------------ #

    def dot_dense(self, b: np.ndarray) -> np.ndarray:
        """``self @ b`` for dense ``b`` (ncol×k): gather + segment-add
        over nonzeros — the SpMM shape TWCNB scoring uses."""
        b = np.asarray(b, dtype=np.float64)
        if b.ndim == 1:
            b = b[:, None]
        out = np.zeros((self.shape[0], b.shape[1]), dtype=np.float64)
        np.add.at(out, self.row_ids_expanded(), self.data[:, None] * b[self.indices])
        return out

    def row_sums(self) -> np.ndarray:
        return np.add.reduceat(
            np.concatenate([self.data, [0.0]]),
            np.minimum(self.indptr[:-1], len(self.data)),
        ) * (np.diff(self.indptr) > 0)

    def col_sums(self) -> np.ndarray:
        return np.bincount(
            self.indices, weights=self.data, minlength=self.shape[1]
        )

    def scale_rows(self, s: np.ndarray) -> "CsrMatrix":
        """Row-wise scaling (the TF-IDF / length-normalization shape)."""
        s = np.asarray(s, dtype=np.float64)
        return CsrMatrix(
            self.data * s[self.row_ids_expanded()],
            self.indices,
            self.indptr,
            self.shape,
        )

    def map_values(self, fn) -> "CsrMatrix":
        """Elementwise transform of the NONZEROS only (B16's cell-wise
        funcs restricted to the sparse support — log1p, abs, powers)."""
        return CsrMatrix(
            np.asarray(fn(self.data), dtype=np.float64),
            self.indices,
            self.indptr,
            self.shape,
        )
