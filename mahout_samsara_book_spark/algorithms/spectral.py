"""Thin spectral decomposition on the DRM kernels — round-10.

Mahout Samsara's library ships distributed decompositions (dspca/dssvd)
built on exactly the primitives the book's user code exercises (gram,
Atx, broadcast).  This module is the Spark-first seed of that surface:
the leading principal direction of an embedding relation via ONE
distributed gram pass (Drm.gram — the A7 AtA kernel, per-partition
``blockᵀ @ block`` partials, a tiny ncol²-row aggregate) and a
driver-side power iteration whose float operations are SEQUENTIAL
(plain left-to-right Python adds, no numpy reductions) so the DuckDB
oracle can replay the identical iterate list with a recursive CTE over
``list_transform``/``list_sum``.  The corpus is touched twice: once for
the gram, once for the (codegen'd, broadcast-literal) projection — no
iteration ever re-scans the data, which is what makes power iteration
the 100 TB shape: k iterations cost k·ncol² driver flops, not k scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _power_iterate(g: list[list[float]], dim: int, iters: int) -> list[float]:
    """``iters`` normalized matvecs from the all-ones start — sequential
    float ops only, mirroring the oracle's list_sum fold order."""
    v = [1.0] * dim
    for _ in range(iters):
        w = []
        for i in range(dim):
            s = 0.0
            for j in range(dim):
                s += g[i][j] * v[j]
            w.append(s)
        nr = 0.0
        for x in w:
            nr += x * x
        nr = math.sqrt(nr)
        v = [x / nr for x in w]
    return v


def leading_components(
    emb: DataFrame,
    dim: int,
    k: int = 1,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """``(components, projections)`` — the top-k eigenvectors of the
    (uncentered) gram ``XᵀX`` by power iteration + Hotelling deflation
    (e found → λ = eᵀGe Rayleigh → G ← G − λ·eeᵀ → repeat), and each
    row's k-dim projection ``(id, p0..p{k-1})`` — the embedding-
    compression op (64 → k dims before ANN/visualization) that costs
    TWO corpus passes total: one gram (A7 kernel), one projection
    against k broadcast literals; every iteration and deflation is
    k·iters·dim² driver flops, never a rescan.

    Fixed iteration count is the replay contract (the BPE-trainer
    discipline): both engines run exactly ``iters`` normalized matvecs
    per component, so there is no convergence-test divergence.

    Float contract: the gram is a distributed sum whose last-ulp
    partition-order wobble gets AMPLIFIED through k·iters normalized
    matvecs — measured at sf1, the drift reached the 8th significant
    digit of a projection, flipping the %.7e print (a single
    un-iterated sum's wobble never does).  Both engines therefore
    QUANTIZE every gram cell to 7 significant digits (%.6e round-trip;
    DuckDB ``printf('%.6e', ·)::DOUBLE``) before iterating: identical
    inputs + identical sequential op order (Python loops here,
    ``list_sum(list_transform(...))`` folds there, λ·e_i·e_j
    multiplies left-assoc) = bit-identical iterates, and the residual
    flip probability is the ~1e-9-per-cell chance a cell's true value
    sits within one ulp of a 7-digit rounding boundary.  Projections
    are the codegen'd ``zip_with``+``aggregate`` left fold per
    component."""
    from mahout_samsara_book_spark.drm.drm import FEAT, KEY, Drm

    d = Drm(
        emb.select(
            F.col(id_col).cast("long").alias(KEY),
            F.col(vec_col).cast("array<double>").alias(FEAT),
        ),
        ncol=dim,
    )
    gm = d.gram()  # ncol × ncol, declared-small driver result (A7)
    g = [
        [float("%.6e" % float(gm[i, j])) for j in range(dim)]
        for i in range(dim)
    ]
    comps: list[list[float]] = []
    for _ in range(k):
        v = _power_iterate(g, dim, iters)
        comps.append(v)
        inner = []
        for i in range(dim):
            s = 0.0
            for j in range(dim):
                s += g[i][j] * v[j]
            inner.append(s)
        lam = 0.0
        for i in range(dim):
            lam += v[i] * inner[i]
        g = [
            [g[i][j] - lam * v[i] * v[j] for j in range(dim)]
            for i in range(dim)
        ]
    arr = F.col(vec_col).cast("array<double>")
    cols = []
    for ci, v in enumerate(comps):
        lit = F.array(*[F.lit(float(x)) for x in v])
        cols.append(
            F.aggregate(
                F.zip_with(arr, lit, lambda x, e: x * e),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"p{ci}")
        )
    return comps, emb.select(F.col(id_col), *cols)


def leading_component(
    emb: DataFrame,
    dim: int,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], DataFrame]:
    """k=1 convenience form of :func:`leading_components`:
    ``(component, (id, proj))``."""
    comps, df = leading_components(
        emb, dim, k=1, iters=iters, id_col=id_col, vec_col=vec_col
    )
    return comps[0], df.select(F.col(id_col), F.col("p0").alias("proj"))
