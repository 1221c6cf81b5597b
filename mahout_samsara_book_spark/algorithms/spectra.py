"""Top principal direction via power iteration on the distributed Gram
matrix (north-star extension: the spectral step of embedding-quality
audits — dominant direction, anisotropy checks, whitening).

Division of labor follows dridge's pattern (SURVEY §4): the
data-proportional work — XᵀX over the full embedding relation — runs
distributed as one Arrow-partial pass (``Drm.gram``: per-partition
``blockᵀ @ block``, ncol²-row shuffle); the ncol×ncol iteration then
runs in-core on the driver, because iterating a 64×64 matvec through
cluster jobs would be pure scheduling overhead. At 100 TB the gram pass
is the only term that grows; the driver step stays 64×64.

Determinism contract: every matvec folds addends SEQUENTIALLY in index
order (explicit Python loop — numpy's pairwise summation would
associate differently than the oracle's ordered ``list_sum``), so
DuckDB replays the whole trajectory; the gram entries themselves are
plain float sums on both engines, whose last-ulp partial-order noise
stays ~1e-14 relative through the normalized iteration — far inside the
%.7e output format.
"""

from __future__ import annotations

import math

import numpy as np


def power_iteration(gram: np.ndarray, iters: int = 4) -> np.ndarray:
    """Dominant eigenvector of a PSD ``gram`` after ``iters`` fixed
    power steps from the uniform unit vector. Fixed iteration count
    (not a convergence test) keeps the float trajectory replayable."""
    n = gram.shape[0]
    v = [1.0 / math.sqrt(float(n))] * n
    for _ in range(iters):
        w = []
        for i in range(n):
            acc = 0.0
            for j in range(n):
                acc += float(gram[i, j]) * v[j]
            w.append(acc)
        acc = 0.0
        for i in range(n):
            acc += w[i] * w[i]
        nrm = math.sqrt(acc)
        v = [x / nrm for x in w]
    return np.asarray(v, dtype=np.float64)
