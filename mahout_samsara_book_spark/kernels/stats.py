"""Student-t distribution in pure numpy.

The reference computes coefficient p-values with Apache Commons Math's
``TDistribution`` (``LinearRegression.scala:3,89``). scipy is not available
in this environment, so the regularized incomplete beta function is
implemented directly with the standard modified-Lentz continued fraction
(Abramowitz & Stegun 26.5.8 / DLMF 8.17.22), vectorized over numpy arrays.

Accuracy: ~1e-12 relative over the ranges a regression t-test uses; the
doctest-style checks live in tests/test_kernels.py against closed forms
(df=1 → arctan, df=2 → algebraic).
"""

from __future__ import annotations

import numpy as np

_MAX_ITER = 300
_EPS = 3.0e-15
_TINY = 1.0e-300


def _betacf(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta, modified Lentz method."""
    x = np.asarray(x, dtype=np.float64)
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _TINY, _TINY, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _TINY, _TINY, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _TINY, _TINY, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _TINY, _TINY, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _TINY, _TINY, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc(a: float, b: float, x) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized in x."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    out = np.empty_like(x)
    out[x <= 0.0] = 0.0
    out[x >= 1.0] = 1.0
    mid = (x > 0.0) & (x < 1.0)
    if np.any(mid):
        xm = x[mid]
        ln_front = (
            np.log(xm) * a
            + np.log1p(-xm) * b
            - (np.log(_beta_fn(a, b)))
        )
        front = np.exp(ln_front)
        # Use the CF directly where it converges fast, else the symmetry
        # I_x(a,b) = 1 - I_{1-x}(b,a).
        direct = xm < (a + 1.0) / (a + b + 2.0)
        res = np.empty_like(xm)
        if np.any(direct):
            res[direct] = front[direct] * _betacf(a, b, xm[direct]) / a
        if np.any(~direct):
            res[~direct] = 1.0 - front[~direct] * _betacf(b, a, 1.0 - xm[~direct]) / b
        out[mid] = res
    return out


def _beta_fn(a: float, b: float) -> float:
    from math import lgamma

    return np.exp(lgamma(a) + lgamma(b) - lgamma(a + b))


def student_t_cdf(t, df: float) -> np.ndarray:
    """P(T <= t) for T ~ Student-t(df)."""
    t = np.atleast_1d(np.asarray(t, dtype=np.float64))
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return np.where(t > 0, 1.0 - p, p)


def student_t_sf(t, df: float) -> np.ndarray:
    """Two-sided p-value 2 * P(T >= |t|) — LinearRegression.scala:89-94."""
    t = np.atleast_1d(np.asarray(t, dtype=np.float64))
    x = df / (df + t * t)
    return betainc(df / 2.0, 0.5, x)
