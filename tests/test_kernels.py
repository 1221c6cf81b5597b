import numpy as np

from mahout_samsara_book_spark.kernels.incore import (
    dist,
    gaussian_view,
    solve,
    symmetric_uniform_view,
    uniform_view,
)
from mahout_samsara_book_spark.kernels.stats import student_t_cdf, student_t_sf


def test_views_deterministic_and_ranged():
    a = uniform_view(50, 20, 1234)
    b = uniform_view(50, 20, 1234)
    assert np.array_equal(a, b)
    assert a.min() >= 0.0 and a.max() < 1.0

    s = symmetric_uniform_view(100, 10, 42)
    assert s.min() >= -1.0 and s.max() < 1.0
    assert not np.array_equal(s, symmetric_uniform_view(100, 10, 43))

    g = gaussian_view(2000, 5, 7)
    assert abs(g.mean()) < 0.05
    assert abs(g.std() - 1.0) < 0.05


def test_solve_and_inverse():
    rng = np.random.default_rng(0)
    a = rng.random((6, 6)) + 6 * np.eye(6)
    b = rng.random(6)
    assert np.allclose(a @ solve(a, b), b)
    assert np.allclose(solve(a) @ a, np.eye(6), atol=1e-10)


def test_dist_matches_bruteforce():
    rng = np.random.default_rng(1)
    m = rng.random((8, 3))
    d = dist(m)
    brute = np.array(
        [[np.sum((m[i] - m[j]) ** 2) for j in range(8)] for i in range(8)]
    )
    assert np.allclose(d, brute, atol=1e-12)
    assert np.allclose(np.diag(d), 0.0)


def test_student_t_closed_forms():
    ts = np.array([-5.0, -1.3, -0.2, 0.0, 0.7, 2.1, 10.0])
    # df=1: Cauchy — CDF = 1/2 + arctan(t)/pi
    expect1 = 0.5 + np.arctan(ts) / np.pi
    assert np.allclose(student_t_cdf(ts, 1), expect1, atol=1e-10)
    # df=2: CDF = 1/2 + t / (2*sqrt(2 + t^2))
    expect2 = 0.5 + ts / (2.0 * np.sqrt(2.0 + ts * ts))
    assert np.allclose(student_t_cdf(ts, 2), expect2, atol=1e-10)
    # large df ≈ normal at t=1.96: two-sided p ≈ 0.05
    assert abs(student_t_sf(np.array([1.96]), 100000)[0] - 0.05) < 1e-3
    # symmetry of two-sided p
    assert np.allclose(student_t_sf(ts, 13), student_t_sf(-ts, 13))
