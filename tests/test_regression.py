"""Reproduces the reference's regression gates (BASELINE.md):
OLS parameter recovery L1 < 1e-1 on the F2 fixture (MyAppSuite.scala:72-87)
and the coefficient t-test surface (MyAppSuite.scala:89-112)."""

import numpy as np
import pytest

from mahout_samsara_book_spark.algorithms import regression as reg
from mahout_samsara_book_spark.algorithms.regression import (
    dridge,
    dridge_table,
    reg_var_estimate,
    ssr,
)
from mahout_samsara_book_spark.drm.drm import Drm
from mahout_samsara_book_spark.kernels.incore import (
    gaussian_view,
    symmetric_uniform_view,
)

BETA_TRUE = np.array([3.0, 25.0, 10.0, -4.0])  # bias first — MyAppSuite.scala:78


def sim_data(m=250, sigma=0.04, seed_x=1234, seed_e=1245):
    """F2 fixture: X ~ U[-1,1), y = [1|X]·β + σ·N(0,1) (MyAppSuite.scala:28-44)."""
    x = symmetric_uniform_view(m, 3, seed_x)
    eps = gaussian_view(m, 1, seed_e)[:, 0]
    y = BETA_TRUE[0] + x @ BETA_TRUE[1:] + sigma * eps
    return x, y


@pytest.fixture(scope="module")
def fixture(spark):
    x, y = sim_data()
    return Drm.from_numpy(spark, x, num_partitions=2), x, y


def test_ols_recovers_beta(fixture):
    drm_x, _, y = fixture
    beta = dridge(drm_x, y, lam=0.0)
    assert np.abs(beta - BETA_TRUE).sum() < 1e-1  # MyAppSuite.scala:86 gate


def test_ridge_matches_closed_form(fixture):
    drm_x, x, y = fixture
    lam = 0.7
    xb = np.hstack([np.ones((x.shape[0], 1)), x])
    expect = np.linalg.solve(xb.T @ xb + lam * np.eye(4), xb.T @ y)
    assert np.allclose(dridge(drm_x, y, lam), expect, atol=1e-8)


def test_ssr_and_var(fixture):
    drm_x, x, y = fixture
    beta = dridge(drm_x, y)
    xb = np.hstack([np.ones((x.shape[0], 1)), x])
    expect = float(np.sum((xb @ beta - y) ** 2))
    got = ssr(drm_x, beta, y)
    assert np.isclose(got, expect, rtol=1e-8)
    assert np.isclose(reg_var_estimate(got, 250, 4), expect / 246.0)


def test_beta_stats(spark):
    # case b (MyAppSuite.scala:93-94): beta=(-4,3,25,12), sigma=10
    beta_true = np.array([-4.0, 3.0, 25.0, 12.0])
    x = symmetric_uniform_view(250, 3, 1234)
    y = beta_true[0] + x @ beta_true[1:] + 10.0 * gaussian_view(250, 1, 1245)[:, 0]
    drm_x = Drm.from_numpy(spark, x, num_partitions=2)
    res = reg.test_beta(drm_x, y)
    assert res["df"] == 246
    assert np.all(res["se"] > 0)
    assert np.all((res["p"] >= 0) & (res["p"] <= 1))
    # numpy oracle for SE/t
    xb = np.hstack([np.ones((250, 1)), x])
    c = np.linalg.inv(xb.T @ xb)
    beta_hat = c @ (xb.T @ y)
    sigma2 = np.sum((xb @ beta_hat - y) ** 2) / 246.0
    se = np.sqrt(sigma2 * np.diag(c))
    assert np.allclose(res["beta"], beta_hat, atol=1e-8)
    assert np.allclose(res["se"], se, atol=1e-8)
    assert np.allclose(res["t"], beta_hat / se, atol=1e-8)


def test_coeff_csv_dump_external_verification(tmp_path, fixture):
    """R-verification CSV parity (MyAppSuite.scala:46-70): the dumped file
    round-trips through an external reader (DuckDB standing in for R) and
    its closed-form OLS matches ours."""
    import duckdb

    drm_x, x, y = fixture
    path = str(tmp_path / "ols-coeff-tests.csv")
    reg.dump_coeff_csv(x, y, path)
    con = duckdb.connect()
    n, b1 = con.execute(
        f"SELECT count(*), regr_slope(y, X0) FROM read_csv_auto('{path}')"
    ).fetchone()
    assert n == 250
    # single-regressor slope from the external tool ≈ multivariate β1 since
    # X columns are independent U[-1,1): loose sanity bound
    assert abs(b1 - 25.0) < 1.0


def test_ols_matches_mllib_linear_regression(spark, fixture):
    """Dual-implementation oracle (SURVEY C2): our normal-equation OLS vs
    pyspark.ml LinearRegression(solver='normal', regParam=0) — identical
    β and intercept within 1e-6."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    drm_x, x, y = fixture
    import pandas as pd

    pdf = pd.DataFrame({f"x{i}": x[:, i] for i in range(3)})
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    assembled = VectorAssembler(
        inputCols=["x0", "x1", "x2"], outputCol="features"
    ).transform(df)
    lr = LinearRegression(
        solver="normal", regParam=0.0, fitIntercept=True
    ).fit(assembled)
    ours = dridge(drm_x, y, lam=0.0)
    assert abs(lr.intercept - ours[0]) < 1e-6
    assert np.allclose(np.array(lr.coefficients), ours[1:], atol=1e-6)


def test_dridge_table_matches_drm_path(spark, fixture):
    drm_x, x, y = fixture
    import pandas as pd

    pdf = pd.DataFrame({f"x{i}": x[:, i] for i in range(3)})
    pdf["y"] = y
    df = spark.createDataFrame(pdf)
    beta_sql = dridge_table(df, ["x0", "x1", "x2"], "y")
    beta_drm = dridge(drm_x, y)
    assert np.allclose(beta_sql, beta_drm, atol=1e-8)


def test_ssr_xy_matches_broadcast_y_path(spark, fixture):
    """ssr_xy (y carried in-row, arbitrary keys) ≡ ssr (y broadcast by
    ordinal) ≡ numpy."""
    drm_x, x, y = fixture
    beta = np.array([1.0, 2.0, -3.0, 0.5])
    xy = np.hstack([x, y[:, None]])
    drm_xy = Drm.from_numpy(spark, xy, num_partitions=2)
    got = reg.ssr_xy(drm_xy, beta)
    xb = np.hstack([np.ones((x.shape[0], 1)), x])
    expect = float(np.sum((xb @ beta - y) ** 2))
    assert np.isclose(got, expect, rtol=1e-10)
    assert np.isclose(got, ssr(drm_x, beta, y), rtol=1e-10)
    # JVM-side SQL fold ≡ the A13 Arrow allreduce shape
    got_arrow = reg.ssr_xy(drm_xy, beta, strategy="arrow")
    assert np.isclose(got, got_arrow, rtol=1e-10)


def test_beta_table_matches_drm_path(spark):
    """C5 via the one-pass relational formulation ≡ C5 via the DRM path,
    including the scipy p-values DuckDB cannot check."""
    import pandas as pd

    beta_true = np.array([-4.0, 3.0, 25.0, 12.0])
    x = symmetric_uniform_view(250, 3, 1234)
    y = beta_true[0] + x @ beta_true[1:] + 10.0 * gaussian_view(250, 1, 1245)[:, 0]
    drm_x = Drm.from_numpy(spark, x, num_partitions=2)
    res_drm = reg.test_beta(drm_x, y)
    pdf = pd.DataFrame({f"x{i}": x[:, i] for i in range(3)})
    pdf["y"] = y
    df = spark.createDataFrame(pdf)
    res_tab = reg.test_beta_table(df, ["x0", "x1", "x2"], "y")
    assert res_tab["df"] == res_drm["df"] == 246
    for k in ("beta", "se", "t", "p"):
        assert np.allclose(res_tab[k], res_drm[k], rtol=1e-7, atol=1e-12), k
