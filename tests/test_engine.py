"""SamsaraContext facade: the reference driver-program shape end to end."""

import numpy as np

from mahout_samsara_book_spark.algorithms.regression import dridge
from mahout_samsara_book_spark.engine import SamsaraContext
from mahout_samsara_book_spark.kernels.incore import (
    gaussian_view,
    symmetric_uniform_view,
)


def test_reference_driver_program_shape(spark):
    """The dridge example (LinearRegression.scala:17-34 usage in
    MyAppSuite.scala:72-87) rewritten against the facade — a mechanical
    rename from the Samsara original."""
    ctx = SamsaraContext(spark)
    beta_true = np.array([3.0, 25.0, 10.0, -4.0])
    mx = symmetric_uniform_view(250, 3, 1234)
    y = beta_true[0] + mx @ beta_true[1:] + 0.04 * gaussian_view(250, 1, 1245)[:, 0]

    drm_x = ctx.drm_parallelize(mx, num_partitions=2)
    beta = dridge(drm_x, y, lam=0.0)
    assert np.abs(beta - beta_true).sum() < 1e-1

    bc = ctx.drm_broadcast(beta)
    assert np.allclose(bc.value, beta)


def test_facade_table_and_sql(spark):
    ctx = SamsaraContext(spark)
    li = ctx.table("/root/testdata/sf0.001", "lineitem")
    assert li.count() > 0
    li.createOrReplaceTempView("li_facade")
    n = ctx.sql("SELECT count(*) AS n FROM li_facade").collect()[0]["n"]
    assert n == li.count()

    drm = ctx.drm_from_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        "l_orderkey",
        ["l_quantity", "l_discount"],
    )
    assert drm.ncol == 2
