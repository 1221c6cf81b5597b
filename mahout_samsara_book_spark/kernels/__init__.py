from mahout_samsara_book_spark.kernels.incore import (
    dist,
    gaussian_view,
    solve,
    symmetric_uniform_view,
    uniform_view,
)
from mahout_samsara_book_spark.kernels.stats import student_t_cdf, student_t_sf

__all__ = [
    "dist",
    "gaussian_view",
    "solve",
    "student_t_cdf",
    "student_t_sf",
    "symmetric_uniform_view",
    "uniform_view",
]
