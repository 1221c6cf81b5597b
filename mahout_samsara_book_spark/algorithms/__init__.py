from mahout_samsara_book_spark.algorithms.regression import (
    dridge,
    dridge_table,
    reg_var_estimate,
    ssr,
    test_beta,
)

__all__ = ["dridge", "dridge_table", "reg_var_estimate", "ssr", "test_beta"]
