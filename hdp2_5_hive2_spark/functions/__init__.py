from hdp2_5_hive2_spark.functions.hive_compat import (
    HIVE_FUNCTIONS,
    hive_fn,
    missing_functions,
    register_sql_shims,
)

__all__ = ["HIVE_FUNCTIONS", "hive_fn", "missing_functions", "register_sql_shims"]
