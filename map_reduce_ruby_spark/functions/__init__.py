from map_reduce_ruby_spark.functions.exact import (
    dsum,
    dsum_sql,
    davg,
    davg_sql,
    cents_sum,
    cents_sum_sql,
    cents_sum_sql_double,
)
from map_reduce_ruby_spark.functions.hashes import h32, h32_sql, h60, h60_sql
from map_reduce_ruby_spark.functions.replay import literal_struct_array

__all__ = [
    "literal_struct_array",
    "dsum",
    "dsum_sql",
    "davg",
    "davg_sql",
    "cents_sum",
    "cents_sum_sql",
    "cents_sum_sql_double",
    "h32",
    "h32_sql",
    "h60",
    "h60_sql",
]
