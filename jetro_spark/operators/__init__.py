"""Relational-mode pipeline operators (DataFrame → DataFrame).

This is the scale path: a jetro pipeline over a table-backed array
(``$.orders.filter(...).group_by(...)``) compiles to these operators, so
filter/map/sort/group_by/equi_join become where/select/orderBy/groupBy/join
and inherit Spark's shuffle, spill, AQE, and broadcast machinery.
"""

from jetro_spark.operators.relational import (
    count_by,
    equi_join,
    explode_field,
    group_collect,
    implode,
    index_by,
    pivot2,
    pivot3,
    unique_by,
)
from jetro_spark.operators.joins import (
    anti_join,
    asof_join,
    left_join,
    range_join,
    salted_join,
    semi_join,
)
from jetro_spark.operators.profiling import (
    check_constraints,
    group_quantiles,
    histogram,
    key_skew,
    profile_table,
)
from jetro_spark.operators.timeseries import rollup_gapfill, time_bucket
from jetro_spark.operators.analytics import (
    with_cum_extreme,
    with_diff,
    with_lag,
    with_lead,
    with_pct_change,
    with_rolling,
    with_zscore,
)

__all__ = [
    "equi_join",
    "asof_join",
    "range_join",
    "salted_join",
    "left_join",
    "semi_join",
    "anti_join",
    "group_quantiles",
    "histogram",
    "key_skew",
    "check_constraints",
    "profile_table",
    "rollup_gapfill",
    "time_bucket",
    "group_collect",
    "count_by",
    "index_by",
    "unique_by",
    "pivot2",
    "pivot3",
    "explode_field",
    "implode",
    "with_lag",
    "with_lead",
    "with_rolling",
    "with_cum_extreme",
    "with_diff",
    "with_pct_change",
    "with_zscore",
]
