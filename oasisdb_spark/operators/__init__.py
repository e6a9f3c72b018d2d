from oasisdb_spark.operators.asof import asof_join
from oasisdb_spark.operators.connected_components import connected_components
from oasisdb_spark.operators.range_join import range_join
from oasisdb_spark.operators.skew import salted_distinct_count, salted_join

__all__ = [
    "asof_join",
    "connected_components",
    "range_join",
    "salted_distinct_count",
    "salted_join",
]
