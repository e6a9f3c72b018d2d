from oasisdb_spark.functions.distance import (
    cosine_distance,
    dot,
    hamming,
    inner_product_distance,
    l2_squared,
    distance_expr,
)

__all__ = [
    "cosine_distance",
    "dot",
    "hamming",
    "inner_product_distance",
    "l2_squared",
    "distance_expr",
]
