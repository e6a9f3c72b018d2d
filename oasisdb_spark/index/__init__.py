from oasisdb_spark.index.flat import knn_flat, topk_per_query

__all__ = ["knn_flat", "topk_per_query"]
