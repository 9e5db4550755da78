"""api_to_parquet_spark — a PySpark-native analytics engine with the
capabilities of abossard/api-to-parquet (time-series ingest → partitioned
Parquet lake → SQL query surface), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst optimizes (predicate pushdown, partition pruning, broadcast joins,
AQE), with Pandas UDFs only where built-in operators cannot express the
semantics. Designed for a 1000-executor cluster at ~100 TB; tested locally.
"""

from api_to_parquet_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
