"""ecommerce_dataengineering_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query/data-processing
surface of the reference e-commerce lakehouse pipeline
(moreen19/ecommerce-dataengineering-project): medallion ETL
(bronze JSON -> silver -> gold), revenue arithmetic, incremental
high-watermark appends, daily aggregates + anomaly scoring, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) the north star adds.

Everything is declarative DataFrame/SQL so Catalyst plans it; nothing
here hand-schedules execution. Designed for a 1000-executor cluster
reading ~100 TB; tested on local[*] against deterministic parquet
fixtures.
"""

from ecommerce_dataengineering_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
