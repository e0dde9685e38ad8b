"""ML queries (SURVEY §2j): the reference's anomaly-detection job
re-expressed Spark-first, with the IsolationForest implemented in
seeded NumPy (sklearn is not a dependency of this engine).

Pipeline parity with pipeline/ml/anomaly_detection.py:
  Athena agg SQL (:25-33)   -> distributed daily_sales aggregation
  toPandas                  -> driver-side fetch of the tiny aggregate
  log1p features (:46)      -> same, via numpy (P12)
  IsolationForest(42) (:47) -> ml/isolation_forest.py (same algorithm)
  predict == -1 (:52)       -> is_anomaly boolean (P11)
  scores CSV to S3 (:56-60) -> returned as a DataFrame (K5 writes are
                               the caller's choice of sink)

No oracle entry: tree construction is not SQL-expressible; the driver
records a rows-only check, and tests/test_ml.py pins determinism and
a planted-outlier recall instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ecommerce_dataengineering_project_spark.ml.isolation_forest import IsolationForest
from ecommerce_dataengineering_project_spark.queries.core import q_daily_sales


def q_anomaly_isolation_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-sales anomaly scores: distributed agg, driver-side fit
    (the aggregate is calendar-bounded — a few thousand rows even at
    100 TB of facts), deterministic seed=42."""
    daily = q_daily_sales(spark, sf_dir).toPandas()
    X = np.log1p(daily[["daily_total_sales", "daily_transaction_count"]].to_numpy())
    forest = IsolationForest(n_estimators=100, max_samples=256, seed=42).fit(X)
    scores = forest.score_samples(X)
    out = pd.DataFrame(
        {
            "purchase_date": daily["purchase_date"],
            "daily_total_sales": daily["daily_total_sales"],
            "daily_transaction_count": daily["daily_transaction_count"],
            "anomaly_score": np.round(scores, 6),
            "is_anomaly": scores > 0.5,
        }
    )
    return spark.createDataFrame(out)


QUERIES = {
    "anomaly_isolation_forest": q_anomaly_isolation_forest,
}

ORACLES: dict[str, str] = {}
