"""SparkSession factory.

The reference builds its session with Delta/Iceberg/S3 wiring
(`pipeline/spark/streaming_consumer.py:38-48`,
`pipeline/spark/delta_to_iceberg.py:10-20`); here the equivalent is a
plain local session tuned for the test harness, with the settings that
matter at 100 TB expressed as defaults (AQE on, skew-join handling on,
sensible shuffle partitioning) so the same code scales by changing only
master/cluster config, never the plan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale-out behavior:
#  - AQE re-plans at runtime (coalesces small shuffle partitions,
#    converts sort-merge->broadcast when a side turns out small,
#    splits skewed partitions).
#  - shuffle.partitions is a starting point only; AQE coalescing makes
#    the exact number non-critical, which is what you want when the
#    same job runs at sf0.001 and at 100 TB.
_SCALE_CONFS: dict[str, str] = {
    # local[32] drives 32 concurrent tasks through one JVM; the 1g
    # default heap is the test bottleneck, not a scale setting.
    "spark.driver.memory": "8g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # NOTE: deliberately NO parquet timestamp confs here. The fixtures'
    # µs/isAdjustedToUTC=false timestamps arrive as TIMESTAMP_NTZ under
    # default config (as they do in the driver's vanilla session), and
    # load_table normalizes them — keeping the tuned test session and
    # an out-of-the-box session on the same read path.
    # Managed tables live under the gitignored scratch dir.
    "spark.sql.warehouse.dir": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "warehouse"
    ),
}


def get_spark(
    app_name: str = "ecommerce-dataengineering-project-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    so the driver harness, tests, and bench all share one entry point.
    On a real cluster, pass ``master=None`` with ``--master`` supplied by
    spark-submit and the same session settings apply.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for k, v in _SCALE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
