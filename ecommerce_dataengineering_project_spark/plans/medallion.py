"""The reference's end-to-end medallion pipeline, Spark-first
(SURVEY §3 E1-E3, §7 Phase 2).

Reference dataflow: seeded producer -> Kafka JSON (bronze) -> Spark
streaming from_json -> Delta silver partitioned by product_id ->
batch promote with purchase_date -> Iceberg gold partitioned by date
(producer.py, streaming_consumer.py, delta_to_iceberg.py,
fct_purchases.sql). Here the same stages are pure DataFrame
transformations plus partitioned parquet/managed-table writes, so the
pipeline is one Catalyst-planned job per hop instead of four systems.

The fixture generator replays the producer's exact semantics
(FIXTURES.md §A1/A2) with a seeded RNG:

- 27-product dimension, 4 categories, category-derived price/cogs/
  inventory and a strictly-increasing propensity ladder
  (producer.py:82-113, products.csv).
- nearest-propensity product pick (J2: ``closest_product_match``,
  producer.py:131-134,203-204).
- skewed quantity 1/2/3 at 24/5/1 in 30 (producer.py:207-213),
  membership p=0.3, member_discount 0.10 (configuration.ini:17-18),
  supplements p=0.5 for SF/SC prefixes else p=0.2 (producer.py:220-224)
  at 1.99 (configuration.ini:21).
- schema drift replay: half the emitted JSON uses the producer's
  ``add_supplements`` key, half the consumer's ``add_supplement``
  (purchase.py:11 vs streaming_consumer.py:33) — the silver parser
  must accept both.
"""

from __future__ import annotations

import datetime as _dt
import json
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.revenue import final_amount
from ecommerce_dataengineering_project_spark.operators.aggregates import (
    daily_sales,
    dedup_keep_first,
    high_watermark,
    incremental_filter,
)
from ecommerce_dataengineering_project_spark.streaming.bronze_silver import (
    PURCHASE_DRIFT_ALIASES,
    PURCHASE_SCHEMA,
    parse_with_drift,
)

CATEGORIES = {
    # category -> (prefix, count, cogs, price, inventory_level)
    "Classic Smoothies": ("CS", 11, 1.50, 4.99, 75),
    "Superfoods Smoothies": ("SF", 7, 2.10, 5.99, 50),
    "Supercharged Smoothies": ("SC", 5, 2.70, 5.99, 35),
    "Indulgent Smoothies": ("IS", 4, 2.20, 5.49, 60),
}
MEMBER_DISCOUNT = 0.10   # configuration.ini:18
SUPPLEMENT_PRICE = 1.99  # configuration.ini:21
MEMBER_P = 0.3           # producer.py:216-217
QUANTITY_LADDER = [1] * 24 + [2] * 5 + [3] * 1  # producer.py:207-213


def products_rows() -> list[dict]:
    """The 27-row dimension with a cumulative propensity ladder
    (producer.py:112: sorted ascending, used for nearest-match)."""
    rows: list[dict] = []
    propensity = 0
    for cat, (prefix, count, cogs, price, inv) in CATEGORIES.items():
        for i in range(1, count + 1):
            propensity += 3 + (propensity % 11)  # deterministic, strictly increasing
            rows.append(
                {
                    "product_id": f"{prefix}{i:02d}",
                    "category": cat,
                    "item": f"{cat.split()[0]} #{i}",
                    "size": "24 oz.",
                    "cogs": cogs,
                    "price": price,
                    "inventory_level": inv,
                    "contains_fruit": prefix in ("CS", "SF"),
                    "contains_veggies": prefix == "SF",
                    "contains_nuts": prefix == "IS",
                    "contains_caffeine": prefix == "SC",
                    "propensity_to_buy": propensity,
                }
            )
    return rows


def products_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(products_rows())


def generate_bronze_purchases(
    spark: SparkSession, n: int = 240, seed: int = 42
) -> DataFrame:
    """Seeded replay of the producer loop -> bronze Kafka shape (one
    JSON string column ``value``), including the add_supplement(s)
    field-name drift on alternating rows."""
    rng = random.Random(seed)
    products = products_rows()
    ladder = sorted(p["propensity_to_buy"] for p in products)
    by_prop = {p["propensity_to_buy"]: p for p in products}
    t = _dt.datetime(2024, 1, 1, 9, 0, 0)
    out: list[str] = []
    for i in range(n):
        t += _dt.timedelta(seconds=rng.uniform(0.45, 0.55))  # producer.py:26-27
        draw = rng.randint(1, ladder[-1])
        # J2 nearest-value match against the sorted ladder
        prop = min(ladder, key=lambda x: abs(x - draw))
        prod = by_prop[prop]
        quantity = rng.choice(QUANTITY_LADDER)
        is_member = rng.random() < MEMBER_P
        supp_p = 0.5 if prod["product_id"][:2] in ("SF", "SC") else 0.2
        add_supp = rng.random() < supp_p
        row = {
            "transaction_time": t.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "transaction_id": f"txn-{seed}-{i:06d}",
            "product_id": prod["product_id"],
            "price": prod["price"],
            "quantity": quantity,
            "is_member": is_member,
            "member_discount": MEMBER_DISCOUNT if is_member else 0.0,
            # drift replay: producer key on even rows, consumer key on odd
            ("add_supplements" if i % 2 == 0 else "add_supplement"): add_supp,
            "supplement_price": SUPPLEMENT_PRICE if add_supp else 0.0,
        }
        out.append(json.dumps(row))
    return spark.createDataFrame([(v,) for v in out], "value string")


def bronze_to_silver(bronze: DataFrame) -> DataFrame:
    """E1: schema-enforced parse + ingestion stamp
    (streaming_consumer.py:69-72). Works on batch or streaming input."""
    silver = parse_with_drift(
        bronze,
        PURCHASE_SCHEMA,
        PURCHASE_DRIFT_ALIASES,
        options={"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    )
    return silver.withColumn("ingestion_timestamp", F.current_timestamp())


def silver_to_gold(silver: DataFrame) -> DataFrame:
    """E2+E3: the fct_purchases gold model (fct_purchases.sql:30-47) —
    dedup on the dbt unique_key, date extraction, revenue arithmetic."""
    deduped = dedup_keep_first(
        silver, ["transaction_id"], [F.col("ingestion_timestamp"), F.col("transaction_time")]
    )
    return deduped.select(
        F.col("transaction_id").cast("string").alias("transaction_id"),
        F.col("product_id"),
        F.to_date("transaction_time").alias("purchase_date"),
        final_amount().alias("final_amount"),
        F.col("is_member"),
        F.col("ingestion_timestamp"),
    )


def gold_daily(gold: DataFrame) -> DataFrame:
    """E3b: the Athena daily aggregate (anomaly_detection.py:25-33)."""
    return daily_sales(gold, "purchase_date", F.col("final_amount"), "transaction_id")


def incremental_append_gold(
    spark: SparkSession, new_silver: DataFrame, gold_table: str
) -> DataFrame:
    """dbt incremental materialization (fct_purchases.sql:2-8,24-27):
    filter to rows past the stored MAX(ingestion_timestamp) watermark,
    append, return the updated table. Partitioned by purchase_date so
    the watermark predicate prunes at the file level."""
    gold_new = silver_to_gold(new_silver)
    if spark.catalog.tableExists(gold_table):
        wm = high_watermark(spark.table(gold_table), "ingestion_timestamp")
        gold_new = incremental_filter(gold_new, "ingestion_timestamp", wm)
        gold_new.write.mode("append").partitionBy("purchase_date").saveAsTable(
            gold_table
        )
    else:
        gold_new.write.partitionBy("purchase_date").format("parquet").saveAsTable(
            gold_table
        )
    return spark.table(gold_table)
