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
        # r8 (VERDICT r7 item 1): seventeen never-driver-checked shapes
        # rotate in, led by the three r01-red-since-fixed rows; every
        # swapped-out variant's SURVEY row keeps an in-cap or
        # prior-board representative and stays registered + locally
        # oracle-checked.
        "stream_": 8,
        "dedup_": 3,
        "txlog_": 2,
        "multimodal_": 1,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in ("corpus_pipeline_full",
                 "pii_scrub", "segment_overlap_exact", "pack_training_bins",
                 "semantic_dedup",
                 "pagerank_copurchase", "cdc_apply",
                 "table_profile",
                 "dedup_incremental_minhash",
                 "inverted_index", "equidepth_histogram",
                 "anomaly_features", "sql_shipping_priority",
                 "stream_txlog_append", "item_recommendations",
                 "fuzzy_name_matches",
                 "pit_join_orders",
                 "bloom_semi_reduce", "incremental_mv_refresh",
                 "stream_scd2_dim", "skew_salted_join",
                 "binary_files_ingest", "pandas_udf_score",
                 # r8 rotation: first driver evidence for these seventeen
                 "cohort_retention", "ingestion_freshness",
                 "tumbling_window_events", "stream_socket_ingest",
                 "generator_source", "ann_pq_topk", "pq_codes",
                 "txlog_zorder_2d_scan", "txlog_bloom_point_read",
                 "stream_quarantine", "window_first_last",
                 "orc_roundtrip", "doc_fingerprint", "dedup_substring",
                 "doc_perplexity", "stream_dedup",
                 "sketch_incremental_rollup"):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "sketch_incremental_rollup",  # mergeable-sketch state (rows-only slot)
    }
