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
        # r7 (VERDICT r6 item 1): sixteen never-driver-checked shapes
        # rotate in; every swapped-out variant's SURVEY row keeps an
        # in-cap representative (a staying sibling or the incoming
        # same-row query) and stays registered + locally oracle-checked.
        "stream_": 6,
        "dedup_": 4,
        "multimodal_": 1,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in ("corpus_pipeline_full", "similarity_topk",
                 "pii_scrub", "segment_overlap_exact", "pack_training_bins",
                 "ann_ivf_topk", "semantic_dedup",
                 "pagerank_copurchase", "cdc_apply",
                 "table_profile", "dedup_incremental",
                 "dedup_incremental_minhash", "mapinarrow_norms",
                 "inverted_index", "equidepth_histogram",
                 "anomaly_features", "sql_shipping_priority",
                 "stream_txlog_append", "item_recommendations",
                 "fuzzy_name_matches", "scd2_customer_dim",
                 "pit_join_orders",
                 # r7 rotation: first driver evidence for these sixteen
                 "bloom_semi_reduce", "txlog_pruned_read",
                 "zorder_orders_key", "incremental_mv_refresh",
                 "session_paths", "stream_scd2_dim", "skew_salted_join",
                 "grouping_sets_revenue", "binary_files_ingest",
                 "pandas_udf_score", "range_frame_activity",
                 "json_quarantine", "jsonl_roundtrip",
                 "project_embeddings", "ewma_revenue",
                 "anomaly_scores_distributed"):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "anomaly_scores_distributed",  # ensemble scores (broadcast-model arm)
    }
