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
        # r6 (VERDICT r5 item 1): fifteen never-driver-checked shapes
        # rotate in, so several long-green variants cede their slots —
        # the floor per family is ONE representative of each SURVEY
        # row, not the historical in-cap population. T6 keeps
        # upsert_gold's tumbling windows (session out), X2 keeps
        # semantic_dedup + incremental_minhash (batch minhash out),
        # X3 keeps similarity_topk + ann_ivf_topk (lsh out). Every
        # swapped-out variant stays registered and locally
        # oracle-checked.
        "stream_": 6,
        "dedup_": 4,
        "multimodal_": 1,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in ("corpus_pipeline_full", "similarity_topk", "skew_salted_agg",
                 "pii_scrub", "doc_repetition",
                 "segment_overlap_exact", "pack_training_bins",
                 "ann_ivf_topk", "decontaminate", "canonical_docs",
                 "dq_checks", "chunk_documents_udtf",
                 "time_travel_read", "pagerank_copurchase", "cdc_apply",
                 # r6 rotation: first driver evidence for these fifteen
                 "pit_join_orders", "gapfill_daily_revenue",
                 "table_profile", "dedup_incremental",
                 "dedup_incremental_minhash", "mapinarrow_norms",
                 "basket_pairs", "inverted_index", "equidepth_histogram",
                 "anomaly_features", "sql_shipping_priority",
                 "stream_txlog_append", "item_recommendations",
                 "fuzzy_name_matches", "scd2_customer_dim"):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "anomaly_isolation_forest",  # ensemble scores
    }
