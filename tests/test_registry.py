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
        # r9 (VERDICT r8 item 1): thirty-four never-driver-checked
        # queries rotate in (20 high-novelty continuation shapes + 14
        # r8-plan leftovers); every swapped-out name's SURVEY row keeps
        # an in-cap keeper or a prior-board green and stays registered
        # + locally oracle-checked.
        "stream_": 7,
        "dedup_": 1,
        "txlog_": 2,
        "multimodal_": 1,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # 16 keepers spanning the families
        "daily_sales", "fct_purchases", "stream_bronze_silver",
        "stream_inventory_restock", "stream_upsert_gold",
        "dedup_incremental_minhash", "semantic_dedup", "ann_pq_topk",
        "multimodal_decode", "binary_files_ingest",
        "txlog_zorder_2d_scan", "bloom_semi_reduce",
        "corpus_pipeline_full", "cdc_apply", "pagerank_copurchase",
        "pandas_udf_score",
        # r9 rotation: 34 first-evidence rows
        "stream_dedup_rocksdb", "statestore_inspect",
        "stream_fanout_two_tables", "stream_stream_left_join",
        "stream_dedup_then_window", "sdp_pipeline_daily",
        "mv_routed_daily_sales", "datasource_write_roundtrip",
        "athena_manifest_read", "txlog_auto_compact",
        "bpe_pair_counts", "triangle_count", "udtf_user_sessions",
        "cogroup_asof_pandas", "observed_dq_metrics",
        "recursive_cte_reach", "lateral_topk_orders",
        "variant_shred_events", "theta_segment_overlap",
        "sql_udf_pricing", "array_functions", "attribution_last_touch",
        "bigram_lm", "corpus_report", "curriculum_order",
        "doc_familiarity", "ngram_repetition", "padding_batches",
        "revenue_histogram", "shuffle_corpus", "split_train_val_test",
        "token_histogram", "unpivot_returnflag", "vocab_coverage",
    ):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "sketch_incremental_rollup",  # mergeable-sketch state (rows-only slot)
    }
