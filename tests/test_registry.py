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
        # r15 (VERDICT r14 item 1): staleness-first re-confirmation
        # drains the full remaining r9 era plus 10 r10-era rows. The
        # txlog_ quota drops from 2 to 1 BY DESIGN: four txlog rows
        # were r14-board green (stream_txlog_append,
        # txlog_bloom_point_read, txlog_auto_compact,
        # athena_manifest_read) — the freshest evidence tier of any
        # family — and the r10 txlog block rotates in r16. dedup_
        # likewise drops to 1 (dedup_clusters/dedup_keep_first are
        # r13-r14 green). Every family below keeps at least one
        # in-window representative.
        "stream_": 7,
        "dedup_": 1,
        "semantic_dedup": 1,
        "ann_": 2,
        "ivf_": 2,
        "txlog_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # the round's new arms + lifecycle re-boards, at registration
        "ivf_recenter",
        "ivf_split_hot_cell",
        "ann_ivf_indexed",
        "ann_filtered_ivf",
        "stream_semantic_dedup",
        # 9 flagship keepers spanning the families
        "daily_sales", "fct_purchases", "stream_bronze_silver",
        "stream_inventory_restock", "sdp_pipeline_daily",
        "semantic_dedup", "corpus_pipeline_full", "cdc_apply",
        "pagerank_copurchase",
    ):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few. This round: NONE —
    all three rows-only-by-nature queries (sketch_incremental_rollup
    r14, anomaly_isolation_forest / anomaly_scores_distributed r13)
    carry board-green evidence fresher than the rows this rotation
    drains, so every r15 slot is a full hash check."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert rows_only == []
