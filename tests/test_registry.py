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
        # r11 (VERDICT r10 item 1): staleness-first re-confirmation.
        # txlog_/X24/storage carry no slot this round BY DESIGN — all
        # their rows are r9/r10 green (the freshest evidence on any
        # board); they rotate back by staleness around r13. Every
        # family below keeps at least one in-window representative.
        "stream_": 5,
        "dedup_": 4,
        "multimodal_": 3,
        "ann_": 2,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # the one query with no prior driver evidence leads the window
        "ann_ivf_indexed",
        # 15 flagship keepers spanning the families
        "daily_sales", "fct_purchases", "stream_bronze_silver",
        "stream_inventory_restock", "stream_upsert_gold",
        "sdp_pipeline_daily", "bucketed_join_revenue",
        "dedup_incremental_minhash", "semantic_dedup", "ann_pq_topk",
        "pandas_udf_score", "multimodal_decode",
        "corpus_pipeline_full", "cdc_apply", "pagerank_copurchase",
        # oracle upgrade: rows-only -> hash-matched this round
        "bpe_merges",
        # the round's new arms (first evidence): T7 proc-time timers,
        # X25 multi-MV cost routing
        "stream_idle_timer_flush",
        "mv_route_best",
    ):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few. This round: NONE —
    bpe_merges gained the unrolled CTE-chain oracle, and the sketch
    rows-only slots all hold r10 executed evidence."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert rows_only == []
