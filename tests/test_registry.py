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
        # r12 (VERDICT r11 items 1-2): staleness-first re-confirmation
        # drains the r4/r5/r6 eras. multimodal_/txlog_/X24/storage
        # carry no slot this round BY DESIGN — all their rows are
        # r9-r11 green (the freshest evidence on any board); they
        # rotate back by staleness around r13. Every family below
        # keeps at least one in-window representative.
        "stream_": 5,
        "dedup_": 3,
        "semantic_dedup": 2,
        "fuzzy_": 2,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # the post-rewrite re-confirmation leads the window
        "fuzzy_name_matches",
        # the round's new/upgraded arms, boarded at registration
        "fuzzy_multiblock_matches",
        "semantic_dedup_sharded",
        "segment_overlap_sketch",
        # 12 flagship keepers spanning the families
        "daily_sales", "fct_purchases", "stream_bronze_silver",
        "stream_inventory_restock", "stream_upsert_gold",
        "sdp_pipeline_daily", "bucketed_join_revenue",
        "dedup_incremental_minhash", "semantic_dedup",
        "corpus_pipeline_full", "cdc_apply", "pagerank_copurchase",
    ):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few. This round: exactly
    ONE — approx_distinct_quantiles (HLL/KLL estimates, no SQL oracle
    by nature) re-boards because its only driver evidence is r4-era;
    its quality gates live in tests/test_stats.py."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert rows_only == ["approx_distinct_quantiles"]
