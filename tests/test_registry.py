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
        # r14 (VERDICT r13 item 1): staleness-first re-confirmation
        # drains the full remaining r8 era and starts on r9. The
        # fuzzy_/anomaly_/sketch-graduation rows carry no slot this
        # round BY DESIGN — their evidence is r12-r13 green (the
        # freshest on any board); they rotate back by staleness. Every
        # family below keeps at least one in-window representative.
        "stream_": 7,
        "dedup_": 2,
        "semantic_dedup": 1,
        "ann_": 1,
        "txlog_": 2,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in (
        # the round's new arms, boarded at registration
        "ann_filtered_ivf",
        "stream_semantic_dedup",
        # the r13 watchlist's largest bench mover rides a fresh check
        "triangle_count",
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
    ONE — sketch_incremental_rollup, rows-only BY NATURE (KLL k-cap +
    randomized compaction — SURVEY §5 note), boarded because its r8
    driver evidence is the last of that era (the staleness rotation's
    whole point). The anomaly_* rows-only pair re-boarded r13 and
    rotates back by staleness."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert rows_only == ["sketch_incremental_rollup"]
