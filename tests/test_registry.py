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
        "stream_": 7,  # reference's core streaming path
        "dedup_": 6,
        # r4: decode+features hold the multimodal row's driver slots;
        # resize/frame_sample rotated out for never-checked shapes
        # (bm25_search, funnel_conversion, range_join_coincident).
        "multimodal_": 2,
        "ann_": 1,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in ("text_stats", "language_id", "token_counts", "tfidf_top_terms",
                 "training_corpus", "similarity_topk", "skew_salted_agg",
                 "grouped_pandas_stats", "approx_distinct_quantiles"):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "ann_ivf_topk",  # trained centroid state
        "approx_distinct_quantiles",  # sketch estimates
        "anomaly_isolation_forest",  # ensemble scores
        "ann_lsh_topk",  # oracle added in round 2; keep allowance until proven
    }
