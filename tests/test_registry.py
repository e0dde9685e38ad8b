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
        # r5: one slot freed per over-represented family to rotate in the
        # eight never-driver-checked shapes (VERDICT r4 item 3): T6 keeps
        # tumbling+session (sliding out), X2 keeps minhash_lsh
        # (simhash/ngram out), the multimodal row keeps decode
        # (features out). Swapped-out variants stay registered and
        # locally oracle-checked.
        "stream_": 6,
        "dedup_": 4,
        "multimodal_": 1,
        "ann_": 2,
    }
    for prefix, want in families.items():
        got = sum(1 for n in PRIORITY if n.startswith(prefix))
        assert got >= want, f"{prefix}*: {got} < {want} in priority block"
    for name in ("text_stats", "bm25_search",
                 "corpus_pipeline_full", "similarity_topk", "skew_salted_agg",
                 "exact_distinct_quantiles",
                 # r5 rotation: first driver evidence for these shapes
                 "pii_scrub", "doc_repetition",
                 "segment_overlap_exact", "pack_training_bins",
                 "quantize_embeddings", "ann_ivf_topk",
                 # r5 new first-class operators, fully oracle-checked
                 "decontaminate", "canonical_docs",
                 # r5 late rotation (zero-evidence shapes; the slots they
                 # took belonged to grouped_pandas_stats /
                 # shuffle_corpus / stream_dedup_watermarked, all green
                 # in r4 and still locally oracle-checked)
                 "dq_checks", "chunk_documents_udtf",
                 "stream_static_enrich",
                 # r5 second-session rotation: three new first-class
                 # families into the cap (X8 keeps bm25_search, the
                 # chunker keeps chunk_documents_udtf, repetition keeps
                 # doc_repetition)
                 "time_travel_read", "pagerank_copurchase", "cdc_apply"):
        assert name in PRIORITY


def test_oracle_density_in_priority_block():
    """Rows-only entries burn a verdict slot without a hash check; keep
    them to the genuinely non-SQL-expressible few."""
    queries, oracles = registry()
    rows_only = [n for n in PRIORITY if n not in oracles]
    assert set(rows_only) <= {
        "anomaly_isolation_forest",  # ensemble scores
    }
