"""IsolationForest tests (SURVEY §2j): determinism, planted-outlier
recall, and the P11/P12 pipeline query."""

from __future__ import annotations

import numpy as np

from ecommerce_dataengineering_project_spark.ml.isolation_forest import IsolationForest


def _cluster_with_outliers(seed: int = 0):
    rng = np.random.default_rng(seed)
    normal = rng.normal(0.0, 1.0, size=(500, 2))
    outliers = np.array([[9.0, 9.0], [-8.0, 10.0], [12.0, -11.0]])
    return np.vstack([normal, outliers])


def test_planted_outliers_flagged():
    X = _cluster_with_outliers()
    forest = IsolationForest(seed=42).fit(X)
    pred = forest.predict(X)
    # the three planted outliers are all flagged...
    assert (pred[-3:] == -1).all()
    # ...and the bulk of the cluster is not (s>0.5 flags ~10% of a
    # tight gaussian — same ballpark as sklearn's 'auto' threshold)
    assert (pred[:-3] == 1).mean() > 0.85


def test_scores_in_range_and_ordered():
    X = _cluster_with_outliers()
    s = IsolationForest(seed=42).fit(X).score_samples(X)
    assert ((s > 0.0) & (s <= 1.0)).all()
    # outliers score strictly higher than the cluster median
    assert s[-3:].min() > np.median(s[:-3])


def test_deterministic_across_fits():
    X = _cluster_with_outliers()
    s1 = IsolationForest(seed=42).fit(X).score_samples(X)
    s2 = IsolationForest(seed=42).fit(X).score_samples(X)
    np.testing.assert_array_equal(s1, s2)
    s3 = IsolationForest(seed=7).fit(X).score_samples(X)
    assert not np.array_equal(s1, s3)


def test_anomaly_query_runs(spark, sf_dir):
    from ecommerce_dataengineering_project_spark.queries.ml_queries import q_anomaly_isolation_forest

    df = q_anomaly_isolation_forest(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "purchase_date",
        "daily_total_sales",
        "daily_transaction_count",
        "anomaly_score",
        "is_anomaly",
    }
    # deterministic across runs (seeded forest over a deterministic agg)
    again = {r.purchase_date: r.anomaly_score for r in q_anomaly_isolation_forest(spark, sf_dir).collect()}
    for r in rows:
        assert again[r.purchase_date] == r.anomaly_score


def test_distributed_scoring_matches_driver_side(spark, sf_dir):
    """The broadcast-model mapInPandas arm (VERDICT r5 item 6) must be
    row-for-row equal to the driver-side fit+score path — same forest,
    same features, scoring moved executor-side for the case where the
    scored relation is too large to collect."""
    from ecommerce_dataengineering_project_spark.queries.ml_queries import (
        q_anomaly_isolation_forest,
        q_anomaly_scores_distributed,
    )

    drv = {
        r.purchase_date: (r.anomaly_score, r.is_anomaly)
        for r in q_anomaly_isolation_forest(spark, sf_dir).collect()
    }
    dist = q_anomaly_scores_distributed(spark, sf_dir).collect()
    assert len(dist) == len(drv)
    for r in dist:
        assert drv[r.purchase_date] == (r.anomaly_score, r.is_anomaly)


def test_scores_match_golden_file():
    """Golden pin (VERDICT r6 item 6): within-run determinism can't
    catch a refactor that changes the tree-building arithmetic for
    EVERY run; these scores were frozen at r7 and any diff means the
    forest's behavior changed — regenerate the golden only for a
    deliberate, documented algorithm change."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "isolation_forest_scores.json")
    with open(path) as fh:
        golden = json.load(fh)
    rng = np.random.default_rng(golden["gen_seed"])
    normal = rng.normal(0.0, 1.0, size=(golden["n_normal"], 2))
    outliers = np.array([[9.0, 9.0], [-8.0, 10.0], [12.0, -11.0]])
    X = np.vstack([normal, outliers])
    s = IsolationForest(seed=golden["seed"]).fit(X).score_samples(X)
    np.testing.assert_allclose(s, np.array(golden["scores"]), rtol=0, atol=1e-9)
