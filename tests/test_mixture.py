"""Behavior tests for operators/sampling.py mixture_resample — the
oracle-parity sweep checks fixture bit-parity; these pin the mixture
semantics on constructed frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.sampling import mixture_resample


def _docs(spark, spec: dict[str, int]):
    rows, i = [], 0
    for lang, n in sorted(spec.items()):
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_rates_follow_target_shares(spark):
    # 800 en / 100 fr / 100 de, uniform target (333 each):
    # en rate = (333*1000) div 800 = 416; fr/de = min(1000, 3330) = 1000
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        mixture_rates,
    )

    df = _docs(spark, {"en": 800, "fr": 100, "de": 100})
    out = mixture_resample(df, ["doc_id"], "lang", {"en": 333, "fr": 333, "de": 333})
    # the sampler's output is input-schema rows (no internal columns)
    assert out.columns == df.columns
    rates = {
        r["__s"]: r["rate_permille"]
        for r in mixture_rates(
            df, "lang", {"en": 333, "fr": 333, "de": 333}
        ).collect()
    }
    assert rates == {"en": 416, "fr": 1000, "de": 1000}
    kept = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    # under-represented strata keep everything (never upsampled)
    assert by_lang["fr"] == 100 and by_lang["de"] == 100
    # dominant stratum is cut to roughly its target share of the pool
    assert 250 <= by_lang["en"] <= 420


def test_missing_stratum_dropped_and_determinism(spark):
    df = _docs(spark, {"en": 50, "xx": 20})
    out = mixture_resample(df, ["doc_id"], "lang", {"en": 1000})
    assert out.where(F.col("lang") == "xx").count() == 0
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and len(a) == 50  # en at/below target keeps all


def test_reservoir_exact_k_counts_and_partial_topk_plan(spark, sf_dir):
    """reservoir_exact_k: exactly min(k, n_s) per stratum, and the
    rank<=k filter must compile to WindowGroupLimit (map-side partial
    top-k before the stratum exchange — the 100 TB shape)."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        reservoir_exact_k,
    )
    from ecommerce_dataengineering_project_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    k = 7
    got = reservoir_exact_k(docs, ["doc_id"], "lang", k)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    counts = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {lang: min(k, n) for lang, n in full.items()}
    # reproducible under any partitioning
    again = reservoir_exact_k(docs.repartition(13), ["doc_id"], "lang", k)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
