"""Property-based checks (hypothesis) for the MV router and the BPE
trainer: random inputs, algebraic invariants that must hold for ANY
data — the complement of the fixed-fixture oracle checks.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.plans.mv_router import build_mv, route
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT

# small alphabets force grain collisions (the interesting case)
_rows = st.lists(
    st.tuples(
        st.sampled_from(["d1", "d2", "d3"]),
        st.sampled_from(["A", "B"]),
        st.sampled_from(["x", "y"]),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=30,
)


@pytest.fixture(scope="module")
def spark_m(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, dims=st.sets(st.sampled_from(["day", "flag", "seg"]), max_size=3))
def test_routed_rollup_equals_direct_aggregate(spark_m, rows, dims):
    """For ANY dataset and ANY requested grain that is a subset of the
    MV grain, the routed answer equals aggregating the base directly.
    Integer measures make the equality exact."""
    spark = spark_m
    base = spark.createDataFrame(
        rows, "day STRING, flag STRING, seg STRING, amt BIGINT"
    )
    path = os.path.join(TMP_ROOT, "mv", "prop_router")
    mv = build_mv(
        spark, base, "p", ("day", "flag", "seg"),
        {"amt": ("sum+count", F.col("amt"))}, path,
    )
    want_dims = tuple(sorted(dims))
    routed = route(
        spark, mv, want_dims,
        {"total": ("sum", "amt"), "n": ("count", "amt"), "mean": ("avg", "amt")},
    )
    assert routed is not None
    direct = base.groupBy(*want_dims).agg(
        F.sum("amt").alias("total"),
        F.count("amt").alias("n"),
        (F.sum("amt") / F.count("amt")).alias("mean"),
    )
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, routed.collect())) == sorted(map(key, direct.collect()))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcde ", min_size=2, max_size=40), min_size=1, max_size=6
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
def test_bpe_matches_reference_on_random_corpora(spark_m, texts, n_merges):
    from ecommerce_dataengineering_project_spark.operators.bpe import train_merges
    from tests.test_bpe import _reference_merges

    docs = spark_m.createDataFrame([(t,) for t in texts], "text STRING")
    got = [tuple(r) for r in train_merges(docs, n_merges=n_merges).collect()]
    assert got == _reference_merges(texts, n_merges)
