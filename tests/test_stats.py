"""Sketch accuracy bounds (X5) and CSV source/sink round trip (S2/K5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ecommerce_dataengineering_project_spark.queries.ext_stats import (
    q_approx_distinct_quantiles,
    q_exact_distinct_quantiles,
)
from ecommerce_dataengineering_project_spark.sources.readers import read_csv
from ecommerce_dataengineering_project_spark.sources.writers import write_csv


def test_sketches_exact_inside_windows(spark, sf_dir):
    # the registered query runs inside BOTH exactness windows (coupon
    # phase on suppliers, GK accuracy >= n — see the query docstring),
    # so its values EQUAL the exact statistics; preconditions are
    # guarded per-decade in tests/test_exactness_windows.py
    from pyspark.sql import functions as F
    from ecommerce_dataengineering_project_spark.sources.readers import load_table

    approx = {r.l_returnflag: r for r in q_approx_distinct_quantiles(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.median("l_quantity").alias("median_qty"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, e in exact.items():
        a = approx[flag]
        assert a.approx_suppliers == e.n_suppliers, flag
        # GK's rank-pick ceil(0.5*n) equals the lower-median element;
        # F.median interpolates on even n — the two agree within one
        # quantity step and exactly on odd n
        assert abs(a.approx_median_qty - e.median_qty) <= 1, flag


def test_sketches_below_window_still_bounded(spark, sf_dir):
    # the PRODUCTION parameters (default GK accuracy 10k, default HLL++
    # rsd) sit below the exactness windows at scale — pin their
    # approximation quality so the window isn't hiding a broken sketch
    from pyspark.sql import functions as F
    from ecommerce_dataengineering_project_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty"),
        )
        .collect()
    }
    exact = {r.l_returnflag: r for r in q_exact_distinct_quantiles(spark, sf_dir).collect()}
    assert approx.keys() == exact.keys()
    for flag, e in exact.items():
        a = approx[flag]
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(a.approx_orders - e.n_orders) <= 0.15 * e.n_orders, flag
        # GK median within the integer-quantity neighborhood
        assert abs(a.approx_median_qty - e.median_qty) <= 2, flag


def test_csv_source_sink_roundtrip(spark, tmp_path):
    """S2 (schema-declared CSV read, producer.py:82-113 casts) and K5
    (CSV results sink, anomaly_detection.py:56-60)."""
    schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("price", DoubleType()),
            StructField("inventory_level", IntegerType()),
        ]
    )
    src = str(tmp_path / "products_csv")
    df = spark.createDataFrame(
        [("CS01", 4.99, 75), ("SF01", 5.99, 50), ("IS04", 5.49, 60)], schema
    )
    write_csv(df, src)
    back = read_csv(spark, src, schema)
    assert back.schema == schema
    rows = {r.product_id: r for r in back.collect()}
    assert rows["CS01"].price == 4.99 and rows["SF01"].inventory_level == 50
    # declared-schema casts survive the text round trip (bool/int/double
    # were hand-cast in the reference producer; here the schema does it)
    assert back.where(F.col("inventory_level").isNull()).count() == 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    """operators/skew.py salted_join produces exactly the plain join."""
    from ecommerce_dataengineering_project_spark.operators.skew import salted_join
    from ecommerce_dataengineering_project_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    plain = ev.join(cust, ["user_id"]).select("event_id", "user_id", "c_name")
    salted = salted_join(ev, cust, ["user_id"]).select("event_id", "user_id", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_kafka_builders_configured(spark):
    """S1/K1 builders carry the reference's exact options (no broker in
    this environment — construction only, load()/save() deferred)."""
    from ecommerce_dataengineering_project_spark.streaming.bronze_silver import to_kafka_shape
    from ecommerce_dataengineering_project_spark.streaming.kafka_io import (
        kafka_batch_writer,
        kafka_stream_reader,
    )

    class FakeReader:
        def __init__(self):
            self.opts = {}
            self.fmt = None

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

    class FakeSession:
        readStream = FakeReader()

    reader = kafka_stream_reader(
        FakeSession(), "broker:9092", "demo.purchases", sasl_jaas="jaas-config"
    )
    assert reader.fmt == "kafka"
    assert reader.opts["subscribe"] == "demo.purchases"
    assert reader.opts["startingOffsets"] == "earliest"
    assert reader.opts["failOnDataLoss"] == "false"
    assert reader.opts["kafka.security.protocol"] == "SASL_SSL"

    shaped = to_kafka_shape(spark.createDataFrame([(1, "x")], "a int, b string"))
    assert shaped.columns == ["value"]
    writer = kafka_batch_writer(shaped, "broker:9092", "demo.purchases")
    assert writer is not None


def test_subsequence_match_reference_and_flat_window(spark):
    """subsequence_match vs a pure-Python z-norm/distance reference,
    including a FLAT window (zero variance -> znorm 0.0, the UCR
    convention) which must score as distance to the z-normed pattern
    alone."""
    import math

    from ecommerce_dataengineering_project_spark.operators.timeseries import (
        subsequence_match,
    )

    vals = [5, 5, 5, 1, 9, 2, 8, 3, 7, 4]  # first window (len 3) is flat
    series = spark.createDataFrame(
        [(f"2024-01-{d + 1:02d}", v) for d, v in enumerate(vals)],
        "day STRING, n_orders BIGINT",
    ).selectExpr("CAST(day AS DATE) AS day", "n_orders")
    pattern = [1.0, 2.0, 4.0]
    got = {
        str(r.start_day): (r.distance, r.rank)
        for r in subsequence_match(series, pattern, k=len(vals)).collect()
    }

    def znorm(w):
        m = sum(w) / len(w)
        sd = math.sqrt(sum((x - m) ** 2 for x in w) / len(w))
        return [0.0] * len(w) if sd == 0 else [(x - m) / sd for x in w]

    zp = znorm(pattern)
    want = []
    for i in range(len(vals) - len(pattern) + 1):
        zw = znorm([float(x) for x in vals[i : i + len(pattern)]])
        d = math.sqrt(sum((a - b) ** 2 for a, b in zip(zw, zp)))
        want.append((f"2024-01-{i + 1:02d}", math.floor(d * 1e6 + 0.5) / 1e6))
    want.sort(key=lambda t: (t[1], t[0]))
    assert len(got) == len(want)
    for rank, (day, dist) in enumerate(want, 1):
        assert got[day] == (dist, rank), (day, got[day], dist, rank)
    # the flat window's distance is ||zp|| (znorm(w) == 0 vector)
    flat = math.floor(math.sqrt(sum(z * z for z in zp)) * 1e6 + 0.5) / 1e6
    assert got["2024-01-01"][0] == flat


def test_salted_join_refuses_small_side_outer(spark):
    """right/full outer would emit each unmatched small-side row once
    per salt copy — refused; left outer stays exactly equivalent."""
    from ecommerce_dataengineering_project_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k BIGINT, b STRING")
    small = spark.createDataFrame([(1, "m"), (42, "u")], "k BIGINT, s STRING")
    with pytest.raises(ValueError, match="duplicate unmatched"):
        salted_join(big, small, ["k"], how="full")
    with pytest.raises(ValueError, match="duplicate unmatched"):
        salted_join(big, small, ["k"], how="right")
    got = sorted(
        map(tuple, salted_join(big, small, ["k"], n_salts=4, how="left").collect())
    )
    want = sorted(map(tuple, big.join(small, ["k"], "left").collect()))
    assert got == want


def test_histogram_fixed_handles_constant_column(spark):
    """A constant column (max == min) must produce one bin, not an
    ANSI divide-by-zero."""
    from ecommerce_dataengineering_project_spark.operators.timeseries import (
        histogram_fixed,
    )

    df = spark.range(10).selectExpr("CAST(49.99 AS DOUBLE) AS v")
    got = histogram_fixed(df, "v", 10).collect()
    assert len(got) == 1 and got[0].bin == 0 and got[0].n_rows == 10


def test_connected_components_handles_hash_scale_ids(spark):
    """Convergence detection must not SUM hash60-scale labels (int64
    overflow raises under ANSI at >=16 nodes)."""
    from ecommerce_dataengineering_project_spark.operators.dedup import (
        connected_components,
    )

    base = (1 << 59)
    edges = spark.createDataFrame(
        [(base + i, base + i + 1) for i in range(20)], "id_a BIGINT, id_b BIGINT"
    )
    nodes = spark.createDataFrame(
        [(base + i,) for i in range(21)], "doc_id BIGINT"
    )
    got = connected_components(edges, nodes, max_rounds=30).collect()
    clusters = {r.cluster_id for r in got}
    assert clusters == {base}  # one chain, one component, min-label root
