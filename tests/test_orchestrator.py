"""DAG orchestrator (plans/orchestrator.py): the reference Airflow
DAG's barrier / retry / timeout / failure-propagation / resume
semantics, plus the sales pipeline wired over real engine stages."""

from __future__ import annotations

import time

import pytest

from ecommerce_dataengineering_project_spark.plans.orchestrator import (
    FAILED,
    SUCCESS,
    UPSTREAM_FAILED,
    Dag,
    DagRun,
    Task,
)


def _diamond(calls):
    """start -> {a, b} -> join -> end, each leaf recording its run."""
    dag = Dag("t")
    dag.add(Task("start"))
    dag.add(Task("a", lambda: calls.append("a")))
    dag.add(Task("b", lambda: calls.append("b")))
    dag.add(Task("join"))
    dag.add(Task("end", lambda: calls.append("end")))
    for up, down in [
        ("start", "a"), ("start", "b"), ("a", "join"), ("b", "join"),
        ("join", "end"),
    ]:
        dag.set_downstream(up, down)
    return dag


def test_topo_order_respects_barriers(tmp_path):
    calls: list[str] = []
    dag = _diamond(calls)
    order = dag.topo_order()
    assert order.index("join") > max(order.index("a"), order.index("b"))
    assert order.index("end") > order.index("join")
    states = DagRun(dag, "r1", str(tmp_path)).run()
    assert set(states.values()) == {SUCCESS}
    assert calls == ["a", "b", "end"]


def test_cycle_detection():
    dag = Dag("c")
    dag.add(Task("a"))
    dag.add(Task("b"))
    dag.set_downstream("a", "b")
    dag.set_downstream("b", "a")
    with pytest.raises(ValueError, match="cycle"):
        dag.topo_order()


def test_flaky_task_retries_then_succeeds(tmp_path):
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")

    dag = Dag("t")
    dag.add(Task("flaky", flaky, retries=2))
    states = DagRun(dag, "r1", str(tmp_path)).run()
    assert states == {"flaky": SUCCESS}
    assert attempts["n"] == 3


def test_failure_propagates_but_independent_branch_runs(tmp_path):
    calls: list[str] = []
    dag = Dag("t")
    dag.add(Task("start"))
    dag.add(Task("boom", lambda: 1 / 0))
    dag.add(Task("after_boom", lambda: calls.append("after_boom")))
    dag.add(Task("indep", lambda: calls.append("indep")))
    dag.add(Task("sink", lambda: calls.append("sink")))
    for up, down in [
        ("start", "boom"), ("start", "indep"), ("boom", "after_boom"),
        ("after_boom", "sink"), ("indep", "sink"),
    ]:
        dag.set_downstream(up, down)
    states = DagRun(dag, "r1", str(tmp_path)).run()
    assert states["boom"] == FAILED
    assert states["after_boom"] == UPSTREAM_FAILED
    assert states["sink"] == UPSTREAM_FAILED  # all_success trigger rule
    assert states["indep"] == SUCCESS
    assert calls == ["indep"]


def test_execution_timeout_fails_task(tmp_path):
    dag = Dag("t")
    dag.add(Task("slow", lambda: time.sleep(5), execution_timeout_s=0.2))
    states = DagRun(dag, "r1", str(tmp_path)).run()
    assert states["slow"] == FAILED


def test_resume_reruns_only_unfinished_tasks(tmp_path):
    """The Airflow 'clear failed, rerun the dag_run' loop: the second
    run with the SAME run_id skips succeeded tasks entirely and
    re-executes the failed one and its downstream."""
    calls: list[str] = []
    healthy = {"ok": False}

    def sometimes():
        calls.append("mid")
        if not healthy["ok"]:
            raise RuntimeError("still broken")

    dag = Dag("t")
    dag.add(Task("first", lambda: calls.append("first")))
    dag.add(Task("mid", sometimes))
    dag.add(Task("last", lambda: calls.append("last")))
    dag.set_downstream("first", "mid")
    dag.set_downstream("mid", "last")

    states = DagRun(dag, "r1", str(tmp_path)).run()
    assert states == {"first": SUCCESS, "mid": FAILED, "last": UPSTREAM_FAILED}
    healthy["ok"] = True
    states2 = DagRun(dag, "r1", str(tmp_path)).run()
    assert states2 == {"first": SUCCESS, "mid": SUCCESS, "last": SUCCESS}
    # first ran ONCE across both runs; mid ran in both; last only in run 2
    assert calls == ["first", "mid", "mid", "last"]
    # a fresh run_id starts from scratch
    calls.clear()
    DagRun(dag, "r2", str(tmp_path)).run()
    assert calls == ["first", "mid", "last"]


def test_sales_pipeline_dag_end_to_end(spark, tmp_path):
    """The reference DAG's shape over real engine stages at sf0.001:
    every task succeeds, the gold txlog holds the silver rows, and the
    analytic outputs land."""
    import os

    from ecommerce_dataengineering_project_spark.plans.orchestrator import sales_pipeline_dag
    from ecommerce_dataengineering_project_spark.sources.txlog import TxTable

    out = str(tmp_path / "run")
    dag = sales_pipeline_dag(spark, "/root/testdata/sf0.001", out, run_token="r1")
    states = DagRun(dag, "r1", str(tmp_path / "state")).run()
    assert set(states.values()) == {SUCCESS}, states
    gold = TxTable(os.path.join(out, "gold_tx")).read(spark)
    silver = spark.read.parquet(os.path.join(out, "silver_purchases"))
    assert gold.count() == silver.count() > 0
    assert spark.read.parquet(os.path.join(out, "daily_sales")).count() > 0
    assert spark.read.parquet(os.path.join(out, "fct_purchases")).count() > 0
    # a REPLAY of the same run's promote is a no-op (crash-resume
    # idempotence)...
    dag.tasks["delta_to_iceberg"].fn()
    assert TxTable(os.path.join(out, "gold_tx")).read(spark).count() == gold.count()
    # ...but a FRESH run over the same out_root really appends — a
    # fixed watermark key would make every later run a silent no-op
    dag2 = sales_pipeline_dag(spark, "/root/testdata/sf0.001", out, run_token="r2")
    states2 = DagRun(dag2, "r2", str(tmp_path / "state")).run()
    assert set(states2.values()) == {SUCCESS}, states2
    assert (
        TxTable(os.path.join(out, "gold_tx")).read(spark).count()
        == 2 * gold.count()
    )
