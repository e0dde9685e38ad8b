"""Materialized-aggregate ROUTING (SURVEY §2k X25) — serve a query from
a coarser pre-aggregate instead of the base fact table.

X22 (`operators/aggregates.py mergeable_partials`) maintains a
materialized aggregate incrementally; this module adds the other half
of a real MV system: given a REQUEST (dims + measures), decide whether
a registered MV can answer it, and if so rewrite the query to scan the
MV with a compensating roll-up — the reference's dbt marts
(`models/fct_purchases.sql`, daily marts) are exactly such
pre-aggregates, routed to by hand today.

Routing rules (classical aggregate-rewrite correctness, e.g. Goldstein
& Larson, SIGMOD'01 — public literature):

- requested dims must be a SUBSET of the MV's grain (roll-up only;
  a finer grain cannot be reconstructed from a coarser one);
- every requested measure must be derivable from stored PARTIALS:
  SUM from a sum partial, COUNT from a count partial, AVG = sum/count
  (never an avg-of-avgs — the router refuses if only an average was
  stored);
- a non-routable request returns None and the caller falls back to
  the base table — the router never guesses.

Scale: this is the 100-TB lever that turns a full-fact scan into a
scan of |distinct grain| rows. Partials are algebraic (mergeable), so
the MV itself is maintained map-side / incrementally (X22) and every
roll-up here is one small exchange on the requested dims — or ZERO
exchanges on the grain fast path (dims == grain: the MV rows are
already unique; the plan is scan+project, pinned in
tests/test_mv_router.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SUM = "sum"
COUNT = "count"
AVG = "avg"


@dataclass(frozen=True)
class MaterializedAggregate:
    """A registered MV: parquet at ``path``, one row per ``dims``
    combination, holding ``partials`` (measure -> partial kinds
    stored; column names are ``{measure}__sum`` / ``{measure}__count``).
    ``n_rows`` is the materialized row count — the router's cost
    statistic (an MV's scan cost IS its grain cardinality)."""

    name: str
    dims: tuple[str, ...]
    partials: dict[str, frozenset] = field(hash=False)
    path: str = ""
    n_rows: int = -1


def build_mv(
    spark: SparkSession,
    base: DataFrame,
    name: str,
    dims: tuple[str, ...],
    measures: dict[str, tuple[str, Column]],
    path: str,
) -> MaterializedAggregate:
    """Materialize ``base`` at ``dims`` grain with algebraic partials.

    ``measures`` maps a measure name to (kinds, input expression) where
    kinds is "sum", "count", or "sum+count" (what AVG routing needs).
    """
    aggs: list[Column] = []
    partials: dict[str, frozenset] = {}
    for out, (kinds, expr) in measures.items():
        kindset = frozenset(kinds.split("+"))
        partials[out] = kindset
        if SUM in kindset:
            aggs.append(F.sum(expr).alias(f"{out}__sum"))
        if COUNT in kindset:
            aggs.append(F.count(expr).alias(f"{out}__count"))
    if not aggs:
        raise ValueError("MV needs at least one measure")
    base.groupBy(*dims).agg(*aggs).write.mode("overwrite").parquet(path)
    # metadata-only count (parquet footer row counts) — the router's
    # cost statistic, captured once at build time. Read driver-side
    # from the footers the write just produced: a Spark count() job
    # here paid scheduling for a number the files already carry (at
    # 100 TB the same statistic comes from the table format's
    # manifest). Falls back to the engine count for any layout the
    # footer walk can't read.
    try:
        import glob as _glob

        import pyarrow.parquet as _pq

        # bind the glob first: an empty match (URI-style path, remote
        # FS, unexpected part naming) must take the count() fallback,
        # not silently report 0 rows and win every routing comparison
        files = _glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            raise FileNotFoundError(f"no parquet footers under {path}")
        n_rows = sum(_pq.read_metadata(f).num_rows for f in files)
    except Exception:
        n_rows = spark.read.parquet(path).count()
    return MaterializedAggregate(
        name=name, dims=dims, partials=partials, path=path, n_rows=n_rows
    )


def route(
    spark: SparkSession,
    mv: MaterializedAggregate,
    dims: tuple[str, ...],
    measures: dict[str, tuple[str, str]],
) -> DataFrame | None:
    """Answer (dims, measures) from ``mv`` or return None.

    ``measures`` maps output column name -> (agg kind, measure name in
    the MV). Kind "avg" requires both sum and count partials.
    """
    if not set(dims) <= set(mv.dims):
        return None  # would need a finer grain than the MV keeps
    for _out, (kind, m) in measures.items():
        have = mv.partials.get(m, frozenset())
        need = {SUM: {SUM}, COUNT: {COUNT}, AVG: {SUM, COUNT}}.get(kind)
        if need is None or not need <= have:
            return None  # not derivable from stored partials
    scan = spark.read.parquet(mv.path)
    if tuple(dims) == mv.dims:
        # grain fast path: MV rows are already unique per dims — no
        # re-aggregation, scan+project only (zero exchanges)
        cols = [F.col(d) for d in dims]
        for out, (kind, m) in measures.items():
            cols.append(_finalize_at_grain(kind, m).alias(out))
        return scan.select(*cols)
    aggs = []
    for out, (kind, m) in measures.items():
        aggs.append(_rollup(kind, m).alias(out))
    return scan.groupBy(*dims).agg(*aggs)


def _finalize_at_grain(kind: str, m: str) -> Column:
    if kind == SUM:
        return F.col(f"{m}__sum")
    if kind == COUNT:
        return F.col(f"{m}__count")
    return F.col(f"{m}__sum") / F.col(f"{m}__count")


def _rollup(kind: str, m: str) -> Column:
    if kind == SUM:
        return F.sum(f"{m}__sum")
    if kind == COUNT:
        return F.sum(f"{m}__count")
    # AVG: re-derive from rolled-up partials — never an avg of avgs
    return F.sum(f"{m}__sum") / F.sum(f"{m}__count")


def route_best(
    spark: SparkSession,
    mvs: list[MaterializedAggregate],
    dims: tuple[str, ...],
    measures: dict[str, tuple[str, str]],
) -> tuple[DataFrame, MaterializedAggregate] | None:
    """Pick the CHEAPEST qualifying MV for a request — the optimizer
    decision a real MV system makes when several pre-aggregates could
    answer: every qualifying candidate is correct (the roll-up rules
    guarantee it), so cost decides, and an MV's scan cost is its grain
    cardinality (``n_rows``, captured at build). Returns (plan, chosen)
    or None when no registered MV qualifies — the caller falls back to
    the base table. Ties break on name for determinism."""
    best: tuple[int, str, DataFrame, MaterializedAggregate] | None = None
    for mv in mvs:
        plan = route(spark, mv, dims, measures)
        if plan is None:
            continue
        key = (mv.n_rows if mv.n_rows >= 0 else 2**62, mv.name)
        if best is None or key < (best[0], best[1]):
            best = (key[0], key[1], plan, mv)
    if best is None:
        return None
    return best[2], best[3]
