"""Local replica of the driver's correctness gate: run each registered
query in Spark AND its oracle SQL in DuckDB, compare row count, column
names, and (order-insensitively) values.

Floats compare with a small relative tolerance here; the driver hashes
values exactly, so queries are written to be exactly reproducible (see
queries/core.py float policy) — the tolerance only localizes a failure
to "value drift" vs "wrong rows".
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def _duck_canon(t: str) -> str:
    """Canonical dtype group for a DuckDB column type string."""
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    ints = {
        "TINYINT": "INT8",
        "SMALLINT": "INT16",
        "INTEGER": "INT32",
        "INT": "INT32",
        "BIGINT": "INT64",
        "HUGEINT": "INT128",
        "UTINYINT": "UINT8",
        "USMALLINT": "UINT16",
        "UINTEGER": "UINT32",
        "UBIGINT": "UINT64",
    }
    if t in ints:
        return ints[t]
    if t == "DOUBLE":
        return "FLOAT64"
    if t in ("FLOAT", "REAL"):
        return "FLOAT32"
    if t == "VARCHAR":
        return "STRING"
    if t == "BOOLEAN":
        return "BOOL"
    if t == "DATE":
        return "DATE"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t


def _spark_canon(dt) -> str:
    """Canonical dtype group for a Spark data type (same vocabulary)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "INT8"
    if isinstance(dt, T.ShortType):
        return "INT16"
    if isinstance(dt, T.IntegerType):
        return "INT32"
    if isinstance(dt, T.LongType):
        return "INT64"
    if isinstance(dt, T.FloatType):
        return "FLOAT32"
    if isinstance(dt, T.DoubleType):
        return "FLOAT64"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.BooleanType):
        return "BOOL"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.DecimalType):
        return "DECIMAL"
    return dt.simpleString().upper()


def dtype_errors(spark_df, rel) -> list[str]:
    """The driver's value hash is TYPE-sensitive (it canonicalizes through
    pandas): a value-identical result with DuckDB HUGEINT vs Spark bigint
    hash-mismatches (r4's `funnel_conversion`).  Compare the oracle
    relation's declared column types against the Spark schema so int-width
    / decimal drift fails locally first.
    """
    errors: list[str] = []
    s_types = {f.name.lower(): f.dataType for f in spark_df.schema.fields}
    for col, dtype in zip(rel.columns, rel.types):
        s_dt = s_types.get(col.lower())
        if s_dt is None:
            continue  # column-set mismatch is reported separately
        sc, oc = _spark_canon(s_dt), _duck_canon(dtype)
        if sc != oc:
            errors.append(
                f"column {col}: dtype mismatch spark={sc} oracle={oc} "
                f"(driver hash is type-sensitive — cast the oracle)"
            )
    return errors


def compare(spark_df, con, sql: str, float_rel: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    # The driver canonicalizes via pandas sort_values, which cannot hash
    # list cells — any array/map/struct output column fails its gate even
    # though this harness could tuple-ize it. Reject up front so the
    # mismatch surfaces locally first.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            errors.append(
                f"column {f.name} has driver-unhashable type {f.dataType.simpleString()}"
            )
    if errors:
        return errors
    oracle = con.sql(sql)
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    errors.extend(dtype_errors(spark_df, oracle))
    if errors:
        return errors

    s_rows = [tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()]
    o_idx = {c.lower(): i for i, c in enumerate(oracle.columns)}
    o_rows = [
        tuple(_norm(t[o_idx[c.lower()]]) for c in s_cols) for t in oracle.fetchall()
    ]
    if len(s_rows) != len(o_rows):
        errors.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return errors

    s_rows.sort(key=_sort_key)
    o_rows.sort(key=_sort_key)
    n_bad = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, sv, ov in zip(s_cols, sr, orow):
            if sv is None and ov is None:
                continue
            ok = sv == ov
            if not ok and isinstance(sv, float) and isinstance(ov, float):
                ok = math.isclose(sv, ov, rel_tol=float_rel, abs_tol=1e-9)
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    errors.append(f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
    if n_bad > 5:
        errors.append(f"... {n_bad} mismatched cells total")
    return errors
