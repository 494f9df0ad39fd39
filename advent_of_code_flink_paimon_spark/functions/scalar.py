"""Flink→Spark scalar-function bridge + engine column helpers.

Rewrites are textual (regex over the SQL string, applied by
plans.Engine.sql before Catalyst parses): mapping to Spark *built-ins*
keeps every expression inside whole-stage codegen — registering Python
UDF shims instead would put a 10-100× row-at-a-time penalty on the hot
path (SURVEY.md §2.10).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

# Flink spelling -> Spark built-in. Only functions whose Flink name or
# signature differs from Spark's; identical names (ABS, CONCAT, COALESCE,
# LOWER/UPPER, ...) pass through to Spark untouched.
FLINK_FN_REWRITES: dict[str, str] = {
    r"\bPROCTIME\s*\(\s*\)": "current_timestamp()",
    r"\bLOCALTIMESTAMP\b(?!\s*\()": "localtimestamp()",
    r"\bCHAR_LENGTH\s*\(": "length(",
    r"\bCHARACTER_LENGTH\s*\(": "length(",
    r"\bLISTAGG\s*\(": "concat_ws(',', collect_list(",  # 1-arg LISTAGG only
    r"\bREGEXP_REPLACE\s*\(": "regexp_replace(",  # same name; kept for docs
}


def rewrite_flink_functions(sql: str) -> str:
    """Apply the dialect bridge to a SQL string (case-insensitive)."""
    for pat, repl in FLINK_FN_REWRITES.items():
        if "LISTAGG" in pat:
            # LISTAGG(x) -> concat_ws(',', collect_list(x)) needs the
            # closing paren doubled; handle via a callback
            sql = re.sub(
                r"\bLISTAGG\s*\(([^()]*)\)",
                r"concat_ws(',', collect_list(\1))",
                sql,
                flags=re.I,
            )
            continue
        sql = re.sub(pat, repl, sql, flags=re.I)
    return sql


def proctime() -> Column:
    """Processing-time column (tutorial/guide.md:26): materialized at
    ingestion (micro-batch) time — SURVEY.md §1.3."""
    return F.current_timestamp()


def time_bucket(width: str, ts: str | Column) -> Column:
    """Hypertable-style time bucket: floor a timestamp to a fixed width
    ('15 seconds', '5 minutes', '1 hour', '1 day'). Pure arithmetic on
    unix µs → stays in codegen; arbitrary widths unlike date_trunc."""
    m = re.match(r"(\d+)\s*(second|minute|hour|day)s?", width.strip(), re.I)
    if not m:
        raise ValueError(f"unsupported bucket width: {width!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    micros = n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit] * 1_000_000
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_micros((F.unix_micros(col) / micros).cast("long") * micros)
