"""Flink→Spark scalar-function bridge + engine column helpers.

Rewrites are textual (regex over the SQL string, applied by
plans.Engine.sql before Catalyst parses): mapping to Spark *built-ins*
keeps every expression inside whole-stage codegen — registering Python
UDF shims instead would put a 10-100× row-at-a-time penalty on the hot
path (SURVEY.md §2.10). Single-quoted string literals are masked before
rewriting so function names INSIDE data values are never corrupted.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

# Flink spelling -> Spark built-in. Only functions whose Flink name or
# signature differs from Spark's; identical names (ABS, CONCAT, COALESCE,
# LOWER/UPPER, ...) pass through to Spark untouched. LISTAGG is handled
# separately (balanced-paren argument parsing).
FLINK_FN_REWRITES: dict[str, str] = {
    r"\bPROCTIME\s*\(\s*\)": "current_timestamp()",
    r"\bLOCALTIMESTAMP\b(?!\s*\()": "localtimestamp()",
    r"\bCHAR_LENGTH\s*\(": "length(",
    r"\bCHARACTER_LENGTH\s*\(": "length(",
    r"\bREGEXP_REPLACE\s*\(": "regexp_replace(",  # same name; kept for docs
}

_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _split_args(body: str) -> list[str]:
    """Split a call's argument list on top-level commas."""
    depth, cur, out = 0, [], []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [a.strip() for a in out]


def _rewrite_listagg(sql: str) -> str:
    """LISTAGG(expr[, sep]) → concat_ws(sep, collect_list(expr)), with
    balanced-paren scanning so nested calls (LISTAGG(TRIM(x))) and the
    2-argument separator form both rewrite correctly."""
    out = []
    i = 0
    pat = re.compile(r"\bLISTAGG\s*\(", re.I)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i : m.start()])
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        args = _split_args(sql[m.end() : j - 1])
        sep = args[1] if len(args) > 1 else "','"
        out.append(f"concat_ws({sep}, collect_list({args[0]}))")
        i = j


def rewrite_flink_functions(sql: str) -> str:
    """Apply the dialect bridge to a SQL string (case-insensitive).
    String literals are masked first: a value like 'call CHAR_LENGTH(x)'
    is DATA and must survive the rewrite byte-for-byte."""
    literals: list[str] = []

    def _mask(m):
        literals.append(m.group(0))
        return f"\x00L{len(literals) - 1}\x00"

    masked = _LITERAL.sub(_mask, sql)
    for pat, repl in FLINK_FN_REWRITES.items():
        masked = re.sub(pat, repl, masked, flags=re.I)
    masked = _rewrite_listagg(masked)
    return re.sub(r"\x00L(\d+)\x00", lambda m: literals[int(m.group(1))], masked)


def proctime() -> Column:
    """Processing-time column (tutorial/guide.md:26): materialized at
    ingestion (micro-batch) time — SURVEY.md §1.3."""
    return F.current_timestamp()


def time_bucket(width: str, ts: str | Column) -> Column:
    """Hypertable-style time bucket: floor a timestamp to a fixed width
    ('15 seconds', '5 minutes', '1 hour', '1 day'). Pure arithmetic on
    unix µs → stays in codegen; arbitrary widths unlike date_trunc.
    Floor via pmod subtraction (always non-negative), NOT a truncating
    long cast — truncation buckets pre-1970 timestamps to the FOLLOWING
    boundary."""
    m = re.match(r"(\d+)\s*(second|minute|hour|day)s?", width.strip(), re.I)
    if not m:
        raise ValueError(f"unsupported bucket width: {width!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    micros = n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit] * 1_000_000
    col = F.col(ts) if isinstance(ts, str) else ts
    us = F.unix_micros(col)
    return F.timestamp_micros(us - F.pmod(us, F.lit(micros)))
