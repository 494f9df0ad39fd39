"""Event-time windowed operators over streams (SURVEY.md §2.9 extension).

The reference is purely processing-time (PROCTIME(), tutorial/guide.md:26;
no WATERMARK clause anywhere), so none of this is parity surface — it is
the Spark-native event-time layer a sensor/event workload needs once late
data matters: watermarked tumbling/sliding/session windows, stream dedup
within a watermark, and a custom stateful per-key operator
(applyInPandasWithState) for semantics the built-ins can't express.

Scale notes: every windowed agg below is a keyed-state streaming agg —
state is partitioned by (key, window) across executors, watermarks bound
state size, and the shuffle carries partial aggregates. The stateful
EWMA keeps O(1) state per key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup: count + sum(value) per
    (window, keys). Late rows beyond the watermark are dropped; closed
    windows emit finalized rows in append mode."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *key_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked sliding-window rollup (window/slide)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), *key_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Session windows with an idle gap — the streaming twin of the
    batch q34_sessionize (operators/temporal.py)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *key_cols,
            "n_events",
        )
    )


def dedup_within_watermark(df: DataFrame, keys: list[str], ts_col: str, watermark: str = "2 minutes") -> DataFrame:
    """Stream dedup: first occurrence per key wins; duplicate arrivals
    within the watermark horizon are dropped, state expires with the
    watermark (bounded memory — the streaming form of exact dedup,
    SURVEY.md §2.11)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "2 minutes",
    within: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: rows match when their
    event times are within ``within`` of each other. Both sides buffer
    keyed state; the watermark + interval bound lets Spark evict state,
    so memory stays proportional to the interval, not the stream
    (SURVEY.md §2.9 extension — no reference analog, Flink's interval
    join equivalent)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # bounds via QUALIFIED column refs: an F.expr string naming the
    # timestamp column is ambiguous when both streams share the column
    # name (the natural case for homogeneous event streams)
    iv = F.expr(f"interval {within}")
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts] - iv)
        & (rw[right_ts] <= lw[left_ts] + iv)
    )
    return lw.join(rw, cond, how)


def stateful_ewma(
    df: DataFrame,
    key_col: str = "sensor_id",
    value_col: str = "reading",
    ts_col: str = "event_time",
    alpha: float = 0.3,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Custom stateful per-key operator: exponentially-weighted moving
    average of a sensor reading, via applyInPandasWithState. State is one
    (ewma, n) pair per key — O(1); each micro-batch folds its rows in
    event-time order and emits the updated value.

    The reference has no custom stateful surface; this demonstrates the
    engine's escape hatch for operators Spark lacks (charter: custom
    stateful streaming ops)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # key column keeps ITS declared type (a hardcoded 'long' would break
    # string/other keys at runtime with a per-batch schema mismatch)
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, ewma double, n_seen long"
    state_schema = "ewma double, n_seen long"

    def fold(key, pdfs, state):
        import pandas as pd

        ewma, n = state.get if state.exists else (None, 0)
        # one frame per group, sorted ONCE: per-chunk sorting folds
        # chunks in shuffle-arrival order when a key's micro-batch rows
        # span multiple Arrow batches (rows > arrow.maxRecordsPerBatch),
        # and this fold is order-sensitive — the bit-exact oracle
        # contract (x144) requires the global ts order DuckDB's
        # list_reduce replays (the changelog_normalize pattern,
        # round-6 ADVICE #2 / round-16 ADVICE #1)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="stable"
        )
        for v in pdf[value_col].astype("float64"):
            ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
            n += 1
        state.update((float(ewma), int(n)))
        yield pd.DataFrame({key_col: [key[0]], "ewma": [ewma], "n_seen": [n]})

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def changelog_normalize(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    order_col: str | None = None,
    row_deduplicate: bool = False,
) -> DataFrame:
    """Changelog-normalize: turn a POST-IMAGE upsert stream (op ∈
    {'+U', '-D'}, no pre-images — exactly what ``stream_table_upsert``
    emits for a changelog-less PK table) into a full +I/-U/+U/-D
    changelog, via one last-known-row state per key
    (applyInPandasWithState). This is the operator the reference's
    planner inserts under upsert sources when no stored changelog
    exists (the 'ChangelogNormalize' node SURVEY.md §2.9 cites;
    tutorial/guide.md:69-74 motivates the stored-changelog fast path
    precisely by the cost of this state), offered here as the explicit
    escape hatch for consumers of changelog-less tables.

    - first '+U' for a key -> '+I' (and the row becomes state)
    - later '+U' -> '-U' with the REMEMBERED pre-image, then '+U'
      (``row_deduplicate=True`` drops the pair when values are equal,
      mirroring 'changelog-producer.row-deduplicate')
    - '-D' -> '-D' carrying the remembered image; unknown-key deletes
      emit nothing (the same no-op rule the table's own producer uses)

    ``order_col`` (e.g. the commit sequence from
    ``stream_table_upsert(..., include_seq=True)``) orders rows across
    the key's WHOLE micro-batch — the group's Arrow chunks are
    materialized and sorted once before folding, so two commits landing
    in one trigger fold in commit order even when the key's rows span
    multiple Arrow batches (round-6 ADVICE #2). State is O(live keys)
    like every normalize operator, held NATIVELY (one struct field per
    value column, the stream's own Spark types — timestamps, dates,
    decimals and binary round-trip; round-6 ADVICE #4 replaced a
    json.dumps state that raised on them); at 100 TB the state store
    shards by the same key hash the groupBy shuffles on."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in key_cols + value_cols] + ["_change_type string"]
    )
    out_cols = key_cols + value_cols + ["_change_type"]
    state_schema = ", ".join(f"{c} {fields[c]}" for c in value_cols)

    def fold(key, pdfs, state):
        import pandas as pd

        def norm(v):
            if v is None:
                return None
            if getattr(v, "ndim", 0):
                # numpy arrays (array-typed value columns): pd.isna is
                # ambiguous and .item() raises for size != 1 — hand the
                # state layer a plain list (round-7 ADVICE #2)
                return v.tolist()
            try:
                if pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass  # other non-scalars: pd.isna is ambiguous
            return v.item() if hasattr(v, "item") else v

        # one frame per group: per-chunk sorting would fold commits in
        # arbitrary cross-chunk order for keys spanning Arrow batches
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if order_col:
            pdf = pdf.sort_values(order_col, kind="stable")
        last = [norm(v) for v in state.get] if state.exists else None
        out = []
        for row in pdf.to_dict("records"):
            vals = [norm(row[c]) for c in value_cols]
            if row["op"] == "-D":
                if last is not None:
                    out.append(list(key) + last + ["-D"])
                    last = None
            else:
                if last is None:
                    out.append(list(key) + vals + ["+I"])
                elif not (row_deduplicate and vals == last):
                    out.append(list(key) + last + ["-U"])
                    out.append(list(key) + vals + ["+U"])
                last = vals
        if last is None:
            if state.exists:
                state.remove()
        else:
            state.update(tuple(last))
        yield pd.DataFrame(out, columns=out_cols)

    return df.groupBy(*key_cols).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
