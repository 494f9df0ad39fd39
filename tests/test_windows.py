"""Event-time window behavioral tests (streaming/windows.py).

Each operator runs over a deterministic bounded stream (file source +
availableNow) into a memory sink, then the finalized windows are checked
against a batch-computed expectation on the same rows — the streaming
answer must equal the batch answer once the watermark closes everything.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from advent_of_code_flink_paimon_spark.streaming import (
    dedup_within_watermark,
    session_agg,
    stateful_ewma,
    tumbling_agg,
)

DDL = "sensor_id long, value double, ts timestamp"


@pytest.fixture()
def event_stream(spark, tmp_path):
    """120 deterministic rows over 4 minutes, 3 sensors, written to
    parquet and replayed as a 2-file stream so multiple micro-batches
    advance the watermark."""
    rows = [
        (i % 3, float(i), f"2024-01-01 00:0{i // 30}:{i % 30:02d}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "sensor_id long, value double, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(src)
    )
    return df, stream


def _run_to_memory(stream_df, name, tmp_path, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_window_matches_batch(spark, event_stream, tmp_path):
    df, stream = event_stream
    _run_to_memory(
        tumbling_agg(stream, "ts", ["sensor_id"], window="1 minute", watermark="0 seconds"),
        "tumbling",
        tmp_path,
    )
    got = {
        (r.window_start, r.sensor_id): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    expected = {
        (r.ws, r.sensor_id): (r.n, r.sv)
        for r in df.groupBy(
            F.date_trunc("minute", "ts").alias("ws"), "sensor_id"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch answer exactly, and most must emit
    assert got and all(got[k] == expected[k] for k in got)
    assert len(got) >= len(expected) - 3  # last windows may stay open


def test_session_window_counts(spark, event_stream, tmp_path):
    df, stream = event_stream
    _run_to_memory(
        session_agg(stream, "ts", ["sensor_id"], gap="5 seconds", watermark="0 seconds"),
        "sessions",
        tmp_path,
    )
    out = spark.sql("SELECT * FROM sessions")
    # each sensor fires every 3 s (gap 5 s never splits) → one session
    # per sensor per emitted horizon; total events conserved for closed sessions
    assert out.count() > 0
    assert out.filter("session_end <= session_start").count() == 0
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total <= df.count()


def test_dedup_within_watermark(spark, tmp_path):
    rows = [(i % 10, 1.0, "2024-01-01 00:00:%02d" % (i % 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "sensor_id long, value double, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "dsrc")
    df.write.parquet(src)
    stream = spark.readStream.schema(DDL).parquet(src)
    _run_to_memory(
        dedup_within_watermark(stream, ["sensor_id"], "ts", watermark="10 minutes"),
        "deduped",
        tmp_path,
    )
    out = spark.sql("SELECT * FROM deduped")
    assert out.count() == 10  # one per key
    assert out.select("sensor_id").distinct().count() == 10


def test_stateful_ewma_converges(spark, event_stream, tmp_path):
    # single-file source → one micro-batch: the fold sees all rows in ts
    # order (across micro-batches, arrival order is source order, and the
    # 2-file fixture interleaves time ranges)
    df, _ = event_stream
    src = str(tmp_path / "ewma-src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(DDL).parquet(src)
    _run_to_memory(
        stateful_ewma(stream, key_col="sensor_id", value_col="value", ts_col="ts", alpha=0.5),
        "ewma",
        tmp_path,
        output_mode="update",
    )
    out = spark.sql("SELECT * FROM ewma")
    # update mode: last row per key is the final state; n_seen sums to 40 each
    final = {r.sensor_id: (r.ewma, r.n_seen) for r in out.orderBy("n_seen").collect()}
    assert set(final) == {0, 1, 2}
    for sensor_id, (ewma, n_seen) in final.items():
        assert n_seen == 40
        # fold the same rows in ts order with the same alpha
        vals = [
            r.value
            for r in df.filter(F.col("sensor_id") == sensor_id).orderBy("ts", "value").collect()
        ]
        expect = vals[0]
        for v in vals[1:]:
            expect = 0.5 * v + 0.5 * expect
        assert abs(ewma - expect) < 1e-9


def test_sliding_window_counts(spark, event_stream, tmp_path):
    from advent_of_code_flink_paimon_spark.streaming import sliding_agg

    df, stream = event_stream
    _run_to_memory(
        sliding_agg(stream, "ts", ["sensor_id"], window="2 minutes", slide="1 minute",
                    watermark="0 seconds"),
        "sliding",
        tmp_path,
    )
    out = spark.sql("SELECT * FROM sliding").collect()
    assert out
    for r in out:
        # every emitted window spans exactly 2 minutes and starts on a slide boundary
        assert (r.window_end - r.window_start).total_seconds() == 120
        assert r.window_start.second == 0
        # count matches the batch answer for that (sensor, window)
        expect = df.filter(
            (F.col("sensor_id") == r.sensor_id)
            & (F.col("ts") >= r.window_start)
            & (F.col("ts") < r.window_end)
        ).count()
        assert r.n == expect


def test_stream_stream_interval_join(spark, tmp_path):
    """clicks ⋈ purchases within ±1 minute per user — streaming answer
    equals the batch interval join on the same rows."""
    from advent_of_code_flink_paimon_spark.streaming import stream_stream_join

    clicks = [(i % 5, f"2024-01-01 00:{i:02d}:00") for i in range(20)]
    buys = [(i % 5, f"2024-01-01 00:{i:02d}:30") for i in range(0, 20, 2)]
    cdf = spark.createDataFrame(clicks, "user_id long, cts string").withColumn(
        "cts", F.col("cts").cast("timestamp")
    )
    bdf = spark.createDataFrame(buys, "user_id long, bts string").withColumn(
        "bts", F.col("bts").cast("timestamp")
    )
    cdf.write.parquet(str(tmp_path / "c"))
    bdf.write.parquet(str(tmp_path / "b"))
    cs = spark.readStream.schema("user_id long, cts timestamp").parquet(str(tmp_path / "c"))
    bs = spark.readStream.schema("user_id long, bts timestamp").parquet(str(tmp_path / "b"))

    joined = stream_stream_join(
        cs, bs, on="user_id", left_ts="cts", right_ts="bts",
        watermark="0 seconds", within="1 minute",
    ).select(cs.user_id, "cts", "bts")
    q = (
        joined.writeStream.format("memory").queryName("ssj").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, str(r.cts), str(r.bts)) for r in spark.sql("SELECT * FROM ssj").collect()}
    expect = {
        (r.user_id, str(r.cts), str(r.bts))
        for r in cdf.join(
            bdf,
            (cdf.user_id == bdf.user_id)
            & (bdf.bts >= F.expr("cts - interval 1 minute"))
            & (bdf.bts <= F.expr("cts + interval 1 minute")),
        ).select(cdf.user_id, "cts", "bts").collect()
    }
    assert got == expect and got


def test_continuous_aggregate_into_pk_table(spark, tmp_path, event_stream):
    """Continuous aggregate: tumbling windowed agg streamed into a PK
    (upsert) lakehouse table keyed by (window_start, sensor_id) — the
    materialized-rollup capstone (windows + upsert sink composed)."""
    from advent_of_code_flink_paimon_spark.lakehouse import Catalog
    from advent_of_code_flink_paimon_spark.streaming import Pipeline, tumbling_agg

    df, stream = event_stream
    cat = Catalog(str(tmp_path / "wh"))
    rollup = cat.create_table(
        "rollup",
        "window_start timestamp, window_end timestamp, sensor_id long, n long, sum_value double",
        {"primary-key": ["window_start", "sensor_id"]},
    )
    agg = tumbling_agg(stream, "ts", ["sensor_id"], window="1 minute", watermark="0 seconds")
    pipe = Pipeline("rollup", agg, rollup, mode="upsert", available_now=True,
                    checkpoint_dir=str(tmp_path / "ck2"))
    q = pipe.start()
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.sensor_id): (r.n, r.sum_value)
        for r in rollup.read(spark).collect()
    }
    expected = {
        (str(r.ws), r.sensor_id): (r.n, r.sv)
        for r in df.groupBy(F.date_trunc("minute", "ts").alias("ws"), "sensor_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert got and all(got[k] == expected[k] for k in got)
    # PK invariant: one row per (window, sensor)
    assert rollup.read(spark).count() == rollup.read(spark).select("window_start", "sensor_id").distinct().count()


def test_stateful_ewma_bit_exact_across_arrow_chunks(spark, tmp_path):
    """The EWMA fold must see a key's WHOLE micro-batch in global ts
    order, not per-Arrow-chunk order (round-16 ADVICE #1): with
    maxRecordsPerBatch=2 a 12-row key spans 6 chunks, and a per-chunk
    sort would fold chunks in shuffle-arrival order — the
    order-sensitive recurrence then diverges from the sequential model
    (and from x144's DuckDB list_reduce oracle). alpha=0.5 keeps every
    coefficient a power of two, so the comparison is bit-EXACT (==),
    the same contract the x144 card relies on."""
    # values chosen so any fold-order change flips low-order bits
    vals = [float(v) for v in (7, 1, 13, 3, 11, 5, 2, 17, 23, 4, 19, 8)]
    # deterministic scramble that interleaves badly across 2-row chunks
    scrambled = sorted(range(12), key=lambda s: (s * 7) % 12)
    rows = [
        (1, vals[s], f"2024-01-01 00:00:{s:02d}") for s in scrambled
    ]
    df = spark.createDataFrame(
        rows, "sensor_id long, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "ewma-chunk-src")
    df.coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(DDL).parquet(src)
        _run_to_memory(
            stateful_ewma(
                stream, key_col="sensor_id", value_col="value", ts_col="ts", alpha=0.5
            ),
            "ewma_chunks",
            tmp_path,
            output_mode="update",
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    [(got, n_seen)] = [
        (r.ewma, r.n_seen)
        for r in spark.sql("SELECT * FROM ewma_chunks").collect()
    ]
    assert n_seen == 12
    expect = vals[0]
    for v in vals[1:]:
        expect = 0.5 * v + 0.5 * expect
    assert got == expect  # bit-exact, not approx — the x144 contract
