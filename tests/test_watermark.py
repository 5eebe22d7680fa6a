"""Watermark semantics end-to-end: a watermarked tumbling-window aggregation
over a file stream, restarted with late data — late rows (older than the
checkpointed watermark) must be dropped, on-time rows must emit.

Also covers the native session_window operator's batch/streaming parity
(same frame, same result via the lag+cumsum reconstruction).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from graflo_spark.streaming import session_window_agg, sessionize, tumbling_window_agg

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("k", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


def _rows(spark, *pairs):
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    return spark.createDataFrame(
        [(base + dt.timedelta(minutes=m), k, 1.0) for m, k in pairs], SCHEMA
    )


def _run_stream(spark, src_dir, ckpt, name):
    # foreachBatch sink: the memory sink cannot recover from a checkpoint,
    # and this test's whole point is the restart
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src_dir)
    agg = tumbling_window_agg(stream, "ts", "5 minutes", ["k"], {"v": "count"},
                              watermark="10 minutes")
    rows: list = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        agg.writeStream.foreachBatch(collect)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    q.stop()
    return rows


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: three events in [10:00,10:05) + one at 11:00 that advances the
    # watermark to 10:50 -> the 10:00 window closes and emits; the 11:00
    # window stays open in state
    _rows(spark, (0, "a"), (1, "a"), (2, "b"), (60, "a")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    out1 = _run_stream(spark, src, ckpt, "wm_run1")
    emitted1 = {(r["window_start"].minute, r["k"]): r["count_v"] for r in out1}
    assert emitted1 == {(0, "a"): 2, (0, "b"): 1}

    # batch 2 (restart, same checkpoint): one LATE event at 10:02 (behind the
    # persisted 10:50 watermark -> must be dropped, its window already closed)
    # and one at 11:20 that advances the watermark past 11:05, flushing the
    # 11:00 window with count 1 — NOT 2, proving the late row never counted,
    # and no 10:00-window row re-emits
    _rows(spark, (2, "a"), (80, "a")).coalesce(1).write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, ckpt, "wm_run2")
    emitted2 = {(r["window_start"].hour, r["window_start"].minute, r["k"]): r["count_v"]
                for r in out2}
    assert emitted2 == {(11, 0, "a"): 1}


def test_session_window_batch_matches_sessionize(spark, events):
    ev = events.select("user_id", "ts", "value")
    native = session_window_agg(ev, "ts", ["user_id"], "30 minutes", {"value": "count"})
    reconstructed = (
        sessionize(ev, "ts", "user_id", gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n"))
    )
    a = {(r["user_id"], r["session_start"]): r["count_value"] for r in native.collect()}
    b = {(r["user_id"], r["session_start"]): r["n"] for r in reconstructed.collect()}
    assert a == b


def test_session_window_streaming_matches_batch(spark, tmp_path):
    df = _rows(spark, (0, "a"), (3, "a"), (50, "a"), (0, "b"))
    batch = {
        (r["k"], r["session_start"]): r["count_v"]
        for r in session_window_agg(df, "ts", ["k"], "30 minutes", {"v": "count"}).collect()
    }

    src = str(tmp_path / "sw_src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = session_window_agg(stream, "ts", ["k"], "30 minutes", {"v": "count"},
                             watermark="1 minute")
    q = (
        agg.writeStream.format("memory").queryName("sw_stream")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r["k"], r["session_start"]): r["count_v"]
        for r in spark.table("sw_stream").collect()
    }
    # append mode only emits sessions closed by the final watermark; every
    # emitted session must match the batch result exactly
    assert streamed
    for key, n in streamed.items():
        assert batch[key] == n
