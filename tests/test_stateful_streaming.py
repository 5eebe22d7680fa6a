"""applyInPandasWithState custom stateful streaming operator test: the
running per-key aggregate must converge to the batch groupBy result."""


from pyspark.sql import functions as F

from graflo_spark.streaming import replay_as_stream, stateful_running_agg


def test_stateful_running_agg_matches_batch(spark, tables, tmp_path):
    src = tables["events"].select("user_id", "value").filter(
        F.col("user_id") < 5).repartition(3)
    expected = {
        str(r["user_id"]): (r["n"], r["total"])
        for r in src.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")).collect()
    }

    stream = replay_as_stream(spark, src)
    out_path = str(tmp_path / "out")
    q = (
        stateful_running_agg(stream, "user_id", "value")
        .writeStream.format("memory")
        .queryName("running_agg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT key, n, total FROM running_agg").collect()
    finally:
        q.stop()

    # update mode emits one row per key per batch; keep the max-n row
    final = {}
    for r in rows:
        if r["key"] not in final or r["n"] > final[r["key"]][0]:
            final[r["key"]] = (r["n"], r["total"])

    assert set(final) == set(expected)
    for k, (n, total) in expected.items():
        assert final[k][0] == n
        assert abs(final[k][1] - total) < 1e-6
