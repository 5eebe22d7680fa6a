"""As-of join and binned range join (graflo_spark.ops.temporal)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from graflo_spark.ops.temporal import asof_join, binned_range_join


def _quotes(spark):
    # key, ts, px
    return spark.createDataFrame(
        [
            ("a", 5.0, 100.0),
            ("a", 15.0, 110.0),
            ("a", 25.0, 120.0),
            ("b", 10.0, 50.0),
        ],
        "k string, ts double, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            ("a", 4.0, 1),
            ("a", 5.0, 2),   # tie with quote ts=5 -> inclusive match
            ("a", 20.0, 3),
            ("a", 30.0, 4),
            ("b", 9.0, 5),
            ("c", 7.0, 6),   # key with no quotes -> NULL refs
        ],
        "k string, ts double, qty int",
    )


def test_asof_backward(spark):
    out = {
        r["qty"]: (r["ref_ts"], r["ref_px"])
        for r in asof_join(
            _trades(spark), _quotes(spark), "k", "ts", "ts"
        ).collect()
    }
    assert out == {
        1: (None, None),        # before first quote
        2: (5.0, 100.0),        # inclusive at equal ts
        3: (15.0, 110.0),
        4: (25.0, 120.0),
        5: (None, None),        # b trade at 9 precedes b quote at 10
        6: (None, None),        # no quotes for key c
    }


def test_asof_forward_and_tolerance(spark):
    fwd = {
        r["qty"]: (r["ref_ts"], r["ref_px"])
        for r in asof_join(
            _trades(spark), _quotes(spark), "k", "ts", "ts",
            direction="forward",
        ).collect()
    }
    assert fwd == {
        1: (5.0, 100.0),
        2: (5.0, 100.0),        # inclusive forward too
        3: (25.0, 120.0),
        4: (None, None),        # after last quote
        5: (10.0, 50.0),
        6: (None, None),
    }
    tol = {
        r["qty"]: r["ref_px"]
        for r in asof_join(
            _trades(spark), _quotes(spark), "k", "ts", "ts", tolerance=5.0
        ).collect()
    }
    # qty=3 at ts=20 matched quote ts=15 (gap 5, kept); qty=4 at ts=30
    # matched quote ts=25 (gap 5, kept); widen the gap and it voids:
    assert tol[3] == 110.0 and tol[4] == 120.0
    tight = {
        r["qty"]: r["ref_px"]
        for r in asof_join(
            _trades(spark), _quotes(spark), "k", "ts", "ts", tolerance=2.0
        ).collect()
    }
    assert tight[2] == 100.0 and tight[3] is None and tight[4] is None


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([("a", 10.0, 1)], "k string, ts double, i int")
    right = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 9.0), ("a", 5.0, 4.0)],
        "k string, ts double, px double",
    )
    for _ in range(3):
        rows = asof_join(left, right, "k", "ts", "ts").collect()
        assert [r["ref_px"] for r in rows] == [9.0]  # greatest payload struct


def test_asof_matches_duckdb_oracle(spark, sf_dir):
    """Cross-engine proof on real data: Spark asof_join == DuckDB ASOF
    LEFT JOIN on the events table (markers = high-value events)."""
    from graflo_spark.io import to_event_time

    ev = (
        to_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .select("event_id", "event_type",
                F.col("ts").cast("double").alias("tss"), "value")
    )
    markers = ev.filter(F.col("value") > 150).select(
        "event_type", F.col("tss").alias("mts"), F.col("value").alias("mv")
    )
    got = {
        r["event_id"]: (r["ref_mts"], r["ref_mv"])
        for r in asof_join(
            ev, markers, "event_type", "tss", "mts"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT *, epoch(ts) AS tss "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT e.event_id, m.mts, m.mv FROM events e "
            "ASOF LEFT JOIN (SELECT event_type, tss AS mts, value AS mv "
            "  FROM events WHERE value > 150) m "
            "ON e.event_type = m.event_type AND e.tss >= m.mts"
        ).fetchall()
    }
    assert len(got) == len(want)
    for eid, (mts, mv) in want.items():
        gts, gv = got[eid]
        if mts is None:
            assert gts is None and gv is None
        else:
            assert gts == pytest.approx(mts, abs=1e-6) and gv == mv


def _intervals(spark):
    return spark.createDataFrame(
        [
            ("a", 0.0, 10.0, "i1"),
            ("a", 8.0, 30.0, "i2"),   # overlaps i1; spans multiple bins
            ("b", 5.0, 5.0, "i3"),    # degenerate single-point interval
            ("b", 9.0, 4.0, "i4"),    # end < start: matches nothing
        ],
        "k string, s double, e double, tag string",
    )


@pytest.mark.parametrize("bin_width", [1.0, 4.0, 100.0])
def test_range_join_matches_naive(spark, bin_width):
    """Binned execution == naive theta-join predicate at every bin width
    (bin width is a performance knob, never a correctness one)."""
    pts = spark.createDataFrame(
        [("a", float(t), t) for t in range(0, 35, 3)]
        + [("b", 5.0, 100), ("b", 6.0, 101), ("c", 5.0, 102)],
        "k string, ts double, pid int",
    )
    got = {
        (r["pid"], r["tag"])
        for r in binned_range_join(
            pts, _intervals(spark), "k", "ts", "s", "e", bin_width
        ).collect()
    }
    naive = {
        (r["pid"], r["tag"])
        for r in pts.join(_intervals(spark), "k")
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
        .collect()
    }
    assert got == naive and ("i3" in {t for _, t in got})
    assert not any(t == "i4" for _, t in got)


def test_range_join_left_outer(spark):
    pts = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 50.0, 2), ("c", 1.0, 3)],
        "k string, ts double, pid int",
    )
    rows = binned_range_join(
        pts, _intervals(spark), "k", "ts", "s", "e", 10.0, how="left"
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], set()).add(r["tag"])
    assert by_pid[1] == {"i1"}          # matched once
    assert by_pid[2] == {None}          # kept with NULL right cols
    assert by_pid[3] == {None}          # key with no intervals kept


def test_asof_plan_single_exchange(spark):
    """The scale contract: one hash exchange on the key feeds the window;
    no cartesian product anywhere in the plan."""
    plan = asof_join(
        _trades(spark), _quotes(spark), "k", "ts", "ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning(k#") <= 2  # one per side pre-union


def test_asof_null_timestamps(spark):
    """NULL right timestamps never match (SQL asof: ts >= NULL is false);
    NULL left timestamps get NULL refs."""
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", None, 2)], "k string, ts double, i int")
    right = spark.createDataFrame(
        [("a", None, 99.0), ("a", 5.0, 7.0)], "k string, ts double, px double")
    out = {r["i"]: (r["ref_ts"], r["ref_px"])
           for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert out[1] == (5.0, 7.0)        # real row matches, NULL row ignored
    assert out[2] == (None, None)      # undefined left ts -> no match
    # forward mode too: desc ordering must not shuffle NULL left rows past
    # the right rows (desc defaults NULLS LAST)
    fwd = {r["i"]: (r["ref_ts"], r["ref_px"])
           for r in asof_join(
               left, right, "k", "ts", "ts", direction="forward").collect()}
    assert fwd[2] == (None, None)


def test_range_join_max_bins_guard(spark):
    """A corrupt outlier-wide interval fails fast with a clear error
    instead of exploding sequence()/OOMing the executor."""
    pts = spark.createDataFrame(
        [("a", 5.0, 1)], "k string, ts double, pid int")
    bad = spark.createDataFrame(
        [("a", 0.0, 1e12, "huge")], "k string, s double, e double, tag string")
    with pytest.raises(Exception, match="max_bins"):
        binned_range_join(
            pts, bad, "k", "ts", "s", "e", 1.0, max_bins=1000).collect()
    # the same interval is fine when max_bins allows it
    ok = binned_range_join(
        pts, bad, "k", "ts", "s", "e", 1e9, max_bins=10_000)
    assert ok.count() == 1


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: NULL = NULL is not true. Window.partitionBy
    groups NULL keys into one partition, so without the up-front filter a
    NULL-keyed left row would wrongly match a NULL-keyed right row."""
    left = spark.createDataFrame(
        [(None, 10.0, 1), ("a", 10.0, 2)], "k string, ts double, i int")
    right = spark.createDataFrame(
        [(None, 5.0, 99.0), ("a", 5.0, 7.0)], "k string, ts double, px double")
    out = {r["i"]: (r["ref_ts"], r["ref_px"])
           for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert out[1] == (None, None)   # NULL key matches nothing
    assert out[2] == (5.0, 7.0)     # real key unaffected


def test_range_join_left_single_join_subtree(spark):
    """The left-outer path runs ONE join (containment folded into the join
    condition) — not the hit ∪ anti-join(miss) shape that executed the
    probe subtree twice."""
    pts = spark.createDataFrame(
        [("a", 5.0, 1)], "k string, ts double, pid int")
    plan = binned_range_join(
        pts, _intervals(spark), "k", "ts", "s", "e", 10.0, how="left"
    )._jdf.queryExecution().executedPlan().toString()
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan
    assert "Union" not in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_chunked_equals_plain(spark, direction):
    """The two-level skew-hardened path must reproduce the plain window
    exactly — across chunk borders, empty chunks, ties at chunk
    boundaries, NULL timestamps, and tolerance."""
    import random

    rng = random.Random(7)
    keys = ["k1", "k2"]
    left_rows = [
        (rng.choice(keys), float(rng.randint(0, 200)) if rng.random() > 0.05
         else None, i)
        for i in range(300)
    ]
    right_rows = [
        (rng.choice(keys), float(rng.randint(0, 200)) if rng.random() > 0.05
         else None, float(i))
        for i in range(120)
    ]
    left = spark.createDataFrame(left_rows, "k string, ts double, i int")
    right = spark.createDataFrame(right_rows, "k string, ts double, px double")
    for tol in (None, 10.0):
        plain = asof_join(left, right, "k", "ts", "ts",
                          direction=direction, tolerance=tol)
        chunked = asof_join(left, right, "k", "ts", "ts",
                            direction=direction, tolerance=tol,
                            chunk_width=25.0)
        p = {r["i"]: (r["ref_ts"], r["ref_px"]) for r in plain.collect()}
        c = {r["i"]: (r["ref_ts"], r["ref_px"]) for r in chunked.collect()}
        assert p == c


def test_asof_chunked_fixture_semantics(spark):
    """Chunked path on the documented fixture: same expected matches as
    test_asof_backward, with a chunk width that splits the quotes."""
    out = {
        r["qty"]: (r["ref_ts"], r["ref_px"])
        for r in asof_join(
            _trades(spark), _quotes(spark), "k", "ts", "ts", chunk_width=7.0
        ).collect()
    }
    assert out == {
        1: (None, None),
        2: (5.0, 100.0),
        3: (15.0, 110.0),
        4: (25.0, 120.0),
        5: (None, None),
        6: (None, None),
    }
