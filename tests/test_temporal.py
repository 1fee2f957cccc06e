"""Temporal operator tests: asof_join / range_join / sessionize checked
against brute-force formulations on the driver-provided events table."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from icedb_spark.operators import asof_join, range_join, sessionize
from icedb_spark.testdata import load_table


@pytest.fixture(scope="module")
def events(spark):
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    return df.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("us"),
    ).cache()


@pytest.fixture(scope="module")
def purchases(events):
    return events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us"), F.col("value").alias("p_value")
    )


@pytest.fixture(scope="module")
def clicks(events):
    # one row per (user, ts): deterministic asof match under ties
    return (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("us").alias("c_us"))
        .agg(F.max("value").alias("c_value"))
    )


def brute_asof(purchases, clicks, direction="backward"):
    cond = F.col("p_us") >= F.col("c_us") if direction == "backward" else F.col("p_us") <= F.col("c_us")
    j = purchases.join(clicks, "user_id").where(cond)
    order = F.desc("c_us") if direction == "backward" else F.asc("c_us")
    w = Window.partitionBy("user_id", "p_us", "p_value").orderBy(order)
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


COLS = ["user_id", "p_us", "p_value", "c_us", "c_value"]


def test_asof_backward_matches_bruteforce(purchases, clicks):
    got = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us")
    want = brute_asof(purchases, clicks, "backward")
    assert _rows(got, COLS) == _rows(want, COLS)
    assert got.count() > 0


def test_asof_forward_matches_bruteforce(purchases, clicks):
    got = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us", direction="forward")
    want = brute_asof(purchases, clicks, "forward")
    assert _rows(got, COLS) == _rows(want, COLS)


def test_asof_left_keeps_unmatched(purchases, clicks):
    inner = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us")
    left = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us", how="left")
    assert left.count() == purchases.count()
    assert left.where(F.col("c_us").isNull()).count() == purchases.count() - inner.count()


def test_asof_tolerance(purchases, clicks):
    tol = 3_600_000_000  # 1h in µs
    got = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us", tolerance=tol)
    for r in got.collect():
        assert 0 <= r["p_us"] - r["c_us"] <= tol
    loose = asof_join(purchases, clicks, ["user_id"], "p_us", "c_us")
    within = loose.where(F.col("p_us") - F.col("c_us") <= tol)
    assert got.count() == within.count()


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 100, "L")], "k int, ts int, l string")
    right = spark.createDataFrame([(1, 100, "R")], "k int, ts_r int, r string")
    out = asof_join(left, right, ["k"], "ts", "ts_r").collect()
    assert len(out) == 1 and out[0]["r"] == "R"


def test_asof_rejects_column_collision(spark):
    left = spark.createDataFrame([(1, 100, 5)], "k int, ts int, v int")
    right = spark.createDataFrame([(1, 90, 6)], "k int, ts int, v int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts")


def test_range_join_matches_bruteforce(spark, events):
    iv = spark.range(40).select(
        F.col("id").alias("band"),
        (F.col("id") * 12.5).alias("lo"),
        (F.col("id") * 12.5 + 25.0).alias("hi"),
    )
    pts = events.select("event_id", "value")
    got = range_join(pts, iv, "value", "lo", "hi", bucket_width=10.0)
    want = pts.join(iv).where((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
    cols = ["event_id", "band"]
    assert _rows(got, cols) == _rows(want, cols)
    # overlapping bands: some points must land in 2 intervals
    assert got.count() > pts.count()


def test_range_join_closed_both(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, x double")
    iv = spark.createDataFrame([(7, 10.0, 20.0)], "b int, lo double, hi double")
    left = range_join(pts, iv, "x", "lo", "hi", bucket_width=5.0)
    both = range_join(pts, iv, "x", "lo", "hi", bucket_width=5.0, closed="both")
    assert left.count() == 1
    assert both.count() == 2


def test_sessionize_boundaries(spark):
    rows = [
        (1, 0), (1, 100), (1, 101),   # session 1 (gap 50)
        (1, 200), (1, 240),           # session 2
        (2, 0),                       # other key
    ]
    df = spark.createDataFrame(rows, "k int, t long")
    out = {(r["k"], r["t"]): r["session_id"] for r in sessionize(df, "k", "t", gap=50).collect()}
    assert out[(1, 0)] == 1
    assert out[(1, 100)] == 2 and out[(1, 101)] == 2
    assert out[(1, 200)] == 3 and out[(1, 240)] == 3
    assert out[(2, 0)] == 1


def test_sessionize_tied_timestamps_share_session(spark):
    df = spark.createDataFrame([(1, 10), (1, 10), (1, 10)], "k int, t long")
    ids = [r["session_id"] for r in sessionize(df, "k", "t", gap=5).collect()]
    assert ids == [1, 1, 1]


def test_sessionize_events_invariants(events):
    s = sessionize(events.select("user_id", "us"), "user_id", "us", gap=1_800_000_000)
    per = s.groupBy("user_id", "session_id").agg(
        F.min("us").alias("lo"), F.max("us").alias("hi"), F.count("*").alias("n")
    )
    # sessions of one user never overlap and are separated by > gap
    w = Window.partitionBy("user_id").orderBy("session_id")
    gaps = per.withColumn("prev_hi", F.lag("hi").over(w)).where(F.col("prev_hi").isNotNull())
    assert gaps.where(F.col("lo") - F.col("prev_hi") <= 1_800_000_000).count() == 0
    assert per.agg(F.sum("n")).collect()[0][0] == events.count()
