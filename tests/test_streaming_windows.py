"""Event-time window / stateful-operator tests.

Streaming runs use a parquet file-drop source drained with availableNow and
a memory sink; append-mode emission (watermark-gated) is part of the
asserted contract because the oracle gate depends on it.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from icedb_spark.streaming import session_agg, stateful_sessionize, windowed_agg
from icedb_spark.testdata import load_table

GAP_US = 1_800_000_000  # 30 min
DELAY = "10 minutes"
DELAY_US = 600_000_000


@pytest.fixture(scope="module")
def ev_ts(spark):
    """events with a proper timestamp column (µs)."""
    return (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.expr("timestamp_micros(ts div 1000)").alias("ets"),
        )
        .cache()
    )


def _drain_stream(spark, src_df, tmp_path, build):
    """Write src_df to parquet, readStream it, apply build(), drain to a
    memory sink, return the collected rows as a DataFrame."""
    src = str(tmp_path / f"src-{uuid.uuid4().hex[:8]}")
    src_df.write.parquet(src)
    name = f"sink_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(src_df.schema).parquet(src)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_agg_batch_matches_naive(ev_ts):
    out = windowed_agg(
        ev_ts, "ets", "1 day", {"cnt": F.count("*")}, keys=("event_type",)
    )
    naive = (
        ev_ts.groupBy(
            F.date_trunc("day", "ets").alias("d"), "event_type"
        ).count()
    )
    got = {(r["win_start_us"], r["event_type"]): r["cnt"] for r in out.collect()}
    want = {
        (int(r["d"].timestamp() * 1_000_000), r["event_type"]): r["count"]
        for r in naive.collect()
    }
    assert got == want
    # tumbling: end - start == 1 day everywhere
    assert out.where(
        F.col("win_end_us") - F.col("win_start_us") != 86_400_000_000
    ).count() == 0


def test_windowed_agg_sliding_batch(ev_ts):
    out = windowed_agg(
        ev_ts, "ets", "2 days", {"cnt": F.count("*")}, slide="1 day"
    )
    # every event lands in exactly 2 sliding windows
    total = out.agg(F.sum("cnt")).collect()[0][0]
    assert total == 2 * ev_ts.count()


def test_windowed_agg_stream_append_emits_below_watermark(spark, ev_ts, tmp_path):
    out = _drain_stream(
        spark,
        ev_ts,
        tmp_path,
        lambda s: windowed_agg(
            s, "ets", "1 day", {"cnt": F.count("*")}, keys=("event_type",),
            watermark=DELAY,
        ),
    )
    max_us = ev_ts.agg(F.unix_micros(F.max("ets"))).collect()[0][0]
    wm_us = (max_us - DELAY_US) // 1000 * 1000  # watermark floors to ms
    batch = windowed_agg(
        ev_ts, "ets", "1 day", {"cnt": F.count("*")}, keys=("event_type",)
    ).where(F.col("win_end_us") <= wm_us)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    assert len(got) > 0


def test_session_agg_batch_matches_sessionize(spark, ev_ts):
    from icedb_spark.operators import sessionize

    out = session_agg(
        ev_ts,
        "ets",
        "30 minutes",
        {"n_events": F.count("*")},
        keys=("user_id",),
    )
    s = sessionize(
        ev_ts.select("user_id", F.unix_micros("ets").alias("us")),
        "user_id",
        "us",
        gap=GAP_US,
    )
    want = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("win_start_us"),
            (F.max("us") + GAP_US).alias("win_end_us"),
            F.count("*").alias("n_events"),
        )
        .drop("session_id")
    )
    cols = ["user_id", "win_start_us", "win_end_us", "n_events"]
    assert sorted(tuple(r[c] for c in cols) for r in out.collect()) == sorted(
        tuple(r[c] for c in cols) for r in want.collect()
    )


def test_stateful_sessionize_stream(spark, ev_ts, tmp_path):
    src = ev_ts.select("user_id", "ets")
    out = _drain_stream(
        spark,
        src,
        tmp_path,
        lambda s: stateful_sessionize(s, "user_id", "ets", GAP_US, watermark=DELAY),
    ).collect()
    assert len(out) > 0

    # expected: batch sessionization; the final session of a key emits only
    # if the ms-floored watermark passed last + gap (event-time timeout)
    from icedb_spark.operators import sessionize

    s = sessionize(
        src.select("user_id", F.unix_micros("ets").alias("us")),
        "user_id",
        "us",
        gap=GAP_US,
    )
    per = s.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    )
    max_us = src.agg(F.unix_micros(F.max("ets"))).collect()[0][0]
    wm_ms = max_us // 1000 - DELAY_US // 1000
    w_last = F.max("session_id").over(
        __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy("user_id")
    )
    want = (
        per.withColumn("__last", w_last)
        .where(
            (F.col("session_id") < F.col("__last"))
            | (F.col("session_end_us") / F.lit(1000) + F.lit(GAP_US // 1000) < wm_ms)
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    assert sorted(tuple(r[c] for c in cols) for r in out) == sorted(
        tuple(r[c] for c in cols) for r in want.collect()
    )


def test_stateful_sessionize_resume_merges_state(spark, tmp_path):
    """Second availableNow run with the same checkpoint continues per-key
    state: a row within the gap of batch-1's open session extends it."""
    src = str(tmp_path / "src2")
    ck = str(tmp_path / "ck2")
    os.makedirs(src)
    base = 1_700_000_000_000_000  # µs

    def mk(rows):
        return spark.createDataFrame(
            [(k, t) for k, t in rows], "user_id long, us long"
        ).select("user_id", F.timestamp_micros(F.col("us")).alias("ets"))

    def run():
        got: list = []
        stream = spark.readStream.schema("user_id long, ets timestamp").parquet(src)
        q = (
            stateful_sessionize(stream, "user_id", "ets", GAP_US, watermark="0 seconds")
            .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    mk([(1, base), (1, base + 1_000_000)]).write.mode("append").parquet(src)
    first = run()
    assert first == []  # open session, watermark hasn't passed last+gap

    # next batch: one row inside the gap (extends), then one far beyond
    # (closes the extended session by data)
    far = base + 10_000_000_000
    mk([(1, base + 2_000_000), (1, far)]).write.mode("append").parquet(src)
    second = run()
    closed = [r for r in second if r["n_events"] == 3]
    assert len(closed) == 1
    assert closed[0]["session_start_us"] == base
    assert closed[0]["session_end_us"] == base + 2_000_000


def test_stream_interval_join_batch_semantics(spark):
    """Batch-mode contract of stream_interval_join: inclusive interval
    bounds, key emitted once from the left, right-side collisions
    renamed with r_, and leftOuter NULL-pads unmatched left rows."""
    from icedb_spark.streaming import stream_interval_join

    L = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 12:00:00"),
         (3, "u2", "2024-01-01 10:30:00")],
        "event_id long, user_id string, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    R = spark.createDataFrame(
        [(10, "u1", "2024-01-01 10:59:59"),   # inside for click 1
         (11, "u1", "2024-01-01 11:00:00"),   # exactly +1h: inclusive
         (12, "u1", "2024-01-01 09:59:59"),   # before: excluded
         (13, "u2", "2024-01-01 11:31:00")],  # 61 min after: excluded
        "event_id long, user_id string, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))

    j = stream_interval_join(
        L, R, ("user_id",), "ts", "ts", lower="0 seconds", upper="1 hour"
    )
    assert j.columns.count("user_id") == 1
    assert "r_ts" in j.columns and "r_event_id" in j.columns
    got = sorted(
        (r["event_id"], r["r_event_id"]) for r in j.collect()
    )
    assert got == [(1, 10), (1, 11)]

    lo = stream_interval_join(
        L, R, ("user_id",), "ts", "ts",
        lower="0 seconds", upper="1 hour", join_type="leftOuter",
    )
    outer = sorted(
        (r["event_id"], r["r_event_id"]) for r in lo.collect()
    )
    assert outer == [(1, 10), (1, 11), (2, None), (3, None)]


def test_stream_interval_join_right_outer_keys(spark):
    """rightOuter must emit the join key for unmatched RIGHT rows (the
    left side is the NULL-padded one there)."""
    from icedb_spark.streaming import stream_interval_join

    L = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00")],
        "event_id long, user_id string, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    R = spark.createDataFrame(
        [(10, "u1", "2024-01-01 10:30:00"),   # matches
         (11, "u9", "2024-01-01 10:30:00")],  # no left row for u9
        "event_id long, user_id string, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))

    ro = stream_interval_join(
        L, R, ("user_id",), "ts", "ts",
        lower="0 seconds", upper="1 hour", join_type="rightOuter",
    )
    got = sorted(
        (r["user_id"], r["event_id"], r["r_event_id"]) for r in ro.collect()
    )
    assert got == [("u1", 1, 10), ("u9", None, 11)]


def test_budget_admission_quota_survives_runs(spark, tmp_path):
    """The quota property itself: per-stratum admission stops at the
    budget (strict pre-total rule), state persists across availableNow
    runs over one checkpoint (run 2 cannot re-spend run 1's tokens),
    unlisted strata use the default, and zero-budget strata admit
    nothing."""
    from icedb_spark.streaming import budget_admission

    src = str(tmp_path / "ba-src")
    ck = str(tmp_path / "ba-ck")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, src string, toks long")

    def run():
        got: list = []
        stream = spark.readStream.schema(
            "doc_id long, src string, toks long"
        ).parquet(src)
        q = (
            budget_admission(
                stream, {"a": 25, "zero": 0}, strata_col="src",
                token_col="toks", order_col="doc_id", default_budget=10,
            )
            .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    # run 1: 'a' admits 1,2,3 (pre-totals 0,10,20 < 25; then 30 stops);
    # 'zero' admits nothing; 'other' admits its first (default 10)
    mk([
        (1, "a", 10), (2, "a", 10), (3, "a", 10), (4, "a", 10),
        (5, "zero", 1), (6, "other", 99),
    ]).write.mode("append").parquet(src)
    first = run()
    by = {(r["src"], r["doc_id"]): r["run"] for r in first}
    assert set(by) == {("a", 1), ("a", 2), ("a", 3), ("other", 6)}
    assert by[("a", 3)] == 20

    # run 2: 'a' is exhausted (spent=30 >= 25) — even a tiny doc is
    # rejected; 'other' spent 99 >= 10 likewise
    mk([(7, "a", 1), (8, "other", 1), (9, "b", 4)]).write.mode(
        "append"
    ).parquet(src)
    second = run()
    assert {(r["src"], r["doc_id"]) for r in second} == {("b", 9)}

    import pytest as _pt

    with _pt.raises(ValueError):
        budget_admission(
            mk([]), {"a": -1}, strata_col="src",
            token_col="toks", order_col="doc_id",
        )
