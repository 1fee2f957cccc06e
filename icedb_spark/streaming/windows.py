"""Event-time windowing and custom stateful operators for streams.

The reference has no streaming windows at all (SURVEY §2.2 — its streaming
story is a timer-flushed buffer); these are the Spark-native operators a
stream ingested through :mod:`icedb_spark.streaming.ingest` needs for
rollups and sessionization with late data:

* :func:`windowed_agg` — tumbling/sliding event-time windows with a
  watermark. Declarative (``F.window`` + ``withWatermark``): state cleanup,
  late-data dropping and append-mode finalization are Spark's, not ours.
* :func:`session_agg` — built-in gap-based session windows
  (``F.session_window``). Works identically over a batch DataFrame (no
  watermark needed there), which is how the oracle gate pins its values.
* :func:`stateful_sessionize` — the same sessionization as a CUSTOM
  stateful operator via ``applyInPandasWithState``: per-key state walks
  event times in order, closes a session when the gap is exceeded by later
  data, and uses an event-time timeout to flush the final open session when
  the watermark passes ``last_event + gap``. This is the template for
  stateful logic the built-in windows can't express (per-session caps,
  custom emission policies, running sketches).

Emission semantics under append mode are part of the contract and are
oracle-checked: a window/session is emitted iff the final watermark passes
its end. Watermarks and timeouts are millisecond-granular inside Spark
(timestamps are µs, the watermark tracker floors to ms), so the oracle
replicates ``floor(us/1000)`` arithmetic exactly.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "windowed_agg",
    "session_agg",
    "stateful_sessionize",
    "stream_interval_join",
    "budget_admission",
]


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: Mapping[str, Column],
    keys: tuple[str, ...] = (),
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation: tumbling by default, sliding when
    ``slide`` is given. ``ts_col`` must be a timestamp column; on a
    streaming DataFrame the watermark bounds state and drops late rows.

    Output: ``win_start_us`` / ``win_end_us`` (epoch-µs longs — stable
    across engines and sinks), the key columns, then one column per entry
    of ``aggs`` (name → aggregate Column).
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    out = df.groupBy(win.alias("__w"), *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.unix_micros(F.col("__w.start")).alias("win_start_us"),
        F.unix_micros(F.col("__w.end")).alias("win_end_us"),
        *keys,
        *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Mapping[str, Column],
    keys: tuple[str, ...] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows via the built-in ``F.session_window``:
    events of one key closer than ``gap`` merge into one session whose end
    is ``last_event + gap``. Same output convention as :func:`windowed_agg`.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("__w"), *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.unix_micros(F.col("__w.start")).alias("win_start_us"),
        F.unix_micros(F.col("__w.end")).alias("win_end_us"),
        *keys,
        *aggs.keys(),
    )


_SESS_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_fn(
    key_col: str, ts_col: str, gap_us: int
) -> Callable:
    def fn(key, pdfs: Iterator, state):  # pragma: no cover - runs in worker
        import pandas as pd

        def emit(start_us: int, last_us: int, n: int):
            return pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return

        ts = []
        for pdf in pdfs:
            ts.extend(
                pdf[ts_col].values.astype("datetime64[us]").astype("int64").tolist()
            )
        ts.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = ts[0]
            n = 0
            # first event consumed by the open-session seed below
        for t in ts:
            if n > 0 and t - last_us > gap_us:
                yield emit(start_us, last_us, n)
                start_us, n = t, 0
            # late rows (t <= last) merge into the open session; one that
            # predates its start extends the start (no retro session splits)
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

    return fn


def stateful_sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_us: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful sessionization over a stream via
    ``applyInPandasWithState``.

    Per-key state is (session_start, last_event, count) in epoch-µs. A
    session is emitted either when later data of the same key exceeds the
    gap (closed by data) or when the event-time watermark passes
    ``last_event + gap`` (closed by timeout) — so at stream end, keys whose
    final session still lies within the watermark horizon keep it open and
    emit nothing, exactly like a production continuous stream would.

    Scale shape: state is three longs per key; rows shuffle once on
    ``key_col``; timeouts bound state lifetime to the gap, so state size
    tracks ACTIVE keys, not all keys ever seen.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = StructType(
        [
            df.schema[key_col],
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _sessionize_fn(key_col, ts_col, gap_us),
            outputStructType=out_schema,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def budget_admission(
    df: DataFrame,
    budgets: "Mapping[str, int]",
    strata_col: str,
    token_col: str,
    order_col: str,
    default_budget: int = 0,
) -> DataFrame:
    """Stateful streaming ADMISSION CONTROL — the streaming twin of
    :func:`icedb_spark.operators.sampling.token_budget_sample`: admit
    documents from a live stream until each stratum's running token
    total reaches its budget, then reject the rest forever. This is the
    shape of a collection quota ("stop ingesting source X after N
    tokens") that batch sampling can't provide — by the time a batch
    job runs, the corpus is already stored.

    Per-stratum state is ONE long (tokens admitted so far), carried
    across micro-batches by ``applyInPandasWithState``; admission uses
    the same strict pre-total rule as the batch sampler (admit while
    the total BEFORE the document is under budget — overshoot bounded
    by one document, at least one document per funded stratum). Within
    a micro-batch, rows of a stratum are processed in ``order_col``
    order — the deterministic stand-in for arrival order that lets an
    oracle replay admission exactly; across batches, arrival order IS
    the admission order, as in any real quota. Output: one row per
    ADMITTED document, ``(stratum, order, toks, run)`` with ``run`` the
    pre-admission running total.

    Scale shape: one shuffle on the stratum key per micro-batch; state
    size is #strata longs — no timeout needed, a quota never expires.
    Strata are typically few (sources, languages), so per-key fan-in is
    the micro-batch's own size, never history.

    Determinism caveat: ``order_col`` orders rows only WITHIN one
    micro-batch. If a single logical ingest is split across several
    batches (``maxFilesPerTrigger`` set, or the source's own batching),
    the effective admission order is (batch, order_col) — correct quota
    semantics either way (arrival order IS the admission order), but an
    oracle replaying one global ``order_col`` sort only matches when
    each ingest drains as a single batch (the st15 gate asserts exactly
    that).
    """
    bmap = {str(k): int(v) for k, v in budgets.items()}
    dflt = int(default_budget)
    if any(v < 0 for v in bmap.values()) or dflt < 0:
        raise ValueError("budgets must be >= 0")

    def fn(key, pdfs: Iterator, state):  # pragma: no cover - runs in worker
        import pandas as pd

        stratum = key[0]
        budget = bmap.get(stratum, dflt) if stratum is not None else dflt
        spent = state.get[0] if state.exists else 0
        orders, toks = [], []
        for pdf in pdfs:
            orders.extend(pdf[order_col].tolist())
            toks.extend(pdf[token_col].tolist())
        out_o, out_t, out_r = [], [], []
        for o, t in sorted(zip(orders, toks)):
            if spent < budget:
                out_o.append(o)
                out_t.append(t)
                out_r.append(spent)
                spent += t
        state.update((spent,))
        yield pd.DataFrame(
            {
                strata_col: pd.Series([stratum] * len(out_o), dtype="object"),
                order_col: pd.Series(out_o, dtype="int64"),
                "toks": pd.Series(out_t, dtype="int64"),
                "run": pd.Series(out_r, dtype="int64"),
            }
        )

    out_schema = StructType(
        [
            df.schema[strata_col],
            StructField(order_col, LongType()),
            StructField("toks", LongType()),
            StructField("run", LongType()),
        ]
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy(strata_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=StructType([StructField("spent", LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: "tuple[str, ...]",
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time INTERVAL condition:
    match right rows whose timestamp falls in ``[left_ts + lower,
    left_ts + upper]`` for the same key — the attribution-window shape
    (click → purchase within an hour, impression → install, request →
    error). Works identically on batch DataFrames, which is how the
    oracle gate pins its values.

    On streams BOTH sides get the watermark — together with the time
    constraint this is exactly what lets Spark bound the join state: a
    buffered left row is dropped once the right watermark passes
    ``left_ts + upper``, and vice versa, so state is
    O(rate × window), never O(stream). Inner matches emit as they are
    found (append mode); outer variants additionally emit NULL-padded
    rows only after the watermark proves no match can arrive — pass
    ``join_type="leftOuter"``/``"rightOuter"`` for those (Spark
    requires the time bound for them, which this signature always
    supplies).

    Column naming: output carries every left column, then right
    columns renamed with a ``r_`` prefix where they collide (keys are
    emitted once, from the left side).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    # disambiguate overlapping column names before the join: every
    # right-side collision (join keys included) gets an r_ prefix; key
    # duplicates drop after the join so keys emit once, from the left
    left_cols = set(left.columns)
    renames = {c: f"r_{c}" for c in right.columns if c in left_cols}
    for old, new in renames.items():
        rw = rw.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)

    def rk(k: str) -> str:
        return renames.get(k, k)

    cond = None
    for k in keys:
        c = lw[k] == rw[rk(k)]
        cond = c if cond is None else cond & c
    time_lo = rw[r_ts] >= lw[left_ts] + F.expr(f"interval {lower}")
    time_hi = rw[r_ts] <= lw[left_ts] + F.expr(f"interval {upper}")
    cond = cond & time_lo & time_hi
    joined = lw.join(rw, cond, join_type)
    # one key column out, NULL-safe for BOTH outer directions: a
    # rightOuter's unmatched right rows NULL-pad the left side, so the
    # emitted key must coalesce across sides (equal whenever both are
    # present, by the join condition)
    for k in keys:
        joined = joined.withColumn(k, F.coalesce(lw[k], rw[rk(k)]))
    return joined.drop(*[rw[rk(k)] for k in keys])
