"""Event-time streaming operators: watermarked windows + stateful sessions.

The reference has no event-time semantics (its "streaming" is a work queue —
SURVEY.md §2 Part B, streaming row), so these are Spark-native extensions:
the standard building blocks a 100 TB event pipeline needs on top of the
ingest worker.

- Watermarked tumbling/sliding aggregation: pure built-ins
  (``withWatermark`` + ``window()``/``F.window``), so state eviction is
  handled by the engine and late rows beyond the watermark are dropped
  deterministically.
- Stateful sessionization via ``applyInPandasWithState``: a custom
  gap-based session operator (the reference-free equivalent of q14's batch
  sessionization) with explicit per-key state and processing-time timeouts.

Scale posture: state is partitioned by key (user), watermarks bound state
size; both operators run identically over ``readStream`` micro-batches and
the same code path powers the batch-mode tests (window() is stream/batch
agnostic; the stateful op is exercised by a true streaming test).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize *ts_col* to TIMESTAMP (with local tz) for watermarking.

    Parquet files whose timestamps carry no timezone annotation are read as
    TIMESTAMP_NTZ, which ``withWatermark`` rejects on a streaming relation.
    The session timezone is pinned to UTC (session.py), so the cast is
    value-preserving and batch-oracle parity is unaffected.
    """
    field = next((f for f in df.schema.fields if f.name == ts_col), None)
    if field is not None and isinstance(field.dataType, TimestampNTZType):
        # No default arg: Spark 4 validates defaults for this key, and the
        # conf always has a value (JVM/system default when unset).
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise ValueError(
                "event-time NTZ→TIMESTAMP normalization requires "
                f"spark.sql.session.timeZone=UTC (got {tz!r}); a non-UTC "
                "session would silently shift event times and watermarks. "
                "Build the session via worker_etl_spark.session.get_spark or "
                "set the conf explicitly."
            )
        return df.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling (or sliding, when *slide* is given) counts+sums
    per (window, event_type).  Works identically on a batch DataFrame and a
    ``readStream`` source; on a stream the watermark bounds state and drops
    late rows past the threshold."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    events = _ensure_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Spark-native session windows (``F.session_window``): per-key sessions
    that merge events closer than *gap* and close at last-event + gap.

    Stream/batch agnostic like ``windowed_event_counts``; on a stream the
    watermark bounds session state.  Boundary semantics (a gap EXACTLY equal
    to the threshold starts a new session — the window is half-open
    [start, last+gap)) differ from the batch q14 formulation (strictly
    greater), which is why this operator gets its own oracle.
    """
    events = _ensure_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair each left row with every
    right row of the same key whose timestamp falls in
    ``[left_ts, left_ts + upper]``.

    On streams both sides carry watermarks and the join condition is
    event-time-bounded, which is exactly what lets Spark evict join state:
    a buffered left row can be dropped once the right watermark passes
    ``left_ts + upper``.  In batch the same plan is a key-equi sort-merge
    join with a residual range predicate — no cartesian.

    ``how='left_outer'`` additionally emits unmatched left rows
    (null-padded) — on a stream, only once the right watermark proves no
    match can arrive, so rows inside the final watermark at end-of-stream
    stay withheld (the documented outer-join tail semantics).

    Column names must be disjoint apart from *key_col* (rename before
    joining); the right timestamp may be named differently via *right_ts*.
    """
    lw = _ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    # Rename the right key pre-join: dropping by name is unambiguous, and
    # on an OUTER join the surviving key must be the LEFT one (the right
    # key is null on unmatched rows — grouping on it would corrupt keys).
    rkey = f"__{key_col}_r"
    rw = rw.withColumnRenamed(key_col, rkey)
    cond = (
        (lw[key_col] == rw[rkey])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how).drop(rkey)


def dedup_events(
    events: DataFrame,
    keys: Iterable[str] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → exactly-once projection: drop redelivered events by
    key.  On a stream this is ``dropDuplicatesWithinWatermark`` — the
    state-bounded form: a key is remembered only until the watermark
    passes it, so dedup state cannot grow with the stream, and any
    redelivery inside the watermark horizon (the at-least-once window a
    queue actually redelivers in — reference ack/nack loop,
    ``etl.py:1392-1407``) is suppressed.  In batch the same call lowers to
    plain ``dropDuplicates`` (keys are globally unique per batch), which
    is what the DuckDB oracle checks; stream≡batch equality is asserted by
    tests/test_event_time.py over a redelivering micro-batch source.

    Duplicate rows are byte-identical under redelivery, so which one is
    kept is immaterial — the one semantics a key-only dedup needs.
    """
    keys = list(keys)
    events = _ensure_event_time(events, ts_col)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful session operator over a stream grouped by user.

    State per user = the open session (start, last-seen, counts).  Each
    micro-batch folds its events into the open session, emitting every
    session that closed (gap exceeded inside the batch).  A processing-time
    timeout flushes the final open session when a key goes quiet — so every
    event is eventually attributed to exactly one emitted session.
    """
    events = _ensure_event_time(events, ts_col)  # uniform NTZ handling
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, tv = state.get
                closed.append((s0, s1, n, tv))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values(ts_col)
            for ts_val, value in zip(rows[ts_col], rows["value"]):
                us = int(ts_val.value // 1_000)  # pandas ns → µs
                v = float(value)
                if cur is None:
                    cur = [us, us, 1, v]
                elif us - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [us, us, 1, v]
                else:
                    cur[1] = us
                    cur[2] += 1
                    cur[3] += v
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [round(c[3], 2) for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, cond) -> DataFrame:
    """Stream-static enrichment join: broadcast the (small, static) dim so
    the stream side never shuffles and no join state accumulates — the
    static side is re-evaluated each micro-batch, which is also what makes
    slowly-changing dims pick up updates between batches.  Works unchanged
    in batch mode."""
    return events.join(F.broadcast(dim), cond, "inner")


# --- CUSUM drift detector (custom stateful operator + exact closed form) ------
CUSUM_K_CENTS = 5_000    # reference drift (cents): subtracted per event
CUSUM_H_CENTS = 50_000   # alert threshold on the CUSUM statistic

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_alerts", LongType()),
        StructField("max_s", LongType()),
        StructField("final_s", LongType()),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("p", LongType()),        # running prefix Σ(c - k)
        StructField("rmin", LongType()),     # min prefix seen (incl. 0)
        StructField("n", LongType()),
        StructField("alerts", LongType()),
        StructField("maxs", LongType()),
    ]
)


def cusum_stateful(
    events: DataFrame,
    k_cents: int = CUSUM_K_CENTS,
    h_cents: int = CUSUM_H_CENTS,
    ts_col: str = "ts",
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Per-user one-sided CUSUM drift detector as a custom stateful streaming
    operator (``applyInPandasWithState``): S_i = max(0, S_{i-1} + (c_i − k)),
    alert when S crosses h — the classic sequential change-point statistic
    for spend/abuse spikes.  State per user is FOUR integers, because CUSUM
    admits the prefix-min closed form S_i = P_i − min(0, min_{j≤i} P_j)
    (P = running Σ(c−k)): the operator carries (P, min-prefix, counters)
    instead of replaying history, so state size is O(1) per key no matter
    how long the stream runs.  A processing-time timeout flushes the
    per-user summary when a key goes quiet.

    The SAME closed form is what makes the operator *provable*: the batch
    query (evt08) computes it with two exact-integer window functions, and
    ``tests/test_event_time.py`` asserts streaming output == batch output
    row-for-row — the stream/batch-parity discipline every evt operator
    here follows."""
    events = _ensure_event_time(events, ts_col)

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                p, rmin, n, alerts, maxs = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "n_alerts": [alerts],
                        "max_s": [maxs],
                        "final_s": [p - min(0, rmin)],
                    }
                )
            return
        p, rmin, n, alerts, maxs = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs)).sort_values([ts_col, "event_id"])
        for value in rows["value"]:
            c = int(round(float(value) * 100))
            p += c - k_cents
            if p < rmin:
                rmin = p  # min over P_0..P_i INCLUDES the current prefix
            s = p - min(0, rmin)  # CUSUM via prefix-min closed form
            if s > h_cents:
                alerts += 1
            if s > maxs:
                maxs = s
            n += 1
        state.update((p, rmin, n, alerts, maxs))
        state.setTimeoutDuration(timeout_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

