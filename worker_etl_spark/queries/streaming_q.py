"""Oracle-checked queries for the event-time streaming operators.

``windowed_event_counts`` is stream/batch agnostic (``F.window`` +
watermark), so the SAME code path the streaming tests drive over
``readStream`` micro-batches runs here in batch mode against the DuckDB
bucket oracle — closing the CORRECTNESS gap on the operator itself (q15/q16
verify arithmetic bucketing, not ``F.window``).  The stateful sessionizer is
not SQL-expressible; its equivalence to q14's batch sessions is asserted by
a true streaming test (tests/test_event_time.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_etl_spark.queries.fixtures import fixture_dir
from worker_etl_spark.queries import register
from worker_etl_spark.sources.tables import read_table
from worker_etl_spark.streaming.event_time import windowed_event_counts


@register(
    "evt01_watermarked_windows",
    oracle="""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))::TIMESTAMP AS win_start,
           to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 + 3600 AS BIGINT))::TIMESTAMP AS win_end,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
)
def evt01_watermarked_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return windowed_event_counts(e, window="1 hour", watermark="30 minutes").orderBy(
        "win_start", "event_type"
    )


@register(
    "evt02_session_windows",
    headline=True,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)                                  AS session_start,
           max(ts) + INTERVAL 30 MINUTE             AS session_end,
           CAST(count(*) AS BIGINT)                 AS n_events,
           round(sum(value), 2)                     AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def evt02_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session windows (F.session_window) pinned against an
    independent gap-sessionization derivation: new session when the gap is
    >= 30 min (half-open [start, last+gap) window), session_end =
    last event + gap."""
    from worker_etl_spark.streaming.event_time import session_window_aggregate

    e = read_table(spark, sf_dir, "events")
    return session_window_aggregate(e, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


@register(
    "evt03_interval_join",
    headline=True,
    oracle="""
    SELECT c.user_id,
           CAST(count(*) AS BIGINT)                 AS n_pairs,
           CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks_converted,
           round(sum(p.value), 2)                   AS attributed_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def evt03_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution inside a 1-hour window via the
    stream-stream ``interval_join`` operator, run here in batch mode (the
    operator is stream/batch agnostic; tests/test_event_time.py drives the
    SAME code path over two readStream sources and asserts pair-for-pair
    equality with this batch output)."""
    from worker_etl_spark.streaming.event_time import interval_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value")
    )
    pairs = interval_join(
        clicks, purchases, key_col="user_id",
        left_ts="click_ts", right_ts="purchase_ts", upper="1 hour",
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("click_id").alias("n_clicks_converted"),
            F.round(F.sum("purchase_value"), 2).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "evt04_interval_join_outer",
    oracle="""
    SELECT c.user_id,
           CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT CASE WHEN p.event_id IS NOT NULL
                                    THEN c.event_id END) AS BIGINT)
                                                      AS n_converted,
           round(count(DISTINCT CASE WHEN p.event_id IS NOT NULL
                                     THEN c.event_id END)
                 / CAST(count(DISTINCT c.event_id) AS DOUBLE), 6)
                                                      AS conversion_rate
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def evt04_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join — the conversion-funnel accounting evt03's
    inner join cannot express: every click appears, converted or not, so
    per-user conversion rates come straight off the joined frame.  Same
    stream/batch-agnostic operator with ``how='left_outer'``; on a stream
    the unmatched clicks emit only after the right watermark proves no
    purchase can still arrive (state-eviction-correct outer semantics)."""
    from worker_etl_spark.streaming.event_time import interval_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    pairs = interval_join(
        clicks, purchases, key_col="user_id",
        left_ts="click_ts", right_ts="purchase_ts", upper="1 hour",
        how="left_outer",
    )
    converted = F.when(F.col("purchase_id").isNotNull(), F.col("click_id"))
    return (
        pairs.groupBy("user_id")
        .agg(
            F.countDistinct("click_id").alias("n_clicks"),
            F.countDistinct(converted).alias("n_converted"),
            F.round(
                F.countDistinct(converted)
                / F.countDistinct("click_id").cast("double"),
                6,
            ).alias("conversion_rate"),
        )
        .orderBy("user_id")
    )


@register(
    "evt05_stream_dedup",
    headline=True,
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def evt05_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redelivery dedup: the event feed is unioned with a redelivered
    subset (every third event — simulating the at-least-once queue), then
    ``dedup_events`` collapses it back by event_id.  The oracle is the
    aggregate over the ORIGINAL feed: dedup is correct iff redelivery is
    invisible downstream.  The same operator runs as
    ``dropDuplicatesWithinWatermark`` on a stream (state bounded by the
    watermark horizon) — tests/test_event_time.py asserts the streaming
    path emits the identical row set."""
    from worker_etl_spark.streaming.event_time import dedup_events

    e = read_table(spark, sf_dir, "events")
    redelivered = e.unionAll(e.filter(F.col("event_id") % 3 == 0))
    return (
        dedup_events(redelivered, keys=["event_id"], watermark="1 hour")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "evt06_stream_static_enrich",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS total_value
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def evt06_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the third streaming join shape after
    stream-stream (evt03/evt04) and dedup (evt05): each micro-batch joins
    against a SLOWLY-CHANGING static dimension with no watermark and no
    join state (the static side is re-planned per batch, broadcast to every
    task).  This is how a 100 TB event stream picks up dimension attributes
    without shuffling the stream.  Runs identically in batch (this oracle)
    and over readStream (tests/test_event_time.py asserts row-set
    equality)."""
    from worker_etl_spark.streaming.event_time import enrich_with_dim

    e = read_table(spark, sf_dir, "events")
    nation = read_table(spark, sf_dir, "nation")
    enriched = enrich_with_dim(
        e, nation, F.col("user_id") % 25 == F.col("n_nationkey")
    )
    return (
        enriched.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("n_name")
    )


@register(
    "evt07_backfill_available_now",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type           AS last_event_type,
           round(value, 2)      AS last_value,
           ts                   AS last_ts
    FROM latest WHERE rn = 1 ORDER BY user_id
    """,
)
def evt07_backfill_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog drain through the exactly-once sink: the full event history
    lands as an 8-file backlog, ``Trigger.AvailableNow`` +
    ``maxFilesPerTrigger=3`` replays it as MULTIPLE micro-batches through
    ``stream_upsert_sink`` (ledgered foreachBatch upsert, latest-wins per
    user on event time), and the final warehouse table must equal the
    batch latest-wins oracle — batch/stream backfill equivalence on the
    SINK path, complementing the operator-level equivalences of
    evt01–evt06.  File arrival order is not time order, so correctness
    rides on the version column (``unix_micros(ts)``, unique per user in
    this feed; compose event_id into the version upstream if a feed has
    same-microsecond events per key), not on delivery order — exactly the
    at-least-once → exactly-once contract a 100 TB backfill needs."""
    import os

    from worker_etl_spark.streaming.sink import stream_upsert_sink

    e = read_table(spark, sf_dir, "events")
    tmp = fixture_dir("evt07")
    feed = os.path.join(tmp, "feed")
    wh = os.path.join(tmp, "warehouse")
    ckpt = os.path.join(tmp, "ckpt")
    e.repartition(8).write.mode("overwrite").parquet(feed)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(feed)
        # parquet reads the untagged ts as TIMESTAMP_NTZ; the session is
        # pinned UTC so the cast is value-preserving (see event_time.py)
        .withColumn("__v", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    q = stream_upsert_sink(
        stream, wh, "analytics", "user_state",
        key_cols=["user_id"], version_col="__v", checkpoint_dir=ckpt,
    )
    q.awaitTermination()

    final = spark.read.parquet(os.path.join(wh, "analytics", "user_state"))
    return final.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value"), 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
    ).orderBy("user_id")



# --- evt08: CUSUM drift detection (exact closed form of the stateful op) ------
@register(
    "evt08_cusum_alerts",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) - 5000 AS d
      FROM events
    ),
    pre AS (
      SELECT user_id, ts, event_id, d,
             sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM d
    ),
    st AS (
      SELECT user_id, d, p,
             p - least(0, min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)) AS s
      FROM pre
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)                          AS n_events,
           CAST(count(*) FILTER (WHERE s > 50000) AS BIGINT) AS n_alerts,
           CAST(max(s) AS BIGINT)                            AS max_s,
           -- final state = last prefix minus the global prefix-min
           CAST(sum(d) - least(0, min(p)) AS BIGINT)         AS final_s
    FROM st GROUP BY user_id ORDER BY user_id
    """,
)
def evt08_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift statistics — the BATCH closed form of the
    custom stateful streaming operator ``event_time.cusum_stateful``
    (S_i = P_i − min(0, min_{{j≤i}} P_j), P = running Σ(cents − k)): two
    exact-integer window functions (running sum, running min) replace the
    sequential recurrence, so the whole detector — alert counts, peak
    statistic, final state — is value-hash-checked cross-engine, and
    ``tests/test_event_time.py`` asserts the streaming operator emits the
    identical rows (stream/batch parity, the evt-family discipline).

    Scale: one shuffle on user_id; both windows share the single
    (user, ts, event_id) sort.  Alerts fire where S crosses h — spend-drift
    detection per account with O(1) state per key in the streaming form."""
    from pyspark.sql.window import Window as W

    from worker_etl_spark.streaming.event_time import (
        CUSUM_H_CENTS,
        CUSUM_K_CENTS,
    )

    e = read_table(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100, 0).cast("long") - CUSUM_K_CENTS).alias("d"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pre = d.withColumn("p", F.sum("d").over(w))
    st = pre.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    return (
        st.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("s") > CUSUM_H_CENTS, 1)).alias("n_alerts"),
            F.max("s").alias("max_s"),
            (F.sum("d") - F.least(F.lit(0).cast("long"), F.min("p"))).alias(
                "final_s"
            ),
        )
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_alerts").cast("long").alias("n_alerts"),
            F.col("max_s").cast("long").alias("max_s"),
            F.col("final_s").cast("long").alias("final_s"),
        )
        .orderBy("user_id")
    )


# --- evt09: record-high events (change-log compaction shape) ------------------
@register(
    "evt09_record_high_events",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, cents,
             max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
      FROM c
    )
    SELECT user_id, event_id, cents / 100.0 AS record_value
    FROM marked
    WHERE prev_max IS NULL OR cents > prev_max
    ORDER BY user_id, event_id
    """,
)
def evt09_record_high_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user record-high events — emit a row only when it strictly
    exceeds every prior value for that user (the change-log-compaction /
    personal-best shape behind leaderboards and high-water-mark alerting).
    Batch form: one window (running max over the (ts, event_id) order,
    frame ending 1 PRECEDING) + a filter, cent-exact.

    Streaming form (documented, not buildable in this environment): the
    natural fit is Spark 4's ``transformWithState`` v2 API — ONE BIGINT
    ``ValueState`` per key holding the running max, emit-on-exceed.  The
    v2 Python client speaks protobuf to the JVM and this container's
    ``google.protobuf`` is broken (no installs permitted), so the v1
    operators (``sessionize_stateful``, ``cusum_stateful`` —
    applyInPandasWithState) remain the tested stateful surface; the same
    semantics stream through ``cusum_stateful``'s fold pattern with a
    one-field state tuple if needed today.

    Scale: one shuffle on user_id; emitted rows are the record-setting
    subset (≪ input for any non-monotone value stream)."""
    from pyspark.sql.window import Window as W

    e = read_table(spark, sf_dir, "events")
    c = e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = c.withColumn("prev_max", F.max("cents").over(w))
    return (
        marked.filter(
            F.col("prev_max").isNull() | (F.col("cents") > F.col("prev_max"))
        )
        .select(
            "user_id",
            "event_id",
            (F.col("cents") / F.lit(100.0)).alias("record_value"),
        )
        .orderBy("user_id", "event_id")
    )


# --- evt10: event-time disorder diagnostics ------------------------------------
@register(
    "evt10_disorder_diagnostics",
    oracle="""
    WITH seq AS (
      SELECT event_type, ts,
             lag(ts) OVER (PARTITION BY event_type ORDER BY event_id) AS prev_ts
      FROM events
    ),
    d AS (
      SELECT event_type,
             (prev_ts IS NOT NULL AND ts < prev_ts) AS ooo,
             CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                  THEN CAST(epoch_us(prev_ts) - epoch_us(ts) AS BIGINT)
                  ELSE 0 END AS regress_us
      FROM seq
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                      AS n_events,
           CAST(count(*) FILTER (WHERE ooo) AS BIGINT)   AS n_out_of_order,
           round(count(*) FILTER (WHERE ooo)
                 / CAST(count(*) AS DOUBLE), 6)          AS ooo_rate,
           CAST(max(regress_us) // 1000000 AS BIGINT)    AS max_regress_seconds
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def evt10_disorder_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time DISORDER diagnostics — the measurement that sizes a
    watermark before anyone guesses one: treating event_id as arrival
    order, how often does event time regress against arrival order per
    stream, and by how much at worst?  The max regression IS the lateness
    bound a `withWatermark` delay must cover (evt01's '30 minutes' is a
    policy; this query is the evidence), and the rate says how much data a
    too-tight watermark would silently drop.

    Scale shape: one shuffle on event_type for the arrival-order window,
    then a type-grain aggregate; regression is exact epoch-µs integer
    arithmetic.  No reference counterpart (SURVEY.md §2)."""
    from pyspark.sql.window import Window as W

    e = read_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = W.partitionBy("event_type").orderBy("event_id")
    seq = e.select(
        "event_type", F.unix_micros(ts).alias("us"), F.col("event_id")
    ).withColumn("prev_us", F.lag("us").over(w))
    ooo = F.col("prev_us").isNotNull() & (F.col("us") < F.col("prev_us"))
    d = seq.select(
        "event_type",
        ooo.alias("ooo"),
        F.when(ooo, F.col("prev_us") - F.col("us")).otherwise(F.lit(0)).alias(
            "regress_us"
        ),
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("ooo"), 1)).alias("n_ooo"),
            F.max("regress_us").alias("max_regress_us"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_ooo").cast("long").alias("n_out_of_order"),
            F.round(
                F.col("n_ooo") / F.col("n_events").cast("double"), 6
            ).alias("ooo_rate"),
            F.expr("CAST(max_regress_us div 1000000 AS BIGINT)").alias(
                "max_regress_seconds"
            ),
        )
        .orderBy("event_type")
    )


# --- evt11: weekly seasonality profile -----------------------------------------
@register(
    "evt11_seasonality_profile",
    oracle="""
    WITH cells AS (
      SELECT isodow(ts) AS dow, hour(ts) AS hr,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(hr AS BIGINT)  AS hr,
           CAST(count(*) AS BIGINT) AS n,
           sum(c) / 100.0 AS total_value
    FROM cells GROUP BY dow, hr
    HAVING count(*) >= 5
    ORDER BY dow, hr
    """,
)
def evt11_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality heatmap (ISO day-of-week × hour) of purchase
    activity — the calendar profile behind capacity planning, anomaly
    baselines (q56's MAD thresholds become per-cell at scale), and
    trigger scheduling; sparse cells below a support floor are suppressed
    (a single-purchase cell is noise, not seasonality).  Day-of-week
    convention pinned to ISO (Mon=1) on both engines — Spark's default
    `dayofweek` is Sunday-first, a classic silent off-by-one against
    other systems, so the query uses `weekday()+1`.

    Scale: one scan + one 168-cell-max aggregate, map-side combined;
    cent-exact sums."""
    e = read_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cells = e.filter(F.col("event_type") == "purchase").select(
        (F.weekday(ts) + 1).alias("dow"),  # ISO: Mon=1 (dayofweek is Sun=1)
        F.hour(ts).alias("hr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    return (
        cells.groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("c") / F.lit(100.0)).alias("total_value"),
        )
        .filter(F.col("n") >= 5)
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hr").cast("long").alias("hr"),
            F.col("n").cast("long").alias("n"),
            "total_value",
        )
        .orderBy("dow", "hr")
    )


# --- evt12: dynamic-gap session windows ----------------------------------------
_EVT12_GAP_PURCHASE_S = 2700   # purchases keep sessions alive 45 min
_EVT12_GAP_DEFAULT_S = 900     # everything else: 15 min


@register(
    "evt12_dynamic_gap_sessions",
    oracle=f"""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase'
                  THEN {_EVT12_GAP_PURCHASE_S}000000
                  ELSE {_EVT12_GAP_DEFAULT_S}000000 END AS gap_us
      FROM events
    ),
    marked AS (
      SELECT user_id, us, gap_us,
             CASE WHEN us > coalesce(max(us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_s
      FROM g
    ),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid,
             us, gap_us
      FROM marked
    ),
    per_session AS (
      SELECT user_id, sid, count(*) AS n_events,
             (max(us + gap_us) - min(us)) AS span_us
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_sessions,
           CAST(sum(n_events) AS BIGINT)                     AS n_events,
           CAST(max(n_events) AS BIGINT)                     AS max_session_events,
           CAST(sum(span_us) // count(*) // 1000000 AS BIGINT)
                                                             AS avg_span_seconds
    FROM per_session
    """,
)
def evt12_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (``session_window`` with a per-EVENT
    gap expression — Spark's native support for the real-world rule
    "a purchase keeps the session alive longer than a pageview"): each
    event extends its session by its own type-dependent gap, sessions
    merge while they overlap.  The oracle re-derives the identical
    sessionization with the variable-gap island algorithm (new session ⇔
    ts exceeds the running max of prior ts+gap), proving the engine's
    native operator against first principles in exact epoch-µs integers.

    Scale: the native operator is a streaming-capable one-shuffle
    aggregate with watermark-bounded state (evt02's static-gap runtime,
    same machinery); the oracle's window formulation is the batch-only
    equivalent.  The corpus-level report keeps the output engine-
    comparable at any scale."""
    e = read_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    gap = F.when(
        F.col("event_type") == "purchase",
        F.lit(f"{_EVT12_GAP_PURCHASE_S} seconds"),
    ).otherwise(F.lit(f"{_EVT12_GAP_DEFAULT_S} seconds"))
    sessions = (
        e.select("user_id", ts.alias("ts"), "event_type")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("s_us"),
            F.unix_micros(F.col("win.end")).alias("e_us"),
            "n_events",
        )
    )
    return sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.expr(
            "CAST(sum(e_us - s_us) div count(*) div 1000000 AS BIGINT)"
        ).alias("avg_span_seconds"),
    )


# --- evt13: data-freshness gap alerting ----------------------------------------
_EVT13_EXPECTED_GAP_S = 1800  # alert when a stream goes quiet longer than this


@register(
    "evt13_freshness_gaps",
    oracle=f"""
    WITH seq AS (
      SELECT event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS prev_us
      FROM events
    ),
    gaps AS (
      SELECT event_type, (us - prev_us) AS gap_us
      FROM seq WHERE prev_us IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                     AS n_intervals,
           CAST(max(gap_us) // 1000000 AS BIGINT)       AS max_gap_seconds,
           CAST(sum(gap_us) // count(*) // 1000000 AS BIGINT)
                                                        AS avg_gap_seconds,
           CAST(count(*) FILTER (WHERE gap_us > {_EVT13_EXPECTED_GAP_S} * 1000000)
                AS BIGINT)                              AS n_gap_alerts
    FROM gaps GROUP BY event_type ORDER BY event_type
    """,
)
def evt13_freshness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness gap alerting — the ABSENCE detector completing
    evt10's disorder diagnostics: a healthy stream's inter-arrival gaps
    stay under the expected cadence, and every gap beyond the threshold
    is a delivery incident (upstream outage, stuck partition, dead
    producer) that row-level quality checks can't see because the
    missing rows aren't there to fail them.  Per stream: interval count,
    max/avg gap (exact epoch-µs integer arithmetic), and the alert
    count at the {_EVT13_EXPECTED_GAP_S}s threshold.

    Scale: one shuffle per the (type, ts) lag window, type-grain
    rollup; in production the same statistic runs incrementally per
    micro-batch with the previous batch's tail timestamp as state
    (cusum_stateful's one-tuple pattern)."""
    from pyspark.sql.window import Window as W

    e = read_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.unix_micros(ts).alias("us"), "ts", "event_id"
    ).withColumn("prev_us", F.lag("us").over(w))
    gaps = seq.filter(F.col("prev_us").isNotNull()).select(
        "event_type", (F.col("us") - F.col("prev_us")).alias("gap_us")
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.expr("CAST(max(gap_us) div 1000000 AS BIGINT)").alias(
                "max_gap_seconds"
            ),
            F.expr(
                "CAST(sum(gap_us) div count(*) div 1000000 AS BIGINT)"
            ).alias("avg_gap_seconds"),
            F.count(
                F.when(F.col("gap_us") > _EVT13_EXPECTED_GAP_S * 1_000_000, 1)
            )
            .cast("long")
            .alias("n_gap_alerts"),
        )
        .select(
            "event_type",
            F.col("n_intervals").cast("long").alias("n_intervals"),
            "max_gap_seconds",
            "avg_gap_seconds",
            "n_gap_alerts",
        )
        .orderBy("event_type")
    )


# --- evt14: incremental view maintenance with retractions -----------------------
@register(
    "evt14_incremental_view_maintenance",
    oracle="""
    WITH deltas AS (
      -- change feed over the base: strided deletes (retractions) and
      -- strided value corrections (delete old + insert new)
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, +1 AS mult
      FROM events
      UNION ALL
      SELECT event_type, CAST(round(value * 100) AS BIGINT), -1
      FROM events WHERE event_id % 11 = 0          -- retraction
      UNION ALL
      SELECT event_type, CAST(round(value * 100) AS BIGINT), -1
      FROM events WHERE event_id % 13 = 0          -- correction: retract old
      UNION ALL
      SELECT event_type, CAST(round(value * 100) AS BIGINT) + 250, +1
      FROM events WHERE event_id % 13 = 0          -- correction: insert new
    ),
    maintained AS (
      SELECT event_type,
             sum(mult) AS n, sum(mult * c) AS total_c
      FROM deltas GROUP BY event_type
    ),
    recomputed AS (
      SELECT event_type, count(*) AS n, sum(c) AS total_c FROM (
        SELECT event_type, CAST(round(value * 100) AS BIGINT)
                 + CASE WHEN event_id % 13 = 0 THEN 250 ELSE 0 END AS c
        FROM events WHERE event_id % 11 != 0
      ) GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT)            AS n_maintained,
           m.total_c / 100.0              AS total_maintained,
           (m.n = r.n AND m.total_c = r.total_c) AS matches_recompute
    FROM maintained m JOIN recomputed r USING (event_type)
    ORDER BY m.event_type
    """,
)
def evt14_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance WITH RETRACTIONS — the delta algebra
    under every materialized aggregate that must honor deletes and
    corrections (q52 merges append-only partials; real feeds retract):
    each change is a ±1-multiplicity delta, a correction is retract-old +
    insert-new, and the maintained view is the multiplicity-weighted
    aggregate of deltas — never a rescan.  The audit PROVES the IVM
    invariant by also recomputing from the net base and comparing exactly
    (cent-BIGINT arithmetic; matches_recompute must be true on every
    row — the invariant is part of the result contract).

    Scale: maintenance cost is delta-volume, not base-volume — the whole
    point; one multiplicity-weighted aggregate per refresh, algebraic so
    partials merge (q52's property extended to deletions).  This is the
    batch semantics of streaming OutputMode.Update sinks."""
    e = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    base = e.select("event_type", "event_id", cents.alias("c"))
    deltas = (
        base.select("event_type", "c", F.lit(1).alias("mult"))
        .unionByName(
            base.filter(F.col("event_id") % 11 == 0).select(
                "event_type", "c", F.lit(-1).alias("mult")
            )
        )
        .unionByName(
            base.filter(F.col("event_id") % 13 == 0).select(
                "event_type", "c", F.lit(-1).alias("mult")
            )
        )
        .unionByName(
            base.filter(F.col("event_id") % 13 == 0).select(
                "event_type", (F.col("c") + 250).alias("c"), F.lit(1).alias("mult")
            )
        )
    )
    maintained = deltas.groupBy("event_type").agg(
        F.sum("mult").alias("n"),
        F.sum(F.col("mult") * F.col("c")).alias("total_c"),
    )
    recomputed = (
        base.filter(F.col("event_id") % 11 != 0)
        .select(
            "event_type",
            (
                F.col("c")
                + F.when(F.col("event_id") % 13 == 0, 250).otherwise(0)
            ).alias("c"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("rn"), F.sum("c").alias("rtotal"))
    )
    return (
        maintained.join(recomputed, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_maintained"),
            (F.col("total_c") / F.lit(100.0)).alias("total_maintained"),
            (
                (F.col("n") == F.col("rn"))
                & (F.col("total_c") == F.col("rtotal"))
            ).alias("matches_recompute"),
        )
        .orderBy("event_type")
    )


# --- evt15: EWMA smoothing as an ordered fold over a bounded window -------------
@register(
    "evt15_ewma_smoothing",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour,
             sum(CAST(round(value * 100) AS BIGINT)) AS xc
      FROM events GROUP BY 1, 2
    ),
    folded AS (
      SELECT event_type, hour, xc,
             list_reduce(
               list_prepend(
                 CAST(0 AS BIGINT),
                 list(xc) OVER (PARTITION BY event_type ORDER BY hour
                                ROWS BETWEEN 31 PRECEDING AND CURRENT ROW)
               ),
               (acc, v) -> acc // 2 + v * 2147483648
             ) AS t
      FROM hourly
    )
    SELECT event_type,
           strftime(hour, '%Y-%m-%d %H:00') AS hour,
           CAST(xc AS DOUBLE) / 100.0       AS hourly_value,
           floor((CAST(t AS DOUBLE) / 4294967296.0 / 100.0) * 10000 + 0.5)
             / CAST(10000 AS DOUBLE)        AS ewma
    FROM folded
    ORDER BY event_type, hour
    """,
)
def evt15_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event value per
    type — the recursive smoother s_t = α·x_t + (1−α)·s_{t−1} (α = 0.5)
    expressed WITHOUT a sequential scan: weights decay below the emitted
    rounding after 32 halvings, so the recurrence truncated to the last
    32 hours becomes an ordered LEFT FOLD over a bounded window
    (`collect_list` ROWS 31 PRECEDING → `F.aggregate`).

    Cross-engine exactness (the q52/q66 integer discipline, applied
    after the round-3 parity failure on a round() half-tie): the fold is
    carried ENTIRELY in 64-bit integers.  Hourly totals are exact cent
    BIGINTs `xc`; the state is T = s·2^32 (s in cents), with step
    T' = T/2 + xc·2^31.  Within a ≤32-element window every term of T
    holds a factor 2^(31-lag) ≥ 2, so the halving is always exact
    integer division — no float enters the fold.  The emit then casts
    the identical integer to double in both engines (exact: |T| <
    2^53 while hourly totals stay under ~$21M, far past the test SFs;
    beyond that both engines round the cast identically), divides by
    the exact power of two, and rounds on a tie-free grid
    `floor(x·10⁴ + 0.5)/10⁴` — pure IEEE ops with no decimal-repr
    HALF_UP anywhere, so the hash is exact by construction.

    Scale: one shuffle to hourly grain, one per-type sort; window state
    is 32 longs per row — no unbounded frame, no driver loop.  The
    streaming form is a trivial `applyInPandasWithState` with one long
    of state per key."""
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("xc")
        )
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-31, W.currentRow)
    )
    folded = hourly.withColumn(
        "t",
        F.aggregate(
            F.collect_list("xc").over(w),
            F.lit(0).cast("long"),
            lambda acc, v: F.shiftright(acc, 1) + v * F.lit(2147483648),
        ),
    )
    ewma_d = folded["t"].cast("double") / F.lit(4294967296.0) / F.lit(100.0)
    return folded.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
        (F.col("xc").cast("double") / F.lit(100.0)).alias("hourly_value"),
        (F.floor(ewma_d * 10000 + F.lit(0.5)) / F.lit(10000.0)).alias("ewma"),
    ).orderBy("event_type", "hour")


# --- evt16: Holt double-exponential trend as a quantized-weight convolution -----
# The Holt recurrence  l' = α·x + (1−α)(l+b);  b' = β(l'−l) + (1−β)b  is linear,
# so (l,b)_t = Σ_k A^k·c·x_{t−k} with A = [[α, α], [β(α−1)+... ]] — concretely for
# α=0.5, β=0.3: A = [[0.5, 0.5], [−0.15, 0.85]], c = (0.5, 0.15).  Spectral
# radius √0.5, so a 64-lag truncation sits ~1e-10 under the emitted rounding.
# The weights A^k·c are computed ONCE here in Python doubles and quantized to an
# exact 1e-10 integer grid; BOTH engines then evaluate the identical
# integer-weight convolution over exact cent BIGINTs — sufficient statistics are
# bit-identical by construction (the round-3 parity failure was a struct-lambda
# fold whose emit rounded differently per engine; DuckDB 1.0 additionally
# mis-evaluates acc-field references inside struct-literal lambdas, so the
# oracle is now a lambda-free rn self-join against a VALUES weight table).
_HOLT_SCALE = 10_000_000_000  # 1e10: weight error ≤ 32·xc/1e12 ≪ the 1e-4 grid
# int64 OVERFLOW BOUND (round-4 ADVICE): the level convolution sums
# Σ_k xc_{t−k}·wl_k with Σ_k wl_k ≈ _HOLT_SCALE (the level weights sum to
# ~1 at the 1e10 scale), so l_num overflows int64 once a single hour's cent
# total reaches ~2^63/1e10 ≈ 9.2e8 cents — about **$9.2M per (event_type,
# hour)** — a TIGHTER bound than the ~$21M evt15 documents for its
# 2^(31-lag) factor ladder.  Spark wraps silently past it; DuckDB raises,
# so the parity gate would catch a breach loudly.  If real data approaches
# the bound, drop _HOLT_SCALE to 1e8 (still 1e-8 ≪ the 1e-4 emit grid,
# pushing the bound to ~$920M/hour) and re-pin the oracle — both engines
# share the constant, so the change is parity-neutral by construction.


def _holt_weights() -> list[tuple[int, int]]:
    lw, bw = 0.5, 0.15  # A^0·c
    out = []
    for _ in range(64):
        out.append(
            (
                math.floor(lw * _HOLT_SCALE + 0.5),
                math.floor(bw * _HOLT_SCALE + 0.5),
            )
        )
        lw, bw = 0.5 * lw + 0.5 * bw, -0.15 * lw + 0.85 * bw
    return out


_HOLT_W = _holt_weights()
_HOLT_VALUES = ", ".join(
    f"({k}, {wl}, {wb})" for k, (wl, wb) in enumerate(_HOLT_W)
)


@register(
    "evt16_holt_trend",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour,
             sum(CAST(round(value * 100) AS BIGINT)) AS xc
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, hour, xc,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour)
                  AS BIGINT) AS rn
      FROM hourly
    ),
    hw(k, wl, wb) AS (VALUES {_HOLT_VALUES}),
    conv AS (
      SELECT a.event_type, a.hour, a.xc,
             sum(b.xc * hw.wl) AS l_num,
             sum(b.xc * hw.wb) AS b_num
      FROM idx a
      JOIN idx b ON b.event_type = a.event_type
                AND b.rn BETWEEN a.rn - 63 AND a.rn
      JOIN hw ON hw.k = a.rn - b.rn
      GROUP BY 1, 2, 3
    )
    SELECT event_type,
           strftime(hour, '%Y-%m-%d %H:00') AS hour,
           CAST(xc AS DOUBLE) / 100.0       AS hourly_value,
           floor(CAST(l_num AS DOUBLE) / 1e12 * 10000 + 0.5)
             / CAST(10000 AS DOUBLE)        AS level,
           floor(CAST(b_num AS DOUBLE) / 1e12 * 10000 + 0.5)
             / CAST(10000 AS DOUBLE)        AS trend,
           floor(CAST(l_num + b_num AS DOUBLE) / 1e12 * 10000 + 0.5)
             / CAST(10000 AS DOUBLE)        AS forecast_next
    FROM conv
    ORDER BY event_type, hour
    """,
)
def evt16_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α = 0.5,
    β = 0.3) of hourly event value per type, with the one-step-ahead
    forecast level+trend — evt15's EWMA upgraded to a two-component
    linear recurrence, lowered to a 64-lag integer-weight convolution
    (see `_holt_weights` above for the derivation and the cross-engine
    exactness argument).  L = Σ W_l(k)·xc_{t−k} and B = Σ W_b(k)·xc
    are exact BIGINT sums whatever the partial-agg order; the emit
    casts them to double (exact below 2^53; identically rounded by both
    engines beyond) and lands on the tie-free grid
    `floor(x·10⁴ + 0.5)/10⁴`.

    Scale: one shuffle to hourly grain, one per-type sort, 64 longs of
    window state per row, weights broadcast as a 64-element array
    literal — no driver loop, no Python kernel.  The streaming form
    carries two longs of state per key, the flat-state shape
    `applyInPandasWithState` wants."""
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("xc")
        )
    )
    from pyspark.sql.window import Window as W

    win = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-63, W.currentRow)
    )
    wl_lit = F.array(*[F.lit(wl).cast("long") for wl, _ in _HOLT_W])
    wb_lit = F.array(*[F.lit(wb).cast("long") for _, wb in _HOLT_W])

    # element j (0-based) of an n-element frame is lag k = n-1-j, so its
    # 1-based weight index is n - j.
    def _conv(weights):
        return F.aggregate(
            F.transform(
                "arr",
                lambda x, j: x
                * F.element_at(weights, F.size(F.col("arr")) - j),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    conv = hourly.withColumn("arr", F.collect_list("xc").over(win)).select(
        "event_type",
        "hour",
        "xc",
        _conv(wl_lit).alias("l_num"),
        _conv(wb_lit).alias("b_num"),
    )

    def _emit4(col):
        return F.floor(col.cast("double") / F.lit(1e12) * 10000 + F.lit(0.5)) / F.lit(
            10000.0
        )

    return conv.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
        (F.col("xc").cast("double") / F.lit(100.0)).alias("hourly_value"),
        _emit4(F.col("l_num")).alias("level"),
        _emit4(F.col("b_num")).alias("trend"),
        _emit4(F.col("l_num") + F.col("b_num")).alias("forecast_next"),
    ).orderBy("event_type", "hour")


# --- evt17: CUSUM change-point localization --------------------------------------
@register(
    "evt17_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pre AS (
      SELECT event_type, day, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             sum(c) OVER (PARTITION BY event_type) AS s_n,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    scored AS (
      SELECT event_type, day, t, n,
             abs(n * s_t - t * s_n) AS dev
      FROM pre WHERE t < n
    ),
    best AS (
      SELECT event_type, day, t, n, dev,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY dev DESC, day) AS pick
      FROM scored
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d')   AS change_day,
           CAST(t AS BIGINT)           AS split_index,
           CAST(n AS BIGINT)           AS n_days,
           CAST(dev AS BIGINT)         AS scaled_deviation
    FROM best WHERE pick = 1
    ORDER BY event_type
    """,
)
def evt17_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point LOCALIZATION per stream: the day t maximizing the
    CUSUM deviation |n·S_t − t·S_n| — the standard estimator for a single
    mean shift (the batch dual of evt08's online CUSUM alerts, which answer
    "is it drifting NOW" while this answers "WHEN did the level change").
    Scaling the classic |S_t − (t/n)·S_n| by n keeps every term a product of
    exact BIGINT cents and row counts — no division anywhere, so the argmax
    can't flip on float noise; ties break to the earliest day on both
    engines.

    Scale: one event-scale daily aggregate (map-side partials), then three
    windows that all share ONE event_type-partitioned sort over day-grain
    rows (bounded |types|·|days|).  Magnitudes: S_n ≤ corpus cents (~1e13 at
    100 TB per type) × n (~1e4 days) < 2^63.  No reference counterpart
    (SURVEY.md §2 Part B: windows absent)."""
    from pyspark.sql.window import Window as W

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c")
    )
    w_run = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("c").over(w_run).alias("s_t"),
        F.row_number().over(W.partitionBy("event_type").orderBy("day")).alias("t"),
        F.sum("c").over(w_all).alias("s_n"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    scored = pre.filter(F.col("t") < F.col("n")).select(
        "event_type",
        "day",
        "t",
        "n",
        F.abs(F.col("n") * F.col("s_t") - F.col("t") * F.col("s_n")).alias("dev"),
    )
    best = scored.withColumn(
        "pick",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("dev"), F.asc("day"))
        ),
    ).filter(F.col("pick") == 1)
    return best.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        F.col("t").cast("long").alias("split_index"),
        F.col("n").cast("long").alias("n_days"),
        F.col("dev").cast("long").alias("scaled_deviation"),
    ).orderBy("event_type")


# --- evt18: OHLC conflation (candlestick rollup) ----------------------------------
@register(
    "evt18_ohlc_conflation",
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts, event_id)           AS rn_a,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_cents,
           CAST(max(c) AS BIGINT)                             AS high_cents,
           CAST(min(c) AS BIGINT)                             AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT)                           AS n_events,
           CAST(sum(c) AS BIGINT)                             AS vol_cents
    FROM r GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def evt18_ohlc_conflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC conflation — per (event_type, day) candlesticks: open/close are
    the first/last value by event time, high/low/volume the extremes and
    sum.  Conflation is THE downsampling operator of tick/metric pipelines
    (a 100 TB firehose becomes a bounded bar series consumers can hold).

    The Spark plan uses ``min_by``/``max_by`` with a (ts, event_id) struct
    comparator — open and close are decided INSIDE one hash aggregate, so
    the whole query is a single map-side-combinable pass with no window
    sort at all; the DuckDB oracle proves the same rows with two
    row_number windows.  The (ts, event_id) tiebreak makes first/last
    deterministic even under timestamp collisions.  Values are cents on
    the tie-free floor grid (v05 discipline) so every output is an exact
    integer.

    Streaming form: the identical aggregate under a watermarked
    ``window()`` (evt01's machinery) — min_by/max_by are algebraic, so the
    same partial-merge runs per micro-batch; this registered batch query
    is the replayable oracle of that stream."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    return (
        ev.groupBy("event_type", "day")
        .agg(
            F.expr("min_by(c, struct(ts, event_id))").cast("long").alias("open_cents"),
            F.max("c").cast("long").alias("high_cents"),
            F.min("c").cast("long").alias("low_cents"),
            F.expr("max_by(c, struct(ts, event_id))").cast("long").alias("close_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("c").cast("long").alias("vol_cents"),
        )
        .orderBy("event_type", "day")
    )


# --- evt19: streaming maintenance of the exact-dedup registry ----------------------
from worker_etl_spark.functions.text import sql_hex_int, sql_norm_text


@register(
    "evt19_streaming_dedup_registry",
    oracle=f"""
    WITH h AS (
      SELECT {sql_hex_int(sql_norm_text('text'), 15)} AS fp,
             doc_id
      FROM documents
    ),
    g AS (
      SELECT fp, min(doc_id) AS canonical, count(*) AS n FROM h GROUP BY fp
    )
    SELECT CAST(fp % 8 AS BIGINT)        AS bucket,
           CAST(count(*) AS BIGINT)      AS n_groups,
           CAST(sum(canonical) AS BIGINT) AS sum_canonical,
           CAST(sum(n) AS BIGINT)        AS n_docs,
           CAST(max(n) AS BIGINT)        AS max_group
    FROM g GROUP BY bucket ORDER BY bucket
    """,
)
def evt19_streaming_dedup_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING maintenance of the exact-dedup registry — the ingest-time
    face of the round-10 maintained-index posture (``operators/
    dedup_index.py``): the document feed arrives as a multi-file backlog,
    each micro-batch appends its per-fingerprint contribution
    ``(fp, min doc_id, count)`` as an LSM segment of the registry, and the
    final registry state — canonical (minimum) doc_id and occurrence count
    per content fingerprint — must equal the batch GROUP BY oracle.

    Exactly-once: appends are NOT idempotent under micro-batch replay, so
    each batch publishes its segment by ATOMIC RENAME — written to a staging
    dir outside the registry, renamed to ``batch-<id>`` in one filesystem
    operation, and the published dir's existence IS the commit marker.  A
    crash before the rename leaves only invisible staging (replay overwrites
    it and publishes once); a crash after it makes the replay a no-op — there
    is no window where the data landed but the marker didn't (the round-10
    marker-after-append ledger had exactly that double-append window).
    Order-independence: min/count are
    commutative monoids, so the folded registry is identical under ANY
    micro-batch partitioning or arrival order — the property that lets 1000
    executors ingest shards concurrently at 100 TB.  Read-time fold is one
    keyed aggregate over the segments; ``dedup_index.compact_index`` is the
    same offline fold applied in place.

    Scale: per-batch work is one map-side-combining aggregate of the batch
    (never re-reading the registry); registry growth is O(distinct
    fingerprints); the fold shuffles registry segments once on fp.  No
    reference counterpart (the reference reloads blindly, SURVEY.md §2 S6)."""
    import os

    from worker_etl_spark.functions.text import hex_int, norm_text

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = fixture_dir("evt19")
    feed = os.path.join(tmp, "feed")
    registry = os.path.join(tmp, "registry")
    staging_root = os.path.join(tmp, "staging")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(registry)
    os.makedirs(staging_root)
    d.repartition(8).write.mode("overwrite").parquet(feed)

    def append_segment(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(registry, f"batch-{batch_id}")
        if os.path.exists(final):
            return  # replayed, already published — exactly-once skip
        seg = (
            batch_df.select(
                hex_int(norm_text(F.col("text")), 15).alias("fp"), "doc_id"
            )
            .groupBy("fp")
            .agg(
                F.min("doc_id").alias("canonical"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # Stage outside the registry, publish with one atomic rename: the
        # published dir doubles as the commit marker (no append-then-mark
        # crash window; a replay after a crash overwrites the orphan
        # staging dir and publishes exactly once).  Portability: this
        # assumes a same-filesystem atomic rename (POSIX/HDFS); on an
        # S3-class object store the publish would ride a conditional PUT
        # of the marker instead — the same protocol note as
        # operators/segstore.py's manifest swap.
        staging = os.path.join(staging_root, f"batch-{batch_id}")
        seg.write.mode("overwrite").parquet(staging)
        os.rename(staging, final)

    q = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(feed)
        .writeStream.foreachBatch(append_segment)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    folded = (
        spark.read.parquet(os.path.join(registry, "batch-*"))
        .groupBy("fp")
        .agg(F.min("canonical").alias("canonical"), F.sum("n").alias("n"))
    )
    return (
        folded.groupBy((F.col("fp") % 8).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("canonical").cast("long").alias("sum_canonical"),
            F.sum("n").cast("long").alias("n_docs"),
            F.max("n").cast("long").alias("max_group"),
        )
        .orderBy("bucket")
    )
