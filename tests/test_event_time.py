"""Event-time streaming: watermarked windows and stateful sessionization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from worker_etl_spark.sources.tables import read_table
from worker_etl_spark.streaming.event_time import (
    sessionize_stateful,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _events_stream(spark, tmp_path, n: int = 500):
    """Materialize a slice of events as a parquet dir and open it as a
    file stream (micro-batched one file at a time)."""
    # testdata parquet carries no tz annotation → TIMESTAMP_NTZ; normalize to
    # TIMESTAMP (session tz = UTC, value-preserving) so watermarks/state work.
    ev = (
        read_table(spark, SF, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("event_id")
        .limit(n)
    )
    src = str(tmp_path / "stream_src")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return ev, stream


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    ev, stream = _events_stream(spark, tmp_path)

    batch_out = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(ev).collect()
    }

    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_out = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert stream_out == batch_out
    assert len(stream_out) > 0


def test_watermark_present_in_stream_plan(spark, tmp_path):
    _, stream = _events_stream(spark, tmp_path, n=50)
    out = windowed_event_counts(stream, watermark="10 minutes")
    assert out.isStreaming
    assert "watermark" in out._jdf.queryExecution().analyzed().toString().lower()


def test_sessionize_stateful(spark, tmp_path):
    ev, stream = _events_stream(spark, tmp_path)
    gap = 1800

    q = (
        sessionize_stateful(stream, gap_seconds=gap)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.sql("SELECT * FROM sessions").collect()

    # availableNow ends the query before quiet-key timeouts fire, so only
    # sessions *closed by a later event* are emitted; every emitted session
    # must match the batch-computed gap sessionization exactly.
    batch = (
        ev.select("user_id", "ts", "value")
        .withColumn(
            "prev_ts",
            F.lag("ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy("ts")
            ),
        )
        .withColumn(
            "new_sess",
            (F.col("prev_ts").isNull())
            | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > gap),
        )
        .withColumn(
            "sess_id",
            F.sum(F.col("new_sess").cast("int")).over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy("ts")
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    batch_rows = batch.collect()
    batch_sessions = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in batch_rows
    }
    assert len(got) > 0
    for r in got:
        key = (r.user_id, r.session_start, r.session_end)
        assert key in batch_sessions
        assert batch_sessions[key] == (r.n_events, r.total_value)

    # Completeness on the decidable subset: every batch session that is NOT
    # the user's last (i.e. a later event closed it) must have been emitted —
    # so stream output EQUALS batch sessionization up to the open tails.
    last_end = {}
    for r in batch_rows:
        if r.user_id not in last_end or r.session_end > last_end[r.user_id]:
            last_end[r.user_id] = r.session_end
    emitted = {(r.user_id, r.session_start, r.session_end) for r in got}
    closed_batch = {
        (r.user_id, r.session_start, r.session_end)
        for r in batch_rows
        if r.session_end < last_end[r.user_id]
    }
    assert closed_batch <= emitted
    assert len(closed_batch) > 0


def test_interval_join_stream_matches_batch(spark, tmp_path):
    from worker_etl_spark.streaming.event_time import interval_join

    ev = read_table(spark, SF, "events").orderBy("event_id").limit(800)
    src = str(tmp_path / "ij_src")
    ev.coalesce(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("buy_ts"), F.col("event_id").alias("buy_id")
        )
        return clicks, buys

    batch_pairs = {
        (r.click_id, r.buy_id)
        for r in interval_join(
            *split(ev), key_col="user_id",
            left_ts="click_ts", right_ts="buy_ts", upper="1 hour",
        ).collect()
    }

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sc, sb = split(stream)
    q = (
        interval_join(
            sc, sb, key_col="user_id",
            left_ts="click_ts", right_ts="buy_ts", upper="1 hour",
        )
        .writeStream.format("memory")
        .queryName("ij_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    stream_pairs = {
        (r.click_id, r.buy_id) for r in spark.sql("SELECT * FROM ij_pairs").collect()
    }
    # Inner stream-stream joins emit every match once both sides arrive, so
    # the full pair set must equal the batch join exactly.
    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0


def test_windowed_counts_update_mode_incremental(spark, tmp_path):
    """Update-mode sink semantics: each micro-batch emits ONLY the refined
    groups, and replaying emissions in batch order converges to the batch
    answer.  Two interleaved file batches (even/odd event_ids spanning the
    same time range) force nearly every window to be updated twice, so the
    emission count strictly exceeds the distinct-group count — the
    observable difference between update and complete modes."""
    ev = read_table(spark, SF, "events").orderBy("event_id").limit(500)
    src = str(tmp_path / "upd_src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )

    # Long watermark: nothing is ever late, so update mode is pure
    # incremental refinement and must converge exactly to the batch result.
    batch_out = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(ev, watermark="30 days").collect()
    }

    emitted: list[tuple[int, list]] = []

    def sink(df, epoch_id):
        emitted.append((epoch_id, df.collect()))

    q = (
        windowed_event_counts(stream, watermark="30 days")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final: dict = {}
    n_emissions = 0
    for _, rows in sorted(emitted, key=lambda t: t[0]):
        for r in rows:
            final[(r.win_start, r.event_type)] = (r.n, r.total_value)
            n_emissions += 1
    assert final == batch_out
    assert n_emissions > len(final)  # refined groups re-emitted across batches


def test_watermark_drops_late_rows_append_mode(spark, tmp_path):
    """The watermark CONTRACT, asserted where Spark makes it strict: in
    APPEND mode a window is emitted exactly once when the watermark passes
    its end, and a straggler arriving after that finalization is dropped —
    it must neither re-emit the window nor change its count.  (Update mode
    is deliberately looser: a straggler landing in the first batch after
    the watermark advance still merges, because state eviction runs at
    batch END — we pin append, the mode with a hard guarantee.)"""
    import datetime as dt
    import time

    def mk(ts_list):
        return spark.createDataFrame(
            [(dt.datetime(2024, 3, 1, h, m), "a", 1.0) for (h, m) in ts_list],
            "ts timestamp, event_type string, value double",
        )

    src = str(tmp_path / "late_src")
    # b1 advances the watermark to 11:45; b2 (fresh row only) lets the 10:00
    # window finalize + evict; the b3 straggler then faces the sealed window;
    # b4 advances far enough to finalize 11:00 and 12:00 as a control.
    for batch in ([(10, 5), (10, 10), (11, 55)], [(12, 5)], [(10, 30)], [(13, 30)]):
        mk(batch).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)  # file stream orders batches by modification time

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    emitted = []

    def sink(df, epoch_id):
        emitted.append((epoch_id, df.collect()))

    q = (
        windowed_event_counts(stream, watermark="10 minutes")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = [(r.win_start, r.n) for _, rs in emitted for r in rs]
    ten = dt.datetime(2024, 3, 1, 10, 0)
    eleven = dt.datetime(2024, 3, 1, 11, 0)
    # 10:00 finalized once with count 2 — the straggler arriving a batch
    # after the seal left no trace (no re-emission, no count change)
    assert rows.count((ten, 2)) == 1
    assert all(n == 2 for w, n in rows if w == ten)
    # control: later windows finalize normally with the straggler dropped
    assert rows.count((eleven, 1)) == 1
    assert rows.count((dt.datetime(2024, 3, 1, 12, 0), 1)) == 1


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once sources re-deliver: dropDuplicatesWithinWatermark must
    drop a re-delivered event_id arriving in a LATER micro-batch (state
    remembers ids until the watermark passes), while distinct ids flow."""
    import datetime as dt
    import time

    def mk(rows):
        return spark.createDataFrame(
            [(int(i), dt.datetime(2024, 3, 1, h, m), "a") for (i, h, m) in rows],
            "event_id long, ts timestamp, event_type string",
        )

    src = str(tmp_path / "dedup_src")
    # id 1 delivered in batch 1 and re-delivered in batch 2 (same payload)
    for batch in ([(1, 10, 0), (2, 10, 5)], [(1, 10, 0), (3, 10, 10)]):
        mk(batch).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    from worker_etl_spark.streaming.event_time import dedup_events

    out = dedup_events(stream, keys=["event_id"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ids = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM dedup_stream").collect()
    )
    assert ids == [1, 2, 3]  # the re-delivery of id 1 was suppressed

    # batch lowering of the SAME operator call produces the identical id set
    batch_ids = sorted(
        r.event_id
        for r in dedup_events(
            spark.read.parquet(src), keys=["event_id"], watermark="1 hour"
        )
        .select("event_id")
        .collect()
    )
    assert batch_ids == ids


def test_interval_join_outer_stream_matches_batch(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: matched pairs must equal the
    batch join exactly; null-joined (unconverted) left rows emit only once
    the right watermark proves no match can arrive, so the streamed
    unmatched set is the batch unmatched set MINUS the tail still inside
    the final watermark — subset-with-tail, never a superset, and never a
    spurious null for a row that has a match."""
    from worker_etl_spark.streaming.event_time import interval_join

    ev = read_table(spark, SF, "events").orderBy("event_id").limit(800)
    src = str(tmp_path / "ijo_src")
    ev.coalesce(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("buy_ts"), F.col("event_id").alias("buy_id")
        )
        return clicks, buys

    batch = interval_join(
        *split(ev), key_col="user_id",
        left_ts="click_ts", right_ts="buy_ts", upper="1 hour",
        watermark="30 minutes", how="left_outer",
    ).collect()
    batch_matched = {(r.click_id, r.buy_id) for r in batch if r.buy_id is not None}
    batch_unmatched = {r.click_id for r in batch if r.buy_id is None}

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sc, sb = split(stream)
    q = (
        interval_join(
            sc, sb, key_col="user_id",
            left_ts="click_ts", right_ts="buy_ts", upper="1 hour",
            watermark="30 minutes", how="left_outer",
        )
        .writeStream.format("memory")
        .queryName("ijo_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("SELECT * FROM ijo_pairs").collect()
    stream_matched = {(r.click_id, r.buy_id) for r in rows if r.buy_id is not None}
    stream_unmatched = {r.click_id for r in rows if r.buy_id is None}

    assert stream_matched == batch_matched and len(batch_matched) > 0
    # No click may appear both null-joined and matched in the stream output.
    assert not (stream_unmatched & {c for c, _ in stream_matched})
    # Unmatched clicks: subset of batch's, missing only the watermark tail.
    assert stream_unmatched <= batch_unmatched


def test_stream_upsert_sink_exactly_once(spark, tmp_path):
    """foreachBatch upsert: streamed micro-batches merge by key (last
    version wins), a marker ledger makes replay a no-op, and re-running the
    stream over the same source+checkpoint adds nothing."""
    import os
    import time

    from worker_etl_spark.streaming.sink import stream_upsert_sink

    src = str(tmp_path / "upsert_src")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v string, version long")

    # batch 1: keys 1,2 @v1; batch 2: key 2 updated @v2 + new key 3
    for rows in ([(1, "a", 1), (2, "b", 1)], [(2, "b2", 2), (3, "c", 1)]):
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)

    schema = spark.read.parquet(src).schema

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_upsert_sink(
            stream, wh, "ds", "t", key_cols=["k"], version_col="version",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(180)

    run_stream()
    loc = os.path.join(wh, "ds", "t")
    got = {
        (r.k, r.v, r.version)
        for r in spark.read.parquet(loc).select("k", "v", "version").collect()
    }
    assert got == {(1, "a", 1), (2, "b2", 2), (3, "c", 1)}
    markers = set(os.listdir(os.path.join(wh, "ds", "t.__batches__")))
    assert len(markers) >= 2

    # restart over the same checkpoint: nothing new to process, table stable
    run_stream()
    again = {
        (r.k, r.v, r.version)
        for r in spark.read.parquet(loc).select("k", "v", "version").collect()
    }
    assert again == got


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static join: each micro-batch joins the broadcast static dim;
    the accumulated streamed aggregate must equal the batch join, and the
    streaming plan must carry no watermark/state requirement."""
    from worker_etl_spark.streaming.event_time import enrich_with_dim

    ev = read_table(spark, SF, "events").orderBy("event_id").limit(400)
    nation = read_table(spark, SF, "nation")
    src = str(tmp_path / "enrich_src")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    cond = F.col("user_id") % 25 == F.col("n_nationkey")
    batch = {
        (r.n_name, r.event_id)
        for r in enrich_with_dim(ev, nation, cond).select("n_name", "event_id").collect()
    }

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        enrich_with_dim(stream, nation, cond)
        .select("n_name", "event_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.n_name, r.event_id)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_cusum_stateful_matches_batch_closed_form(spark, tmp_path):
    """The stateful CUSUM operator must emit, per user, exactly the values
    the exact-integer closed form (evt08's window formulation) computes:
    S_i = P_i - min(0, min_{j<=i} P_j).  Timeout-flushed output requires a
    live trigger (availableNow stops before timeouts fire), so the query
    runs on a short processing-time trigger and the test polls until every
    user's summary lands."""
    import time as _time

    from pyspark.sql.window import Window as W

    from worker_etl_spark.streaming.event_time import (
        CUSUM_H_CENTS,
        CUSUM_K_CENTS,
        cusum_stateful,
    )

    ev, stream = _events_stream(spark, tmp_path, n=300)

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100, 0).cast("long") - CUSUM_K_CENTS).alias("d"),
    )
    pre = d.withColumn("p", F.sum("d").over(w))
    st = pre.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    batch = {
        r.user_id: (r.n_events, r.n_alerts, r.max_s, r.final_s)
        for r in st.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("s") > CUSUM_H_CENTS, 1)).alias("n_alerts"),
            F.max("s").alias("max_s"),
            (
                F.sum("d") - F.least(F.lit(0).cast("long"), F.min("p"))
            ).alias("final_s"),
        )
        .collect()
    }

    q = (
        cusum_stateful(stream, timeout_ms=2_000)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = _time.time() + 120
    got = {}
    try:
        while _time.time() < deadline:
            got = {
                r.user_id: (r.n_events, r.n_alerts, r.max_s, r.final_s)
                for r in spark.sql("SELECT * FROM cusum_out").collect()
            }
            if len(got) >= len(batch):
                break
            _time.sleep(2)
    finally:
        q.stop()
    assert got == batch
