"""Structured Streaming tests: file-source micro-batches through the
windowed/stateful operators, with availableNow trigger so the suite
terminates deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from ingestao_dados_poli_spark.streaming import stream_ops as S

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_src"))
    rows = [
        (1, "2024-01-01 00:00:10", 1, "click", 1.0),
        (2, "2024-01-01 00:00:40", 1, "click", 2.0),
        (3, "2024-01-01 00:02:10", 1, "view", 3.0),
        (4, "2024-01-01 00:00:20", 2, "click", 4.0),
        # session gap > 30 min for user 1:
        (5, "2024-01-01 01:00:00", 1, "click", 5.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id", "event_type", "value"])
    df.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if sdf.isStreaming else "append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ck_{name}")
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts(spark, event_dir, tmp_path):
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    assert src.isStreaming
    agg = S.tumbling_counts(src, window_len="1 minute", watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == 3
    assert out[("2024-01-01 00:02:00", "view")] == 1
    assert out[("2024-01-01 01:00:00", "click")] == 1


def test_sessionize_stateful(spark, event_dir, tmp_path):
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    sess = S.sessionize(src, gap="30 minutes")
    q = (
        sess.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # availableNow processes all input in one batch; sessions still open
    # at end-of-stream stay in state, so we assert on the CLOSED one:
    closed = [r for r in rows if r.user_id == 1]
    assert len(closed) >= 1
    first = min(closed, key=lambda r: r.session_start)
    assert first.n_events == 3
    assert first.sum_value == 6.0


def test_sessionize_custom_column_names(spark, event_dir, tmp_path):
    # non-default ts/value/key column names must flow through to the
    # stateful fn (they were once hardcoded: regression guard).
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA).select(
        F.col("ts").alias("event_time"),
        F.col("user_id").alias("uid"),
        F.col("value").alias("amount"),
    )
    sess = S.sessionize(
        src, gap="30 minutes", ts_col="event_time", value_col="amount", key_col="uid"
    )
    q = (
        sess.writeStream.format("memory").queryName("sessions_renamed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2r"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions_renamed").collect()
    closed = [r for r in rows if r.user_id == 1]
    assert len(closed) >= 1
    first = min(closed, key=lambda r: r.session_start)
    assert first.n_events == 3
    assert first.sum_value == 6.0


def test_sliding_avg(spark, event_dir, tmp_path):
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    agg = S.sliding_avg(
        src, window_len="2 minutes", slide="1 minute", watermark="2 hours"
    )
    q = (
        agg.writeStream.format("memory").queryName("sliding")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.window_start), r.event_type): r.avg_value
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    # events at 00:00:10 (1.0), 00:00:40 (2.0), 00:00:20 (4.0) fall in the
    # 00:00-00:02 window AND the 23:59-00:01 window (2-min windows, 1-min slide)
    assert out[("2024-01-01 00:00:00", "click")] == pytest.approx(7.0 / 3)
    assert out[("2023-12-31 23:59:00", "click")] == pytest.approx(7.0 / 3)


def test_dedup_stream_drops_duplicate_ids(spark, event_dir, tmp_path):
    # duplicated delivery: the same source unioned with itself
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA).unionByName(
        S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    )
    deduped = S.dedup_stream(src, ["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_plain")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_plain").collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3, 4, 5]


def test_dedup_stream_within_watermark(spark, event_dir, tmp_path):
    # watermarked variant: same dedup result on this bounded input, but
    # the operator is dropDuplicatesWithinWatermark — state is evictable,
    # so it runs forever on unbounded streams.
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA).unionByName(
        S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    )
    deduped = S.dedup_stream(src, ["event_id"], ts_col="ts", watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_ddwm"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_wm").collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3, 4, 5]


def test_write_stream_parquet_roundtrip(spark, event_dir, tmp_path):
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    out_path = str(tmp_path / "out")
    q = S.write_stream_parquet(src, out_path, str(tmp_path / "ck3"))
    q.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == 5


def test_interval_join_streams(spark, event_dir, tmp_path):
    # clicks within 2 minutes BEFORE each view, same user. From the
    # fixture: view id=3 (user 1, 00:02:10) should match click id=2
    # (00:00:40, 90s before) but not id=1 (00:00:10, 120s+ before the
    # lookback edge is inclusive at exactly 2min: 00:02:10-2min=00:00:10,
    # so id=1 IS on the boundary and matches too).
    views = S.read_file_stream(spark, event_dir, EVENT_SCHEMA).filter(
        F.col("event_type") == "view"
    ).select("user_id", "ts", F.col("event_id").alias("view_id"))
    clicks = S.read_file_stream(spark, event_dir, EVENT_SCHEMA).filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", F.col("event_id").alias("click_id"))
    joined = S.interval_join_streams(
        views, clicks, keys=["user_id"], lookback="2 minutes",
        watermark="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_ivj"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT view_id, click_id FROM ivj").collect()
    assert sorted((r.view_id, r.click_id) for r in rows) == [(3, 1), (3, 2)]


def test_interval_join_batch_parity(spark, event_dir):
    # same operator on batch frames produces the identical pair set —
    # DataFrame code is execution-mode agnostic.
    ev = spark.read.parquet(event_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = S.interval_join_streams(views, clicks, keys=["user_id"], lookback="2 minutes")
    rows = joined.select("view_id", "click_id").collect()
    assert sorted((r.view_id, r.click_id) for r in rows) == [(3, 1), (3, 2)]


def test_running_totals_tws(spark, event_dir, tmp_path):
    # TWS ships a protobuf-based state protocol; container lacks protobuf.
    pytest.importorskip("google.protobuf")
    src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
    out = S.running_totals_tws(src)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM tws_totals").collect()}
    # single micro-batch → one update row per key with full totals
    assert rows[1].n_events == 4
    assert abs(rows[1].sum_value - 11.0) < 1e-9
    assert rows[1].max_value == 5.0
    assert rows[2].n_events == 1 and rows[2].max_value == 4.0


def test_rocksdb_state_store(spark, event_dir, tmp_path):
    """The RocksDB provider (the state-bigger-than-heap path) must
    actually engage: same watermarked aggregate as the HDFS-backed
    default, identical results, and the query progress must report
    rocksdb custom metrics — proof the native store held the state."""
    with S.rocksdb_state(spark, bounded_memory_mb=256):
        src = S.read_file_stream(spark, event_dir, EVENT_SCHEMA)
        agg = S.tumbling_counts(src, window_len="1 minute", watermark="2 hours")
        q = (
            agg.writeStream.format("memory").queryName("rocks")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck_rocks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = q.lastProgress
    out = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM rocks").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == 3
    assert out[("2024-01-01 00:02:00", "view")] == 1
    assert out[("2024-01-01 01:00:00", "click")] == 1
    ops = progress["stateOperators"]
    assert ops, progress
    custom = ops[0].get("customMetrics", {})
    assert any(k.startswith("rocksdb") for k in custom), custom


def test_quality_gated_foreach_batch_quarantines_degraded(spark, tmp_path):
    """The streaming publish gate: a micro-batch that fails the suite
    (NULL event_type against a not_null rule) must land in quarantine
    with its report — NOT in the published state — while certified
    batches publish normally. Mirrors the batch versioned.publish
    gate's `certified` contract."""
    import json
    import os

    from ingestao_dados_poli_spark.quality import Rule, Suite
    from ingestao_dados_poli_spark.streaming.stream_ops import (
        quality_gated_foreach_batch,
    )

    shard_dir = str(tmp_path / "shards")
    # 3 single-file shards = 3 micro-batches; shard 1 is degraded
    good1 = spark.createDataFrame([(1, "click", 1.0), (2, "view", 2.0)],
                                  "event_id: bigint, event_type: string, value: double")
    bad = spark.createDataFrame([(3, None, 4.0)],
                                "event_id: bigint, event_type: string, value: double")
    good2 = spark.createDataFrame([(4, "click", 8.0)],
                                  "event_id: bigint, event_type: string, value: double")
    for i, df in enumerate([good1, bad, good2]):
        df.coalesce(1).write.mode("overwrite").parquet(f"{shard_dir}/s={i}")

    published: list = []
    reports: list = []
    body = quality_gated_foreach_batch(
        Suite("gate", [Rule("not_null", "event_type")]),
        lambda df, bid: published.append(
            sorted((r.event_id, r.event_type) for r in df.collect())
        ),
        quarantine_dir=str(tmp_path / "quarantine"),
        staging_dir=str(tmp_path / "staging"),
        reports=reports,
    )
    src = (
        spark.readStream.schema(good1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{shard_dir}/s=*")
    )
    q_ = (
        src.writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination(300)

    flat = sorted(x for batch in published for x in batch)
    assert flat == [(1, "click"), (2, "view"), (4, "click")]  # bad row never published
    assert len(reports) == 3
    assert sum(1 for _, r in reports if not r["certified"]) == 1
    qdirs = os.listdir(str(tmp_path / "quarantine"))
    assert len(qdirs) == 1
    qpath = os.path.join(str(tmp_path / "quarantine"), qdirs[0])
    rows = spark.read.parquet(qpath).collect()
    assert [r.event_id for r in rows] == [3]
    with open(os.path.join(qpath, "_report.json")) as fh:
        rep = json.load(fh)
    assert rep["certified"] is False
    # staging fully drained: promoted batches cleaned up
    left = [
        d for d in os.listdir(str(tmp_path / "staging"))
        if not d.startswith(("_", "."))
    ] if os.path.isdir(str(tmp_path / "staging")) else []
    assert left == []


def test_interval_join_left_outer_batch_semantics(spark):
    """how='left_outer' on batch frames: matched left rows repeat per
    match, unmatched emit exactly once null-padded — the same
    multiplicity contract the streaming run (q290) relies on."""
    import datetime as dt

    from ingestao_dados_poli_spark.streaming import stream_ops as SO

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, ts(60)), (1, ts(200)), (2, ts(60))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(50)), (1, ts(55)), (2, ts(300))],
        "user_id long, ts timestamp",
    )
    out = SO.interval_join_streams(
        left,
        right,
        ["user_id"],
        lookback="30 minutes",
        watermark="10 minutes",
        how="left_outer",
    ).collect()
    got = sorted(
        (r.l_user_id, r.l_ts.minute + 60 * r.l_ts.hour,
         None if r.r_ts is None else r.r_ts.minute + 60 * r.r_ts.hour)
        for r in out
    )
    # user 1 @13:00 matches clicks @12:50 and @12:55; user 1 @15:20
    # has none in [14:50, 15:20]; user 2 @13:00 precedes its click
    assert got == [
        (1, 13 * 60, 12 * 60 + 50),
        (1, 13 * 60, 12 * 60 + 55),
        (1, 15 * 60 + 20, None),
        (2, 13 * 60, None),
    ]
