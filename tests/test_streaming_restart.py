"""Checkpoint-restart correctness: a streaming job killed between
micro-batches and restarted from its checkpoint must produce exactly
the batch-equivalent result — no duplicates, no gaps. This is the
exactly-once contract of the file-source + file-sink pair (source
offsets and sink commit log both live in the checkpoint), exercised
with a REAL stop/restart, not a single availableNow run."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    # phase 1: two source files, run to completion, STOP
    ev.filter("event_id % 4 = 0").coalesce(1).write.mode("append").parquet(src_dir)
    ev.filter("event_id % 4 = 1").coalesce(1).write.mode("append").parquet(src_dir)

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .withColumn("doubled", F.col("value") * 2)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    n_phase1 = spark.read.parquet(out_dir).count()
    assert n_phase1 == ev.filter("event_id % 4 in (0, 1)").count()

    # phase 2: two MORE files arrive; restart from the SAME checkpoint
    ev.filter("event_id % 4 = 2").coalesce(1).write.mode("append").parquet(src_dir)
    ev.filter("event_id % 4 = 3").coalesce(1).write.mode("append").parquet(src_dir)
    run_once()

    out = spark.read.parquet(out_dir)
    # exactly-once: every source row exactly once, phase-1 rows NOT re-emitted
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()
    # value transform applied consistently across the restart boundary
    bad = out.filter(F.abs(F.col("doubled") - 2 * F.col("value")) > 1e-9)
    assert bad.count() == 0
    # the sink's commit log is what makes a partial output invisible
    assert (pathlib.Path(out_dir) / "_spark_metadata").exists()


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """The NEGATIVE watermark case, pinned: in append mode a row
    arriving after the watermark passed its window is DROPPED — the
    streaming result legitimately differs from a batch aggregate over
    the same rows. (The registry's streaming-vs-batch oracles rely on
    single-batch/complete-mode setups where the watermark never fires;
    this test proves the eviction actually works when it should.)"""
    import pathlib

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    schema = "event_id long, ts timestamp, value double"

    def write_file(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run after EACH file: the checkpoint carries the watermark forward
    # and pins the processing order (same-mtime files otherwise arrive
    # in arbitrary order within one availableNow run).
    # batch 1: two rows in the 10:00 window
    write_file([(1, t0, 1.0), (2, t0 + dt.timedelta(minutes=5), 1.0)], "f1")
    run()
    # batch 2: an event far ahead pushes the watermark past 10:10...
    write_file([(3, t0 + dt.timedelta(hours=2), 1.0)], "f2")
    run()
    # batch 3: ...so this LATE row for the closed 10:00 window must drop
    write_file([(4, t0 + dt.timedelta(minutes=7), 9.0)], "f3")
    run()

    rows = {r["ws"]: r["n"] for r in spark.read.parquet(out).collect()}
    # the 10:00 window emitted with the ON-TIME count only
    assert rows.get(t0) == 2, rows
    # and the late event_id=4 never resurrected it
    assert all(n != 3 for n in rows.values())
