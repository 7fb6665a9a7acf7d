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
