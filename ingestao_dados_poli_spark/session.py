"""SparkSession factory with scale-sane defaults.

The reference creates no session of its own (Databricks injects one); the
engine owns session construction so every job runs with AQE, Arrow, and
partition sizing tuned for large inputs (reference:
etl/1-processing-banks.py:44 simply assumes `spark`).

Design notes for 100 TB:
- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion based on observed sizes.
- `spark.sql.shuffle.partitions` is only the *initial* number; AQE
  coalesces. On a real cluster set it ~2-3x total cores; locally we
  default to the local core count.
- Arrow enabled so any Pandas-UDF path (multimodal/vector ops) is
  batch-vectorized instead of row-pickled.
- Parquet filter pushdown + vectorized reader left at defaults (on).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Local mode = driver-only JVM; the 1g default OOMs under a full test
    # suite (32 task threads sharing one heap). Honored because the JVM is
    # launched lazily at getOrCreate. Overridable via env for small boxes.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~128 MB scan splits: good parallelism without tiny-task overhead.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.session.timeZone": "UTC",
    # managed-table warehouse off the repo tree (bucketed tables land here)
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"
    ),
    # Proleptic-Gregorian date/time PARSING (no silent legacy-calendar
    # fallback) — keeps timestamp parsing deterministic across JVMs.
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # NOTE: spark.sql.legacy.parquet.nanosAsLong is deliberately NOT a
    # session default: A/B-measured 1.7x slower events scans even on
    # micro-precision files (the legacy flag drops the vectorized
    # timestamp reader path). `_t` reads natively and retries under a
    # scoped flag only when the footer actually carries
    # TIMESTAMP(NANOS).
}


def get_spark(
    app_name: str = "ingestao-dados-poli-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    same entry points run on a cluster (where ``--master`` comes from
    spark-submit) and in local tests.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER_SET"):
        builder = builder.master(f"local[{cpus}]")
    elif master is not None:
        builder = builder.master(master)

    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        # Local default: one shuffle partition per core. On a cluster,
        # pass an explicit value (~2-3x total cores) or rely on AQE.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of a block, then restore the
    prior value (or unset if it had none). Session confs are process-
    global mutable state on a shared SparkSession; an unscoped ``set``
    leaks into every later query in the session. Use this for any conf
    a single query needs (legacy reader flags, per-stream sizing) so
    the session's defaults stay authoritative.
    """
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    if old == value:
        # Already in effect: setting (and later restoring) would be two
        # conf flips, and ANY conf flip invalidates session-level plan/
        # relation caches — measured ~0.3-0.5 s added per registry query
        # when the UTC pin toggled around every call. Read-only probe,
        # no mutation, no restore needed.
        yield
        return
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
