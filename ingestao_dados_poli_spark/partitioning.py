"""Partition-shape utilities.

At 100 TB a parquet directory yields hundreds of thousands of scan
splits and none of this matters. The failure mode these helpers guard
is the opposite end: a source whose physical layout under-splits (one
giant row group, a single gzip'd file, a small dimension feeding a
compute-heavy operator), which silently serializes everything
downstream on one core. ``fan_out`` is a no-op whenever the input is
already at least as parallel as the session default, so it is safe to
leave in place at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``target`` partitions (default: the
    session's ``defaultParallelism``) before a compute-heavy stage.

    Signature computation, regex folds, and Pandas-UDF batches cost far
    more per row than one round-robin shuffle of the raw rows — but only
    repartition when the scan actually under-splits (e.g. parquet with a
    single row group, which caps split parallelism at 1 regardless of
    ``spark.sql.files.maxPartitionBytes``). Already-parallel inputs pass
    through untouched, so this never adds a shuffle at real scale.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
