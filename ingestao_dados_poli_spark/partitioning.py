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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_partitions(spark) -> int:
    """The session's ``spark.sql.shuffle.partitions`` as an int, falling
    back to ``defaultParallelism`` when the conf is absent or non-numeric
    (e.g. a deployment that sets it to ``auto`` for an external AQE
    policy). Shared by every explicit repartition-pin site so the
    fallback semantics cannot drift between copies (r07 ADVICE)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return spark.sparkContext.defaultParallelism


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``target``-way parallelism (default:
    the session's ``defaultParallelism``) before a compute-heavy stage.

    Signature computation, regex folds, and Pandas-UDF batches cost far
    more per row than one round-robin shuffle of the raw rows — but only
    repartition when the scan actually under-splits (e.g. parquet with a
    single row group, which caps split parallelism at 1 regardless of
    ``spark.sql.files.maxPartitionBytes``). Already-parallel inputs pass
    through untouched, so this never adds a shuffle at real scale.

    The under-split probe reads scan metadata (``df.inputFiles()`` —
    logical analysis only), NOT ``df.rdd.getNumPartitions()``: ``.rdd``
    forces full physical planning plus a Python↔JVM plan conversion on
    every call, and reports the pre-AQE partition count anyway. A source
    backed by fewer files than ``target`` cannot exceed one task per
    row group in the worst case, so file count is the conservative
    under-split signal; non-file-backed inputs (createDataFrame, post-
    shuffle stages) report zero files and pass through untouched —
    their parallelism was already set by the session defaults.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # plans inputFiles can't traverse (e.g. streaming)
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` keys by frequency with their share of all rows — the
    skew diagnostic to run BEFORE picking a join/agg strategy: a top key
    holding more than ~1/parallelism of the rows means salting or AQE
    skew-join; a key table small enough to broadcast shows up as a tiny
    distinct count.

    Scale shape: ONE map-side-combined groupBy produces the per-key
    counts; top-k comes from orderBy+limit over that grouped table
    (TakeOrderedAndProject — per-partition heaps, never a global sort);
    the total for the share column is an aggregate of the same grouped
    table joined back by broadcast. ``persist=True`` (default) caches
    the grouped table so the raw input is scanned once even though two
    plans hang off it; the k-row result is then materialized eagerly
    (``localCheckpoint``) so the cache can be RELEASED before returning
    — no session-lifetime leak per call. Pass False when the input is
    itself trivially recomputable (skips both the cache and the eager
    materialization, returning a fully lazy plan).
    """
    keys = [F.col(c) for c in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    if persist:
        counts = counts.persist()
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.col("n").desc(), *[c.asc() for c in keys]).limit(k)
    out = top.crossJoin(F.broadcast(total)).select(
        *key_cols,
        F.col("n"),
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
    )
    if persist:
        # k rows — eager cut of the lineage, then drop the big cache.
        out = out.localCheckpoint(eager=True)
        counts.unpersist()
    return out


def morton_code(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) interleave of 2+ non-negative int columns, each
    already bucketed to ``[0, 2**bits)``: bit ``i`` of column ``j``
    lands at output bit ``i*n + j``, so rows close in EVERY dimension
    get close codes — the multi-column locality that lets a range-
    partitioned, z-sorted layout serve min/max data skipping on ALL
    cluster columns at once, not just the leading sort key.

    Built as a flat sum of ``bits * n`` shift/mask terms — pure
    whole-stage-codegen integer ops, no UDF, no shuffle. Total output
    bits must fit a long (``bits * n <= 62``).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code needs >= 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} overflows a long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z
