"""Zone sinks: Parquet writes with modes, partitioning, bucketing.

Reference writes are plain overwrite-parquet with no partitioning
(gerenciando-dados-externos/0a:28,40,69; etl/1:79; etl/4:96). At 100 TB a
zone table must be partitioned (partition pruning on reads) and optionally
bucketed (shuffle-free joins on the bucket key), so the writer takes both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    target_file_partitions: int | None = None,
) -> None:
    """Write a zone table.

    ``partition_by``: hive-style directory partitioning → readers prune.
    ``max_records_per_file``: bound file sizes without an extra shuffle.
    ``target_file_partitions``: optional coalesce for small outputs (gold
    tables) so a 32-task local run doesn't emit 32 tiny files.
    """
    out = df
    if target_file_partitions is not None:
        out = out.coalesce(target_file_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC zone write with the same partition-pruning contract as
    ``write_parquet``."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_cols`` skip the
    shuffle entirely when both sides are bucketed the same way — the main
    lever for repeated 100 TB fact-to-fact joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
