"""Structured Streaming surface.

The reference is batch-only; its one nod to incremental ingest is an
append-mode comment (gerenciando-dados-externos/0a:28). The engine
upgrades the landing zone to an OPTIONAL streaming source: the same
transforms run on `readStream` because DataFrame code is
execution-mode agnostic. Everything here is stock Structured Streaming —
file source, watermarks, tumbling/sliding windows, stateful
sessionization via applyInPandasWithState.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming landing-zone reader: picks up new files per micro-batch.
    ``maxFilesPerTrigger`` bounds batch size so one giant backfill drop
    doesn't produce an unbounded first batch."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window count+sum per key. Late rows beyond
    the watermark are dropped and their state evicted — bounded state is
    what makes this run forever at scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_len, slide).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact deduplication on ``id_cols``.

    With ``ts_col``+``watermark``, uses dropDuplicatesWithinWatermark:
    state for a key is EVICTED once the watermark passes it, so the
    operator runs forever on an unbounded stream (duplicates are only
    suppressed within the watermark horizon — the at-least-once-source
    contract). Without a watermark, state grows with distinct keys —
    only for bounded backfills."""
    if ts_col is not None and watermark is not None:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            id_cols
        )
    return events.dropDuplicates(id_cols)


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator: per-user session windows with idle-gap
    close, via applyInPandasWithState (the engine's template for any
    operator Spark's built-ins can't express). State per user is O(1).

    The event-time ``watermark`` is applied to the input so rows later
    than it are dropped BEFORE reaching state (bounded late-data
    semantics); processing-time timeout additionally evicts idle users'
    state. Batch (non-streaming) inputs skip the watermark — it is a
    streaming-only concept.

    ``ts_col``/``value_col``/``key_col`` select the event time, summed
    value, and grouping key; the OUTPUT schema is fixed (user_id,
    session_start, session_end, n_events, sum_value) regardless."""
    gap_ms = _duration_ms(gap)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield _session_row(user_id, start_ms, end_ms, n, total)
            return
        rows = pd.concat(list(batches))
        ts_ms = (rows[ts_col].astype("int64") // 1_000_000).to_numpy()
        vals = rows[value_col].to_numpy()
        order = ts_ms.argsort()
        cur = list(state.get) if state.exists else None
        closed: list[pd.DataFrame] = []
        for i in order:
            t, v = int(ts_ms[i]), float(vals[i])
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] <= gap_ms:
                cur[1], cur[2], cur[3] = max(cur[1], t), cur[2] + 1, cur[3] + v
            else:
                closed.append(_session_row(user_id, *cur))
                cur = [t, t, 1, v]
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutDuration(gap_ms)
        yield from closed

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _session_row(user_id: int, start_ms: int, end_ms: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(end_ms, unit="ms")],
            "n_events": [n],
            "sum_value": [total],
        }
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult


@contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query
    start — for a stateful stream this sets the number of STATE STORE
    shards, which is then frozen into the checkpoint for the query's
    lifetime.

    Stateful operators pay per-shard overhead every micro-batch (store
    open/commit/snapshot; a stream-stream join keeps FOUR stores per
    shard), so the shard count must track the stream's volume, not the
    session's batch-shuffle default: a low-volume stream at the 32-way
    batch default spends more time committing empty stores than
    joining (measured 7.4 s → 2.3 s on the q92 interval join at 8
    shards), while a 100 TB/day stream sizes shards so per-shard state
    fits executor memory. Restores the session default afterward so
    batch queries are unaffected.
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state(spark: SparkSession, bounded_memory_mb: int | None = None):
    """Scope the RocksDB state-store provider around a streaming query
    start — the LARGE-STATE path. The default HDFS-backed provider
    keeps every state key on the JVM heap, so state is capped by
    executor memory; RocksDB keeps the working set in native memory +
    local SSD with incremental checkpointing, which is how a 100 TB/day
    streaming dedup or sessionization holds billions of keys per
    executor without OOM. ``bounded_memory_mb`` additionally caps the
    TOTAL native block-cache+memtable footprint across all shards on an
    executor (off-heap memory is invisible to Spark's own memory
    manager, so unbounded RocksDB on a packed host gets the executor
    killed by the OS, not by Spark).

    Like ``state_partitions``, the provider is frozen into the
    checkpoint at first start; restores session conf afterward.
    """
    keys = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    }
    if bounded_memory_mb is not None:
        keys["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
        keys["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(
            bounded_memory_mb
        )
    # save/restore EVERY conf we touch — unsetting a key the session had
    # configured (e.g. its own RocksDB memory cap) would leave later
    # queries running unbounded, the exact failure this scope prevents
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, prior in old.items():
            if prior is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prior)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "60 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join bounded by an event-time interval: right
    rows within ``[left_ts - lookback, left_ts]`` for equal ``keys``
    — the funnel/attribution primitive (e.g. clicks preceding an
    error).

    Both inputs get watermarks and the join carries an explicit
    event-time range condition; together they let the engine EVICT
    buffered rows once they can no longer match (state is bounded by
    watermark + lookback, so the join runs forever on unbounded
    streams — an unconstrained stream-stream join would buffer both
    sides entirely). Output mode must be append (stream-stream join
    contract). Also works on batch frames (same plan, minus state).

    ``how='left_outer'`` additionally emits each unmatched left row
    once with nulls on the right side — but only after the watermark
    passes the point where a match could still arrive, so on a finite
    availableNow run the LAST window's outer rows stay buffered
    unless a later event advances the watermark past them (feed a
    sentinel row beyond max event time to flush; q290 demonstrates).
    Spark supports outer stream-stream joins ONLY with a watermark +
    event-time bound exactly like this one.
    """
    l = left.select(
        *[F.col(k).alias(f"l_{k}") for k in keys],
        F.col(left_ts).alias("l_ts"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
    )
    r = right.select(
        *[F.col(k).alias(f"r_{k}") for k in keys],
        F.col(right_ts).alias("r_ts"),
        *[F.col(c) for c in right.columns if c not in keys and c != right_ts],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l_{k}") == F.col(f"r_{k}"))
    cond = (
        cond
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond, how)


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> Any:
    """Parquet sink with checkpointing. ``trigger_once`` (availableNow)
    is the batch-like mode: process everything pending, then stop —
    ideal for incremental medallion hops run on a schedule."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quality_gated_foreach_batch(
    suite,
    publish_fn,
    quarantine_dir: str,
    staging_dir: str,
    reports: list | None = None,
):
    """foreachBatch body with the batch publish gate's quality
    discipline (``quality.py`` / ``versioned.publish`` composition) —
    closes the hole where a streaming MV maintenance sink published
    every micro-batch unconditionally while the batch path refused
    uncertified data.

    Stage → observe → promote, so the gate costs ZERO extra passes
    over the batch (the suite's aggregates ride the staging write via
    ``observe_suite``; a ``validate`` call would re-scan every batch):

    1. the micro-batch writes ONCE to ``staging_dir/batch_id=N`` with
       the observation attached;
    2. the report's suite-level ``certified`` verdict decides:
       certified → ``publish_fn(staged_df, batch_id)`` runs on the
       RE-READ staged parquet (publish consumes materialized data, no
       recompute of the batch plan); degraded → the staged files MOVE
       to ``quarantine_dir/batch_id=N`` (a metadata rename, the rows
       are preserved for triage) with ``_report.json`` beside them,
       and publish_fn never runs for that batch.

    ``reports`` (optional list) collects ``(batch_id, report)`` per
    batch. Gate keys on ``certified``, not ``success`` — same contract
    as the batch gate: sketch-tolerant unique checks must not promote
    data. Exactly-once note: promotion state lives in publish_fn's own
    idempotence (e.g. versioned publish / state overwrite keyed by
    batch_id), matching foreachBatch's at-least-once replay contract —
    a replayed batch re-stages and re-verdicts deterministically.
    """
    import json as _json
    import os
    import shutil

    from ingestao_dados_poli_spark.quality import observe_suite

    def body(batch_df: DataFrame, batch_id: int) -> None:
        observed, finish = observe_suite(batch_df, suite)
        staged = os.path.join(staging_dir, f"batch_id={batch_id}")
        observed.write.mode("overwrite").parquet(staged)
        report = finish()
        if reports is not None:
            reports.append((batch_id, report))
        if report.get("certified"):
            publish_fn(
                batch_df.sparkSession.read.parquet(staged), batch_id
            )
            shutil.rmtree(staged, ignore_errors=True)
        else:
            dst = os.path.join(quarantine_dir, f"batch_id={batch_id}")
            os.makedirs(quarantine_dir, exist_ok=True)
            shutil.rmtree(dst, ignore_errors=True)  # replayed batch
            shutil.move(staged, dst)
            with open(
                os.path.join(dst, "_report.json"), "w", encoding="utf-8"
            ) as fh:
                _json.dump(report, fh, ensure_ascii=False, indent=2)

    return body


def running_totals_tws(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum, max) via Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API to
    ``applyInPandasWithState`` (cf. ``sessionize``): typed state
    handles (ValueState) managed by the state store instead of one
    opaque per-key blob, composable timers, and TTL support. Each
    micro-batch updates the key's ValueState and emits the NEW running
    totals for keys seen in that batch (update semantics).

    Scale shape: state is partitioned by the group key across the
    state store's shuffle partitions (size via ``state_partitions``);
    per-batch work is Arrow-batched pandas over only the keys present
    in the batch.
    """
    try:
        import google.protobuf  # noqa: F401  (TWS state protocol dep)
    except ImportError as e:  # pragma: no cover - present on real clusters
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package (its "
            "state-server protocol); not installed in this container — "
            "use sessionize()'s applyInPandasWithState path instead"
        ) from e

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, s double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, s, mx = 0, 0.0, float("-inf")
            if self._totals.exists():
                n, s, mx = self._totals.get()
            for pdf in rows:
                vals = pdf[value_col].astype("float64")
                n += len(vals)
                s += float(vals.sum())
                mx = max(mx, float(vals.max()))
            self._totals.update((n, s, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via the BUILT-IN merging session_window
    (the declarative sibling of `sessionize`'s applyInPandasWithState):
    dynamic-gap windows merge as events arrive, the watermark closes a
    session once event time passes its end + gap, and closed sessions'
    state is evicted — bounded state on an unbounded stream. Works
    identically on batch DataFrames (q104) and streams (q152): the
    batch/stream parity Structured Streaming promises."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
