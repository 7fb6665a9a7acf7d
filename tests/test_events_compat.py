"""Round-6 conf-hygiene regression tests.

`_t`/`events_compat` read events NATIVELY and apply the nanosAsLong
legacy flag (scoped) only when the parquet footer actually carries
TIMESTAMP(NANOS) — the flag costs vectorized-reader throughput and a
conf flip invalidates session caches, so the fallback must fire ONLY
on the old testdata vintage. pyarrow can still write that vintage, so
the fallback path is testable without archaeological testdata.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ingestao_dados_poli_spark.registry._base import _t, events_compat


@pytest.fixture()
def nanos_sf_dir(tmp_path):
    """A sf-dir whose events.parquet uses TIMESTAMP(NANOS) — the
    round-1 driver vintage Spark's reader rejects without the legacy
    flag."""
    ts = pa.array(
        [dt.datetime(2024, 1, 10, 12, 0, 0), dt.datetime(2024, 1, 10, 13, 0, 0)],
        type=pa.timestamp("ns"),
    )
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "user_id": pa.array([10, 20], type=pa.int64()),
            "ts": ts,
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
        }
    )
    d = tmp_path / "sfnanos"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"), store_schema=False)
    return str(d)


def test_t_reads_nanos_vintage_via_fallback(spark, nanos_sf_dir):
    df = _t(spark, nanos_sf_dir, "events")
    # normalized to a true TIMESTAMP instant regardless of vintage
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    rows = {r.event_id: r.ts for r in df.collect()}
    assert rows[1] == dt.datetime(2024, 1, 10, 12, 0, 0)
    # the scoped fallback must not leak the legacy flag into the session
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )


def test_t_reads_micro_vintage_natively(spark, sf_dir):
    # current testdata: native read, no flag ever set
    df = _t(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )


def test_events_compat_scopes_only_when_needed(spark, sf_dir, nanos_sf_dir):
    with events_compat(spark, sf_dir):  # micro vintage: no-op
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            == "false"
        )
    with events_compat(spark, nanos_sf_dir):  # nanos vintage: flag scoped on
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        )
        n = spark.read.parquet(f"{nanos_sf_dir}/events.parquet").count()
        assert n == 2
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )


@pytest.fixture()
def scoped_conf_calls(monkeypatch):
    """Spy on the scoped_conf name _t/events_compat resolve: returns
    the list of positional-arg tuples it was invoked with. The spy
    still delegates, so behavior is unchanged — the tests only assert
    on whether the retry path was ENTERED."""
    import ingestao_dados_poli_spark.registry._base as B

    calls: list[tuple] = []
    real = B.scoped_conf

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(B, "scoped_conf", spy)
    return calls


def test_t_missing_events_raises_original_error(
    spark, tmp_path, scoped_conf_calls
):
    """The nanos fallback must fire ONLY on the TIMESTAMP(NANOS)
    schema-conversion failure — a missing file (or any other reader
    error) must surface the ORIGINAL exception, not a confusing second
    failure from the legacy-flag retry (round-6 advice).

    Asserting on the message alone is vacuous — a bare-except retry
    re-raises the SAME PATH_NOT_FOUND, and scoped_conf restores the
    flag on exit either way — so the test spies on scoped_conf and
    requires the retry path was never ENTERED, and separately that the
    flag never leaked into the host session (a retry through a direct
    conf.set would dodge the spy)."""
    empty = tmp_path / "sfempty"
    empty.mkdir()
    with pytest.raises(Exception) as ei:
        _t(spark, str(empty), "events")
    msg = str(ei.value)
    assert "PATH_NOT_FOUND" in msg or "Path does not exist" in msg, msg
    assert scoped_conf_calls == [], "legacy-flag retry ran on a non-nanos failure"
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )


def test_events_compat_missing_file_raises(spark, tmp_path, scoped_conf_calls):
    empty = tmp_path / "sfempty2"
    empty.mkdir()
    with pytest.raises(Exception) as ei:
        with events_compat(spark, str(empty)):
            pass
    msg = str(ei.value)
    assert "PATH_NOT_FOUND" in msg or "Path does not exist" in msg, msg
    assert scoped_conf_calls == [], "legacy-flag retry ran on a non-nanos failure"
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        == "false"
    )


def test_q_decorator_restores_host_timezone(spark, sf_dir):
    """The UTC pin is scoped to the query build: a host session's own
    timezone must be back in force after the call (round-5 verdict
    item 3 — no state leaks into a session the driver owns)."""
    import ingestao_dados_poli_spark.queries  # noqa: F401 — populate registry
    from ingestao_dados_poli_spark.registry._base import QUERIES

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
        df = QUERIES["q03_agg_pricing_summary"](spark, sf_dir)
        df.limit(1).collect()
        assert (
            spark.conf.get("spark.sql.session.timeZone")
            == "America/Sao_Paulo"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
