"""Atomic versioned snapshot publishing — table-format-free time travel.

The reference publishes its gold table by overwriting in place
(etl/4-generate-final-table-gold.py:96): a writer that dies mid-write
leaves readers a half-table, and yesterday's snapshot is gone the
moment today's starts. This module is the minimal safe-publish
protocol on plain parquet directories, no Delta/Iceberg runtime:

- every publish writes a FRESH ``v=<n>`` directory (never in place);
- the ``_LATEST`` pointer file flips via write-temp + rename — atomic
  on HDFS/local (on object stores, where rename is copy+delete, the
  pointer file is small enough that the non-atomic window is one
  PUT; a reader never sees a partial SNAPSHOT either way, because
  data directories are immutable once the pointer names them);
- readers resolve the pointer first (``read_latest``) or pin a
  version (``read_version`` — reproducibility: a training run records
  the snapshot version it read, and reruns read the same bytes);
- ``vacuum`` deletes all but the newest ``keep`` snapshots and never
  the pointed-to one.

Pairs with ``operators.relational.snapshot_diff`` for version-to-
version change capture, and with ``quality.validate`` as the
publish gate (validate the candidate dir, flip the pointer only on
green — the write is invisible to readers until the flip).

Scale notes: the protocol costs ONE extra driver metadata op per
publish (the pointer flip) over a plain write; data movement is
identical. Snapshot dirs are immutable so caches/manifest listings
stay valid; vacuum bounds storage at keep x table size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ingestao_dados_poli_spark.sources import fs

_POINTER = "_LATEST"
_VDIR = re.compile(r".*/v=(\d+)$")


def _versions(spark: SparkSession, path: str) -> list[int]:
    if not fs.exists(spark, path):
        return []
    out = []
    for p in fs.ls(spark, path):
        m = _VDIR.match(p)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(spark: SparkSession, path: str) -> int | None:
    """Resolve the pointer; None when nothing is published yet."""
    ptr = f"{path}/{_POINTER}"
    if not fs.exists(spark, ptr):
        return None
    # tiny file: read driver-side through the Hadoop FS (works on any
    # scheme), not spark.read (no executor jobs for 8 bytes)
    jfs, jpath, _ = fs._fs(spark, ptr)
    stream = jfs.open(jpath)
    try:
        raw = []
        for _ in range(16):  # pointer is "<n>\n" — tiny by contract
            b = stream.read()
            if b < 0:
                break
            raw.append(b)
    finally:
        stream.close()
    digits = "".join(chr(b) for b in raw if chr(b).isdigit())
    return int(digits) if digits else None


def publish(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    **writer_options: str,
) -> int:
    """Write ``df`` as the next snapshot version and atomically flip
    the pointer to it. Returns the published version number. The data
    write happens BEFORE the flip, so a crash mid-write leaves the
    previous version live and a garbage ``v=<n>`` dir for vacuum —
    never a half-published table."""
    existing = _versions(spark, path)
    n = (existing[-1] if existing else 0) + 1
    vdir = f"{path}/v={n}"
    writer = df.write.mode("error")
    for k, v in writer_options.items():
        writer = writer.option(k, v)
    writer.parquet(vdir)
    tmp = f"{path}/{_POINTER}.tmp"
    jfs, jpath, _ = fs._fs(spark, tmp)
    stream = jfs.create(jpath, True)
    try:
        stream.write(bytearray(f"{n}\n".encode("ascii")))
    finally:
        stream.close()
    if fs.exists(spark, f"{path}/{_POINTER}"):
        fs.rm(spark, f"{path}/{_POINTER}", recursive=False)
    if not fs.rename(spark, tmp, f"{path}/{_POINTER}"):
        raise IOError(f"pointer flip failed for {path}")
    return n


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Pin a snapshot — the reproducibility contract: same version,
    same bytes, regardless of later publishes."""
    return spark.read.parquet(f"{path}/v={version}")


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    n = latest_version(spark, path)
    if n is None:
        raise FileNotFoundError(f"no published version under {path}")
    return read_version(spark, path, n)


def vacuum(spark: SparkSession, path: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` snapshots (and never the
    pointed-to one, even if older). Returns deleted versions."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    live = latest_version(spark, path)
    versions = _versions(spark, path)
    victims = [v for v in versions[:-keep] if v != live]
    for v in victims:
        fs.rm(spark, f"{path}/v={v}")
    return victims
