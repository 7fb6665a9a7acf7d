"""Count-min sketch: fixed-size frequency summaries with a one-sided
error guarantee (Cormode & Muthukrishnan 2005).

A CMS is a ``depth x width`` integer grid; every key increments one
cell per row (cell chosen by an independent hash of the key). A point
estimate reads those ``depth`` cells and takes the MIN — it can only
OVER-estimate (collisions add, never subtract), by at most
``2n/width`` with probability ``1 - 2^-depth``. The guarantee that
makes it a 100 TB primitive is MERGEABILITY: sketches of shards sum
cell-wise into the sketch of the union, so a fleet builds partials
map-side and one tiny reduce combines ``depth*width`` longs — the
frequency analogue of the HLL/theta/KLL family (q213/q216/q217).

Engine-portable hashing: cell index is md5-prefix arithmetic (the
q83/hash_bucket construction) salted with the row number, so any
engine — and the DuckDB oracle — rebuilds the identical grid.

Scale shape: ``build`` aggregates per key FIRST (one map-side-combined
groupBy on the raw data), then explodes the depth rows over the
VOCABULARY-sized frequency table, never over raw rows; the second
groupBy runs on ``<= depth * vocab`` rows. ``estimate`` broadcasts the
grid (``depth * width`` rows) into the probe join — no shuffle of the
probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(depth_col: Column, key_str: Column, width: int) -> Column:
    """Cell index for one grid row: 48 md5-prefix bits of
    ``"<depth>:<key>"`` reduced mod width — non-negative, identical in
    any engine that can md5 a string."""
    digest = F.md5(F.concat(depth_col.cast("string"), F.lit(":"), key_str))
    return (
        F.conv(F.substring(digest, 1, 12), 16, 10).cast("bigint") % width
    ).alias("bucket")


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the grid: ``(depth, bucket, cnt)`` rows, one per non-empty
    cell. Exact per-key counts are aggregated before the depth fan-out,
    so the explode multiplies the vocabulary, not the corpus."""
    freq = df.groupBy(
        F.col(key_col).cast("string").alias("_key")
    ).agg(F.count(F.lit(1)).alias("_n"))
    depths = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("depth")
    return (
        freq.select(depths, "_key", "_n")
        .select("depth", _cell(F.col("depth"), F.col("_key"), width), "_n")
        .groupBy("depth", "bucket")
        .agg(F.sum("_n").cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate every key in ``keys``: min over the key's
    ``depth`` cells. The grid (``<= depth*width`` rows) broadcasts into
    the probe join; missing cells cannot occur for keys the sketch has
    seen, but unseen keys hitting an empty cell estimate 0 via the
    coalesce. Returns ``keys`` columns + ``cms_est``."""
    probes = keys.select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth"),
    ).select(
        "*",
        _cell(F.col("depth"), F.col(key_col).cast("string"), width),
    )
    joined = probes.join(F.broadcast(cms), ["depth", "bucket"], "left")
    return joined.groupBy(*keys.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches — the sketch of the union
    of the inputs, EXACTLY (sum is associative/commutative; this is the
    property the two-level build already relies on)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
