"""File-level min/max statistics and driver-side scan pruning.

The lakehouse data-skipping pattern (Delta/Iceberg manifests, Snowflake
micro-partition pruning): record each file's per-column min/max once at
write time, then answer a selective query by reading ONLY the files
whose range overlaps the predicate — the 100 TB lever that turns a
full-table scan into a handful of files, provided the layout clusters
the column (repartitionByRange / Z-order write, `sources/writers.py`).

Stats come from parquet FOOTERS via pyarrow — no data scan at all; a
stats build touches metadata bytes only. The stats table itself is tiny
(one row per file x column) and is meant to live beside the data (or
in a versioned snapshot) like any manifest. Pruning is a driver-side
metadata operation on that table — same trust model as Delta log
replay: file counts are manifest-scale (1 row/file), never data-scale.

Spark's own reader prunes at ROW-GROUP level inside each file it was
already handed; this prunes the FILE LIST before any task launches,
which is what saves the listing/open/footer cost per excluded file and
lets a 1000-executor job schedule 20 tasks instead of 20 000.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _data_files(path: str) -> list[str]:
    """Parquet part files under ``path`` (or ``path`` itself when it is
    a single file). Local-fs implementation; on an object store this
    listing comes from the commit log instead."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max/null_count/num_rows for ``cols``, read from
    parquet footers (pyarrow) — metadata-only, no row is scanned.
    Returns a DataFrame (file, col, min_val, max_val, null_count,
    num_rows) with values stringified (ISO for timestamps) so one stats
    schema serves every column type; comparisons re-cast on use.
    """
    import pyarrow.parquet as pq

    rows = []
    for f in _data_files(path):
        md = pq.ParquetFile(f).metadata
        agg: dict[str, list] = {c: [None, None, 0] for c in cols}
        n_rows = md.num_rows
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                col = rg.column(c_i)
                name = col.path_in_schema
                if name not in agg or col.statistics is None:
                    continue
                st = col.statistics
                lo, hi, nulls = agg[name]
                if st.has_min_max:
                    agg[name][0] = st.min if lo is None else min(lo, st.min)
                    agg[name][1] = st.max if hi is None else max(hi, st.max)
                if st.null_count is not None:
                    agg[name][2] = nulls + st.null_count
        for c, (lo, hi, nulls) in agg.items():
            rows.append(
                (
                    f,
                    c,
                    None if lo is None else str(lo),
                    None if hi is None else str(hi),
                    nulls,
                    n_rows,
                )
            )
    return spark.createDataFrame(
        rows,
        "file string, col string, min_val string, max_val string, "
        "null_count long, num_rows long",
    )


def prune_files(
    stats: DataFrame,
    col: str,
    lo: str,
    hi: str,
    numeric: bool = False,
) -> tuple[list[str], int]:
    """Files whose [min,max] range for ``col`` overlaps [lo, hi].
    Default comparison is lexicographic — valid for ISO
    dates/timestamps and zero-padded keys, where the caller must pass
    bounds at the SAME textual precision the stats carry (e.g.
    '1997-01-31 23:59:59' against 'YYYY-MM-DD HH:MM:SS' stats).
    ``numeric=True`` re-casts both sides to float for number columns
    (where '9.0' > '10.0' lexicographically). Files with no stats for
    ``col`` are KEPT (pruning must never drop a file it cannot prove
    empty). Returns (files_to_read, total_files) — driver-side,
    manifest-scale.
    """
    rows = stats.filter(stats.col == col).select(
        "file", "min_val", "max_val"
    ).collect()
    conv = float if numeric else str
    lo_c, hi_c = conv(lo), conv(hi)
    keep = [
        r["file"]
        for r in rows
        if r["min_val"] is None
        or r["max_val"] is None
        or (conv(r["max_val"]) >= lo_c and conv(r["min_val"]) <= hi_c)
    ]
    return sorted(keep), len(rows)


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo: str,
    hi: str,
    numeric: bool = False,
) -> tuple[DataFrame, int, int]:
    """Read only the overlapping files. Returns (df, files_read,
    files_total). The caller still applies the row-level predicate —
    file pruning is a superset guarantee, not a filter."""
    files, total = prune_files(stats, col, lo, hi, numeric=numeric)
    if not files:
        raise ValueError(
            f"no file overlaps [{lo}, {hi}] on {col} — empty result; "
            "read the base path if an empty DataFrame is acceptable"
        )
    return spark.read.parquet(*files), len(files), total
