"""Time-series repair operators: forward fill and linear interpolation
over gappy per-key series.

Not in the reference (batch ETL over complete tables); added because
sensor/metric feeds at scale always arrive with holes, and the repair
must happen distributed — both operators are pure window algebra (one
shuffle on the series key, linear work per partition), no UDFs, no
driver involvement, and they compose with the engine's date-spine
query (q70) for grid densification before interpolation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fill_forward(
    df: DataFrame,
    value_col: str,
    *,
    partition_by: list[str],
    order_by: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-null observation forward within each key's
    order (LOCF). Leading nulls (no prior observation) stay null.
    One window, rows-unbounded-preceding frame — Spark evaluates it in
    a single pass per sorted partition."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(F.col(value_col), ignorenulls=True).over(w)
    return df.withColumn(out_col or value_col, filled)


def linear_interpolate(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    partition_by: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """Linearly interpolate null values between their nearest non-null
    neighbors in event time; leading/trailing nulls fall back to the
    single available neighbor (nearest-fill) and all-null series stay
    null. ``ts_col`` must be numeric (epoch seconds/millis).

    Algebra: four window expressions — previous/next non-null value
    (last/first with ignorenulls over backward/forward frames) and the
    timestamps AT those observations (same frames over a ts-masked
    column) — then one lerp. Two sorted passes per partition, no
    self-join of observations to gaps (the naive formulation, which is
    a range join and quadratic in gap length).
    """
    out_col = out_col or value_col
    v = F.col(value_col)
    t = F.col(ts_col)
    back = (
        Window.partitionBy(*partition_by)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*partition_by)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_at_obs = F.when(v.isNotNull(), t)
    pv = F.last(v, ignorenulls=True).over(back)
    pt = F.last(t_at_obs, ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    nt = F.first(t_at_obs, ignorenulls=True).over(fwd)
    lerp = pv + (nv - pv) * (t - pt) / (nt - pt)
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)  # leading gap → nearest (next) obs
        .when(nv.isNull(), pv)  # trailing gap → nearest (prev) obs
        .when(nt == pt, pv)
        .otherwise(lerp)
    )
    return df.withColumn(out_col, interp)


def gap_flags(
    df: DataFrame,
    ts_col: str,
    *,
    partition_by: list[str],
    max_gap: int | float,
    flag_col: str = "gap_exceeded",
) -> DataFrame:
    """Flag rows whose time since the previous observation exceeds
    ``max_gap`` (same units as ``ts_col``) — the guard that keeps
    interpolation honest: repairing across an outage is fabrication,
    and downstream should see the flag, not a smooth lie."""
    w = Window.partitionBy(*partition_by).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    return df.withColumn(flag_col, F.coalesce(gap > max_gap, F.lit(False)))


def cusum_upper(
    df: DataFrame,
    value_col: str,
    order_col: str,
    target: Column,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """One-sided upper CUSUM control chart (Page 1954):
    ``s_t = max(0, s_{t-1} + x_t - target)`` — the standard
    change-point statistic for detecting a sustained upward shift in
    a metric stream. The recursion looks inherently sequential, but
    its closed form is pure window algebra:
    ``s_t = p_t - min(0, min_{j<=t} p_j)`` where ``p`` is the prefix
    sum of ``(x - target)`` — so the whole chart is two cumulative
    windows over one sorted exchange, no iteration, no UDF.

    Keep ``value_col``/``target`` in integer units (cents, counts) —
    the identity is then exact on any engine. Adds ``cusum``. With no
    ``partition_cols`` the caller must feed a POST-AGGREGATION series
    (the registry-wide global-window invariant); per-key charts pass
    the key columns and scale linearly per key.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("_p", F.sum(F.col(value_col) - target).over(w))
    return out.withColumn(
        "cusum", F.col("_p") - F.least(F.lit(0), F.min("_p").over(w))
    ).drop("_p")
