"""Privacy auditing for training-data release: k-anonymity and
l-diversity over quasi-identifier columns, plus suppression.

A released dataset is k-anonymous when every combination of
quasi-identifier (QI) values is shared by >= k rows (Sweeney 2002) —
below that, a QI combination re-identifies individuals by join with
public data. l-diversity (Machanavalkshmi et al. 2007) additionally
requires >= l distinct SENSITIVE values inside each QI group, closing
the homogeneity attack k-anonymity alone permits. Complements the
regex PII scrub (`functions/text.py`, q53): scrubbing removes literal
identifiers, these audit the STATISTICAL re-identification surface.

Scale shape: the audit is one map-side-combined groupBy on the QI
columns; suppression anti-joins the data against the VIOLATING group
set, which is the small side by construction (the long tail below k)
— AQE broadcasts it. Never a window over the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-QI-group audit: (qi..., n, satisfies_k [, l_div]). ``l_div``
    is the count of distinct ``sensitive_col`` values in the group —
    check it against your l threshold. One shuffle."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
    ]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(sensitive_col).alias("l_div"))
    out = df.groupBy(*qi_cols).agg(*aggs)
    return out.withColumn("satisfies_k", F.col("n") >= k)


def k_anonymity_summary(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row dataset verdict: the dataset's actual k (min group
    size), group/row counts and how many fall below ``k``. The single
    row a publish gate checks (cf. quality.Suite's certified flag)."""
    rep = k_anonymity_report(df, qi_cols, k)
    return rep.agg(
        F.min("n").alias("k_actual"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(~F.col("satisfies_k"), 1).otherwise(0))
        .cast("long")
        .alias("violating_groups"),
        F.sum(F.when(~F.col("satisfies_k"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("violating_rows"),
        F.sum("n").cast("long").alias("total_rows"),
    )


def suppress_below_k(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """Suppression: drop every row whose QI group has < k members —
    the remainder is k-anonymous BY CONSTRUCTION (removing whole groups
    cannot shrink surviving groups). Anti-join against the violating
    group set (the small side; AQE broadcasts it)."""
    violating = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") < k)
        .select(*qi_cols)
    )
    return df.join(violating, list(qi_cols), "left_anti")
