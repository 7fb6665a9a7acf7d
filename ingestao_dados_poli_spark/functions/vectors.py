"""Vector (array<float/double>) math as JVM-side column expressions.

For embedding similarity over `embeddings.parquet`. Everything here is
``F.zip_with``/``F.aggregate`` higher-order functions — no UDFs — so the
dot products run inside codegen next to the scan; at 100 TB that is the
difference between a scan-bound job and a Python-pickle-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def l2_normalize(a: Column | str) -> Column:
    n = norm(a)
    return F.transform(_c(a), lambda v: v / n)
