"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`ingestao_dados_poli_spark.queries`): the driver runs ``entry(spark)``
as a smoke check, each ``queries()[name]`` at sf=0.01 against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ingestao_dados_poli_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (gold-shape: broadcast joins + groupBy/avg) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["q01_gold_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    extended LLM-data operators)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only ops (MinHash/SimHash/
    LSH candidates, media featurization, stratified sampling — not
    SQL-expressible or RNG-engine-specific) are intentionally absent."""
    return dict(_q.ORACLES)
