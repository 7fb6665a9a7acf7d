"""Typed source readers (CSV/TSV/pipe, Parquet, JSON).

Re-expresses the reference's landing-zone ingestion (reference:
gerenciando-dados-externos/0a-moving-from-land-to-bucket-to-parquet.py:26,38,52-53
— tab/comma/pipe CSV reads with ``header=True`` and *no schema*, yielding
all-string frames) as schema-first readers: every dataset declares a
``StructType`` so numeric/date columns are typed at ingest, filters can
push down, and bad records are quarantined instead of silently coerced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | None = None,
    sep: str = ",",
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """CSV/TSV/pipe reader (reference 0a:26 sep='\\t', 0a:38 ',', 0a:52 '|').

    With an explicit ``schema`` Spark skips the inference pass (one full
    read saved at scale) and parses columns to their declared types;
    unparseable rows land in ``corrupt_col`` under PERMISSIVE mode.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .options(**options)
    )
    if schema is not None:
        if mode == "PERMISSIVE" and corrupt_col not in schema.fieldNames():
            schema = schema.add(corrupt_col, "string")
        # Spark writes malformed rows ONLY to the column named by this
        # option (default '_corrupt_record'); without it a custom
        # corrupt_col would stay all-NULL and bad rows would pass as
        # null-padded clean rows.
        reader = reader.schema(schema).option("columnNameOfCorruptRecord", corrupt_col)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Parquet scan (reference etl/1-processing-banks.py:44, etl/4:7-9)."""
    if isinstance(path, list):
        return spark.read.parquet(*path)
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (predicate pushdown, column projection, partition discovery); kept
    for zones that standardize on ORC."""
    if isinstance(path, list):
        return spark.read.orc(*path)
    return spark.read.orc(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """JSON-lines reader with the same quarantine contract as
    ``read_csv``: under PERMISSIVE mode with an explicit schema,
    malformed lines land whole in ``corrupt_col`` (routed via
    ``columnNameOfCorruptRecord``) for ``quarantine_corrupt`` to split
    out, instead of being dropped (DROPMALFORMED) or failing the job
    (FAILFAST)."""
    reader = spark.read.option("mode", mode).options(**options)
    if schema is not None:
        if mode == "PERMISSIVE" and corrupt_col not in schema.fieldNames():
            # COPY before extending: StructType.add mutates in place, and
            # the caller's schema is often another DataFrame's cached
            # .schema object — mutating it would make that DataFrame
            # claim a corrupt-record column it doesn't have.
            from pyspark.sql.types import StructType

            schema = StructType(list(schema.fields)).add(corrupt_col, "string")
        reader = reader.schema(schema).option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def quarantine_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, corrupt) frames.

    The parsed frame is cached first: Spark disallows queries whose only
    referenced column is the internal corrupt-record column (SPARK-21610),
    and both halves re-read the source anyway — one materialization
    serves the clean write AND the quarantine write.
    """
    if corrupt_col not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return clean, bad


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with ``(path, modificationTime, length, content
    binary)`` — the ingestion front door for multimodal corpora (images,
    audio, any opaque payload) feeding ``operators.multimodal``'s
    mapInPandas decode/featurize stages.

    ``glob`` filters by filename pattern scan-side
    (``pathGlobFilter``); ``max_bytes`` pushes a length ceiling into the
    listing so oversized blobs never reach executors. At scale the
    source parallelizes across files (one split per file), so millions
    of small media files fan out naturally; pathological single-huge-
    file layouts belong in an archive format instead.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """XML reader (Spark 4 built-in ``xml`` source, ``rowTag``-scoped)
    with the same schema-first + quarantine contract as ``read_csv`` /
    ``read_json``: explicit schema skips inference, malformed row
    elements land whole in ``corrupt_col`` under PERMISSIVE mode for
    ``quarantine_corrupt`` to split out."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", mode)
        .options(**options)
    )
    if schema is not None:
        if mode == "PERMISSIVE" and corrupt_col not in schema.fieldNames():
            schema = schema.add(corrupt_col, "string")
        reader = reader.schema(schema).option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.load(path)
