"""`_lit_df`'s SQL fast path (r08) must be indistinguishable from the
Column-literal path it replaced: same schema (nullability included) and
bit-identical values — doubles especially, since several oracled
queries (q217, q285, q279) pin interpolated doubles through it."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ingestao_dados_poli_spark.registry._base import _lit_df


def _column_path(spark, ddl, rows):
    schema = StructType.fromDDL(ddl)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, schema.fields)
            ]
        )
        for r in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


CASES = [
    # every primitive type the registry's scalar results use, plus the
    # adversarial values: None, IEEE-awkward doubles, quote/backslash/
    # newline strings, int64 extremes
    (
        "a long, b double, c string, d boolean, e int",
        [
            (1, 0.30000000000000004, "it's a \\ test\nline", True, -5),
            (None, float(2**53 + 1), "", False, None),
            (-(2**63), -1e-308, "ünïcødé ™", None, 2**31 - 1),
        ],
    ),
    ("day date, v double", [(datetime.date(2024, 2, 29), 1e16)]),
    ("dim int, val long", [(i, i * 10**6) for i in range(1, 67)]),
]


@pytest.mark.parametrize("ddl,rows", CASES, ids=["mixed", "date", "66rows"])
def test_sql_path_matches_column_path(spark, ddl, rows):
    fast = _lit_df(spark, ddl, rows)
    slow = _column_path(spark, ddl, rows)
    assert fast.schema == slow.schema
    assert fast.collect() == slow.collect()


def test_non_finite_double_falls_back(spark):
    # NaN has no exact SQL literal in the fast path; the fallback
    # Column path must kick in and produce a NaN double
    df = _lit_df(spark, "v double", [(float("nan"),)])
    [row] = df.collect()
    assert row.v != row.v
