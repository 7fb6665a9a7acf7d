"""Python UDTF surface (Spark 4): table-valued functions usable from
SQL with LATERAL — the escape hatch for one-row → many-rows transforms
whose output schema is fixed but whose logic doesn't decompose into
explode/split builtins. Kept out of the bench registry on purpose:
UDTFs are row-at-a-time Python (slow path); the hot-path equivalents
live in functions/text.py and operators/corpus.py as JVM builtins."""

from __future__ import annotations


def test_udtf_lateral_tokenize(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizeHead:
        def eval(self, text: str, n: int):
            for i, t in enumerate((text or "").split()[:n]):
                yield i, t

    spark.udtf.register("tokenize_head", TokenizeHead)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "solo"), (3, None)],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize_head(d.text, 2) t
        ORDER BY d.doc_id, t.pos
        """
    ).collect()
    assert [(r.doc_id, r.pos, r.token) for r in out] == [
        (1, 0, "alpha"),
        (1, 1, "beta"),
        (2, 0, "solo"),
    ]

