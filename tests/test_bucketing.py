"""Bucketed-table join: the shuffle-free repeated-join lever.

At 100 TB, two fact tables bucketed identically on the join key join
with ZERO exchanges — the main reason write_bucketed_table exists. The
plan assertion below is the proof."""

from __future__ import annotations

from ingestao_dados_poli_spark.sources.writers import write_bucketed_table


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed_table(a, "bkt_a", ["k"], 8, sort_cols=["k"])
    write_bucketed_table(b, "bkt_b", ["k"], 8, sort_cols=["k"])
    # test tables are tiny, so disable broadcast to surface the
    # sort-merge path a real fact-to-fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        joined = ta.join(tb, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed: no shuffle anywhere in the join
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
