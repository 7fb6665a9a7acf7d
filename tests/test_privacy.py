"""k-anonymity / l-diversity audit + suppression invariants."""

from __future__ import annotations

from ingestao_dados_poli_spark.operators import privacy as PV


def _toy(spark):
    rows = (
        [("NY", "M", i) for i in range(5)]       # group of 5
        + [("NY", "F", 100)]                     # singleton -> violating
        + [("SF", "M", 7), ("SF", "M", 7)]       # group of 2, homogeneous
    )
    return spark.createDataFrame(rows, ["city", "sex", "salary"])


def test_report_counts_and_l_diversity(spark):
    df = _toy(spark)
    rep = {
        (r["city"], r["sex"]): r
        for r in PV.k_anonymity_report(
            df, ["city", "sex"], k=2, sensitive_col="salary"
        ).collect()
    }
    assert rep[("NY", "M")]["n"] == 5 and rep[("NY", "M")]["satisfies_k"]
    assert rep[("NY", "F")]["n"] == 1 and not rep[("NY", "F")]["satisfies_k"]
    # homogeneous sensitive value: k satisfied but l_div == 1 (the
    # homogeneity attack k-anonymity alone misses)
    assert rep[("SF", "M")]["satisfies_k"] and rep[("SF", "M")]["l_div"] == 1


def test_summary_row(spark):
    s = PV.k_anonymity_summary(_toy(spark), ["city", "sex"], k=2).collect()[0]
    assert s["k_actual"] == 1
    assert s["n_groups"] == 3
    assert s["violating_groups"] == 1
    assert s["violating_rows"] == 1
    assert s["total_rows"] == 8


def test_suppression_yields_k_anonymous_remainder(spark):
    df = _toy(spark)
    out = PV.suppress_below_k(df, ["city", "sex"], k=2)
    assert out.count() == 7  # only the singleton dropped
    s = PV.k_anonymity_summary(out, ["city", "sex"], k=2).collect()[0]
    assert s["k_actual"] >= 2 and s["violating_rows"] == 0


def test_suppression_anti_join_is_broadcastable(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plan = (
        PV.suppress_below_k(cust, ["c_mktsegment", "c_nationkey"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the violating set joins back as the BUILD side of a hash join —
    # never a cartesian or a sort-merge of the full table against itself
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
