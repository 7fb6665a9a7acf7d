"""Pair-set equivalence between the salted and plain candidate-pair
paths (the invariant the round-6 degenerate-exact fast path relies on):
for every bucket at or under the cap, `plain_bucket_pairs` must emit
EXACTLY the pair set `salted_bucket_pairs` emits — identical
collect_list → identical in-row expansion; only the over-cap
degradation is allowed to differ (in-row chunks vs salted sub-groups),
and there both must still touch every member (connectivity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestao_dados_poli_spark.operators.dedup import (
    plain_bucket_pairs,
    salted_bucket_pairs,
)


def _banded(spark, sizes: dict[int, int]):
    """One bucket per key in `sizes`, with that many member docs."""
    rows = [
        (bucket, bucket * 10_000 + i)
        for bucket, n in sizes.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "sig long, doc long").select(
        F.lit(0).alias("tbl"), "sig", "doc"
    )


def _pairs(df):
    return {
        (r.p.id_a, r.p.id_b)
        for r in df.select("p").collect()
    }


def test_under_cap_pair_sets_identical(spark):
    banded = _banded(spark, {1: 1, 2: 2, 3: 7, 4: 20})
    cap = 32
    plain = _pairs(plain_bucket_pairs(banded, ["tbl", "sig"], "doc", cap))
    salted = _pairs(salted_bucket_pairs(banded, ["tbl", "sig"], "doc", cap))
    assert plain == salted
    # sanity: exhaustive expansion per bucket
    expected = sum(n * (n - 1) // 2 for n in (1, 2, 7, 20))
    assert len(plain) == expected


def test_over_cap_both_paths_touch_every_member(spark):
    n = 100
    banded = _banded(spark, {7: n})
    cap = 10
    for fn in (plain_bucket_pairs, salted_bucket_pairs):
        pairs = _pairs(fn(banded, ["tbl", "sig"], "doc", cap))
        touched = {d for p in pairs for d in p}
        members = {7 * 10_000 + i for i in range(n)}
        assert touched == members, f"{fn.__name__} dropped members"
        # degraded, not quadratic: far fewer than n(n-1)/2 pairs
        assert len(pairs) < n * (n - 1) // 4
