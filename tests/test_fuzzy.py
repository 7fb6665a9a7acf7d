from __future__ import annotations

from pyspark.sql import functions as F

from ingestao_dados_poli_spark.operators import fuzzy as FZ


def _naive_pairs(rows, max_dist, same_block=True):
    """Driver-side reference: all within-block pairs by edit distance."""
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    out = set()
    for (ka, ba, ta), (kb, bb, tb) in itertools.combinations(sorted(rows), 2):
        if same_block and ba != bb:
            continue
        if lev(ta, tb) <= max_dist:
            out.add((min(ka, kb), max(ka, kb)))
    return out


def test_fuzzy_pairs_matches_naive(spark):
    rows = [
        (1, "b1", "banana republic"),
        (2, "b1", "banana republik"),      # dist 1
        (3, "b1", "bnana republic"),       # dist 1 from 1
        (4, "b1", "completely different"), # far
        (5, "b2", "banana republic"),      # other block: excluded
        (6, "b1", "banana"),               # length gap 9 ≤ max_dist? dist 9
        (7, "b1", "x"),                    # tiny: length band far away
    ]
    df = spark.createDataFrame(rows, ["key", "block", "name"])
    got = {
        (r.key_a, r.key_b)
        for r in FZ.fuzzy_pairs(df, "key", "name", block_col="block", max_dist=9).collect()
    }
    assert got == _naive_pairs(rows, 9)


def test_fuzzy_pairs_band_straddle_not_missed_or_duplicated(spark):
    # band_width = max_dist+1 = 4: "abc" (len 3, band 0) vs "abcde"
    # (len 5, band 1) straddle a band boundary with dist 2 ≤ 3 — must
    # appear exactly once.
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abcde")], ["key", "name"]
    )
    out = FZ.fuzzy_pairs(df, "key", "name", max_dist=3).collect()
    assert [(r.key_a, r.key_b, r.dist) for r in out] == [(1, 2, 2)]


def test_fuzzy_pairs_no_block_col(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "zzzz")], ["key", "name"]
    )
    got = {(r.key_a, r.key_b) for r in FZ.fuzzy_pairs(df, "key", "name", max_dist=1).collect()}
    assert got == {(1, 2)}


def test_fuzzy_pairs_block_cap_bounds_pairs(spark):
    # 60 identical names in one block: uncapped → 60·59/2 pairs; with
    # max_block_size=10 the oversized (block, band) group is dropped
    # from both sides → zero pairs from it. A small block survives.
    rows = [(i, "big", "same name") for i in range(60)]
    rows += [(100, "ok", "other name"), (101, "ok", "other nam")]
    df = spark.createDataFrame(rows, ["key", "block", "name"])
    capped = FZ.fuzzy_pairs(
        df, "key", "name", block_col="block", max_dist=3, max_block_size=10
    ).collect()
    assert {(r.key_a, r.key_b) for r in capped} == {(100, 101)}
    full = FZ.fuzzy_pairs(df, "key", "name", block_col="block", max_dist=3).count()
    assert full == 60 * 59 // 2 + 1


def test_fuzzy_pairs_rejects_bad_band_width(spark):
    df = spark.createDataFrame([(1, "a")], ["key", "name"])
    import pytest

    with pytest.raises(ValueError):
        FZ.fuzzy_pairs(df, "key", "name", max_dist=5, band_width=5)
