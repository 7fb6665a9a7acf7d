"""Edge-case unit tests for the round-5 operator additions (PII
masking, count-min sketch, prefix-filtered Jaccard, SCD2,
largest-remainder allocation, Pareto frontier, CUSUM, quantile
normalization, Benford, Lorenz/Gini, phrase search, readability).

The registry oracles prove these on the shared tables; here we pin
the edge semantics the tables don't exercise: NULLs, empty groups,
ties, collapse rules, and the invariants each operator advertises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestao_dados_poli_spark.functions import text as TX
from ingestao_dados_poli_spark.operators import corpus as CO
from ingestao_dados_poli_spark.operators import dedup as DD
from ingestao_dados_poli_spark.operators import privacy as PV
from ingestao_dados_poli_spark.operators import relational as R
from ingestao_dados_poli_spark.operators import sketches as SK
from ingestao_dados_poli_spark.operators import timeseries as TS
from ingestao_dados_poli_spark import quality as Q


# ------------------------------------------------ privacy.mask_columns

def test_mask_columns_null_and_bijection(spark):
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None), (4, "alice")],
        "id long, name string",
    )
    m = PV.mask_columns(df, {"name": "text", "id": "numeric"}, salt="s")
    rows = m.collect()
    by_orig = {}
    for orig, masked in zip(df.collect(), rows):
        # NULLs stay NULL; non-nulls pseudonymize deterministically
        if orig.name is None:
            assert masked.name is None
        else:
            assert masked.name.startswith("anon_")
            by_orig.setdefault(orig.name, set()).add(masked.name)
        assert isinstance(masked.id, int) and masked.id >= 0
    # equality-preserving: the two 'alice' rows share one pseudonym
    assert all(len(v) == 1 for v in by_orig.values())
    assert len({next(iter(v)) for v in by_orig.values()}) == len(by_orig)


def test_mask_columns_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown mask kind"):
        PV.mask_columns(df, {"id": "blur"}, salt="s")


# ------------------------------------------------ sketches (count-min)

def test_cms_never_underestimates_and_merges(spark):
    rows = [(f"k{i % 7}",) for i in range(100)] + [("whale",)] * 50
    df = spark.createDataFrame(rows, "key string")
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    cms = SK.cms_build(df, "key", depth=3, width=8)  # tiny: force collisions
    est = SK.cms_estimate(cms, exact, "key", depth=3, width=8)
    for r in est.collect():
        assert r.cms_est >= r.n  # one-sided guarantee
    # mergeability: shard sketches sum to the full sketch exactly
    a = df.filter(F.length("key") == 2)
    b = df.filter(F.length("key") != 2)
    merged = SK.cms_merge(
        SK.cms_build(a, "key", depth=3, width=8),
        SK.cms_build(b, "key", depth=3, width=8),
    )
    direct = {(r.depth, r.bucket): r.cnt for r in cms.collect()}
    assert {(r.depth, r.bucket): r.cnt for r in merged.collect()} == direct


def test_cms_unseen_key_estimates_from_grid(spark):
    df = spark.createDataFrame([("a",)] * 5, "key string")
    cms = SK.cms_build(df, "key", depth=4, width=64)
    probe = spark.createDataFrame([("zzz",)], "key string")
    [r] = SK.cms_estimate(cms, probe, "key", depth=4, width=64).collect()
    assert 0 <= r.cms_est <= 5  # empty cell -> 0, collision -> at most total


# -------------------------------------- dedup.prefix_filtered_jaccard

def _brute_jaccard(rows, t):
    out = set()
    toksets = {i: set(s.lower().split()) for i, s in rows}
    ids = sorted(toksets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = toksets[ids[x]], toksets[ids[y]]
            i = len(a & b)
            if (1000 * i) // (len(a) + len(b) - i) >= int(t * 1000):
                out.add((ids[x], ids[y]))
    return out


def test_prefix_filter_matches_bruteforce(spark):
    rows = [
        (1, "red green blue yellow"),
        (2, "red green blue purple"),
        (3, "cats dogs birds fish"),
        (4, "red green blue yellow"),  # exact dup of 1
        (5, "one two"),
        (6, ""),  # empty doc: single empty-string token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in DD.prefix_filtered_jaccard(
            df, "text", "doc_id", 0.5
        ).collect()
    }
    assert got == _brute_jaccard(rows, 0.5)


def test_prefix_filter_posting_cap_drops_flooded_token(spark):
    # every doc shares 'common'; cap below n removes it from candidate
    # generation, and since pairs share ONLY that token, no pairs remain
    rows = [(i, f"common unique{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = DD.prefix_filtered_jaccard(df, "text", "doc_id", 0.3)
    capped = DD.prefix_filtered_jaccard(
        df, "text", "doc_id", 0.3, max_posting_len=5
    )
    assert uncapped.count() > 0
    assert capped.count() == 0


# ------------------------------------------- relational.scd2_from_changes

def test_scd2_collapses_repeats_and_handles_nulls(spark):
    rows = [
        (1, "a", 10, 100),
        (1, "a", 20, 101),  # repeat -> no new version
        (1, None, 30, 102),  # a -> NULL is a change
        (1, "b", 40, 103),
        (2, "x", 10, 104),
    ]
    df = spark.createDataFrame(
        rows, "k long, attr string, ts long, eid long"
    )
    hist = R.scd2_from_changes(df, "k", "attr", "ts", order_cols=("eid",))
    got = {
        (r.k, r.version_no): (r.attr, r.effective_from, r.effective_to,
                              r.is_current)
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("a", 10, 30, False),
        (1, 2): (None, 30, 40, False),
        (1, 3): ("b", 40, None, True),
        (2, 1): ("x", 10, None, True),
    }


# ------------------------------- relational.allocate_largest_remainder

def test_allocation_sum_invariant_and_ties(spark):
    # 100 split over 3 equal weights: 34/33/33 with the extra cent to
    # the lowest order_col among tied remainders
    rows = [(1, 100, 1, i) for i in range(1, 4)]
    rows += [(2, 7, 2, 1), (2, 7, 3, 2)]  # 7 over weights 2:3
    df = spark.createDataFrame(rows, "g long, total long, w long, o long")
    out = R.allocate_largest_remainder(df, "g", "total", "w", "o")
    by_group = {}
    for r in out.collect():
        by_group.setdefault(r.g, []).append((r.o, r.alloc))
    assert sorted(by_group[1]) == [(1, 34), (2, 33), (3, 33)]
    # 7*2/5=2.8 -> base 2 rem 4; 7*3/5=4.2 -> base 4 rem 1; short=1
    assert sorted(by_group[2]) == [(1, 3), (2, 4)]
    for g, rows_ in by_group.items():
        total = 100 if g == 1 else 7
        assert sum(a for _, a in rows_) == total


# --------------------------------------- relational.pareto_frontier_2d

def test_pareto_frontier_matches_naive(spark):
    pts = [(1, 5.0), (2, 7.0), (2, 4.0), (3, 4.0), (4, 6.0), (5, 9.0)]
    df = spark.createDataFrame(pts, "x long, y double")
    got = {(r.x, r.y) for r in R.pareto_frontier_2d(df, "x", "y").collect()}
    # naive: keep (x, min y per x) not dominated by bigger-x-and-<=y...
    # strictly: survive iff y < every best-y at larger x
    best = {}
    for x, y in pts:
        best[x] = min(best.get(x, y), y)
    naive = set()
    for x, y in best.items():
        if all(y < by for bx, by in best.items() if bx > x):
            naive.add((x, y))
    assert got == naive
    assert (5, 9.0) in got  # largest x always survives


# --------------------------------------------- timeseries.cusum_upper

def test_cusum_matches_sequential_recursion(spark):
    xs = [5, 9, 2, 14, 14, 1, 1, 20]
    target = 7
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x long"
    )
    out = TS.cusum_upper(
        df.withColumn("g", F.lit(1)), "x", "t",
        F.lit(target), partition_cols=("g",),
    )
    got = {r.t: r.cusum for r in out.collect()}
    s, want = 0, {}
    for i, x in enumerate(xs):
        s = max(0, s + x - target)
        want[i] = s
    assert got == want


# ------------------------------------------ corpus.quantile_normalize

def test_quantile_normalize_covers_all_quantiles(spark):
    rows = [(i, "a" if i % 2 else "b", (i * 37) % 100) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    out = CO.quantile_normalize(df, "v", "grp", "id", n_quantiles=4)
    rows_ = out.collect()
    assert len(rows_) == 40  # lossless row count
    assert {r.quantile for r in rows_} == {1, 2, 3, 4}
    # within a group, normalized values are monotone in original rank
    for g in ("a", "b"):
        seq = sorted(
            [(r.v, r.id, r.norm_value) for r in rows_ if r.grp == g]
        )
        norms = [n for _, _, n in seq]
        assert norms == sorted(norms)
    # both groups land on the SAME 4 normalized values (that's the point)
    na = {r.norm_value for r in rows_ if r.grp == "a"}
    nb = {r.norm_value for r in rows_ if r.grp == "b"}
    assert na == nb


# ------------------------------------------------ quality.benford_profile

def test_benford_profile_shares_and_filter(spark):
    df = spark.createDataFrame(
        [(1.5,), (19.0,), (150.0,), (2.0,), (0.5,), (None,)],
        "v double",
    )
    rows = Q.benford_profile(df, "v").collect()
    got = {r.digit: r.n for r in rows}
    assert got == {1: 3, 2: 1}  # 0.5 and NULL excluded
    total_ppm = sum(r.obs_ppm for r in rows)
    assert 999998 <= total_ppm <= 1000000  # integer-div floor loss only
    for r in rows:
        assert r.delta_ppm == r.obs_ppm - r.exp_ppm


# ------------------------------------------------- quality.lorenz_gini

def test_gini_uniform_zero_and_whale_high(spark):
    uniform = spark.createDataFrame(
        [(i, 10) for i in range(10)], "k long, v long"
    )
    g0 = Q.lorenz_gini(uniform, "k", "v").collect()[0].gini_permille
    assert g0 == 0
    whale = spark.createDataFrame(
        [(i, 1) for i in range(9)] + [(9, 100000)], "k long, v long"
    )
    gw = Q.lorenz_gini(whale, "k", "v").collect()[0].gini_permille
    assert gw > 850
    # Lorenz shares are monotone and end at 1000 permille
    pts = Q.lorenz_gini(whale, "k", "v").orderBy("point").collect()
    shares = [p.cum_share_permille for p in pts]
    assert shares == sorted(shares) and shares[-1] == 1000


# ------------------------------------------------ corpus.phrase_search

def test_phrase_search_counts_overlapping_occurrences(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # 'a b a' occurs at 0 and 2 (overlap)
            (2, "a b c"),
            (3, "b a b"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in CO.phrase_search(df, ("a", "b", "a")).collect()
    }
    assert got == {1: 2}


def test_phrase_search_rejects_single_token(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CO.phrase_search(df, ("a",))


# ------------------------------------------- functions.text.flesch_milli

def test_flesch_punctuation_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, "word")],
        "id long, text string",
    )
    got = {
        r.id: r.s
        for r in df.select("id", TX.flesch_milli("text").alias("s")).collect()
    }
    # doc 1: words=6, sentences=2, syllables = vowel groups of
    # 'the cat sat. the dog ran!' -> e,a,a,e,o,a = 6
    assert got[1] == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    # empty doc: words->1 guard, sentences->1, syllables 0
    assert got[2] == 206835 - 1015 - 0
    # 'word' : words=1, sentences=1, syllables=1
    assert got[3] == 206835 - 1015 - 84600


# --------------------------------- similarity.grid_density_clusters

def test_grid_density_separates_two_blobs(spark):
    from ingestao_dados_poli_spark.operators import similarity as SIM

    # two well-separated 64-dim blobs + a couple of isolated noise
    # points: the clustering must report exactly 2 clusters and put
    # the strays in the noise row
    def vec(center, jitter):
        return [center + 0.001 * ((jitter * (j + 1)) % 5) for j in range(64)]

    rows = (
        [(i, vec(2.0, i)) for i in range(30)]
        + [(100 + i, vec(-2.0, i)) for i in range(30)]
        + [(900, vec(8.0, 1)), (901, vec(-8.0, 2))]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.grid_density_clusters(
        df, "embedding", width=3000000, min_pts=5
    ).collect()
    clusters = [r for r in out if r.cluster >= 0]
    noise = [r for r in out if r.cluster == -1]
    assert len(clusters) == 2
    assert sorted(c.n_points for c in clusters) == [30, 30]
    assert len(noise) == 1 and noise[0].n_points == 2


# --------------------------------------- dedup.containment_pairs

def test_containment_catches_quote_jaccard_misses(spark):
    # a 10-token "quote" embedded verbatim in a 100-token host doc:
    # containment(quote -> host) = 1000 permille while Jaccard is tiny
    quote = " ".join(f"q{i}" for i in range(10))
    host = " ".join(f"h{i}" for i in range(50)) + " " + quote + " " + " ".join(
        f"t{i}" for i in range(40)
    )
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, other)], "doc_id long, text string"
    )
    cont = {
        (r.id_a, r.id_b): (r.cont_ab, r.cont_ba)
        for r in DD.containment_pairs(df, "text", "doc_id", k=5).collect()
    }
    assert set(cont) == {(1, 2)}
    ab, ba = cont[(1, 2)]
    assert ab == 1000  # all 6 of the quote's 5-shingles appear in host
    assert ba < 100
    jac = DD.jaccard_pairs(df, "text", "doc_id", k=5, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the subset-duplicate


def test_containment_threshold_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "a b c d e f"), (4, "a b c d e f")],
        "doc_id long, text string",
    )
    rows = sorted(
        DD.containment_pairs(df, "text", "doc_id", k=5).collect()
    )
    # identical-after-normalization docs (including two empties, which
    # share the single fallback shingle) are mutual subset-duplicates
    assert [(r.id_a, r.id_b, r.cont_ab, r.cont_ba) for r in rows] == [
        (1, 2, 1000, 1000),
        (3, 4, 1000, 1000),
    ]


# ------------------------- registry.similarity_graph._tdiv_int parity

def test_tdiv_int_truncates_toward_zero():
    from ingestao_dados_poli_spark.registry.similarity_graph import _tdiv_int

    # DuckDB `//` and Spark `div` truncate toward zero; Python // floors.
    # The driver-side power iteration must replay SQL exactly on
    # negative intermediate vectors.
    assert _tdiv_int(-7, 2) == -3          # python -7 // 2 == -4
    assert _tdiv_int(7, -2) == -3
    assert _tdiv_int(-7, -2) == 3
    assert _tdiv_int(7, 2) == 3
    assert _tdiv_int(0, 5) == 0


# ------------------------- registry q295: credit conservation

def test_position_attribution_conserves_every_cent(spark, sf_dir):
    """Σ credited (touches + '(none)' bucket) must equal total purchase
    cents EXACTLY — the invariant the largest-remainder allocation
    exists to guarantee (a float 40/20/40 split leaks fractional
    cents; the oracle can't catch a leak both engines share)."""
    from ingestao_dados_poli_spark import queries as Q

    credited = sum(
        r.credit_cents
        for r in Q.QUERIES["q295_position_attribution"](
            spark, sf_dir
        ).collect()
    )
    ev = Q._t(spark, sf_dir, "events")
    [total] = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("t")
        )
        .collect()
    )
    assert credited == total.t
