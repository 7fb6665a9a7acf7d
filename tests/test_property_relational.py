"""Property-based tests for the relational operators whose correctness
arguments are combinatorial (overlap algebra, as-of resolution, total
ordering): hypothesis generates adversarial inputs — empty/inverted
intervals, duplicate timestamps, ties — and a brute-force Python
reference checks the operator's answer. Each example is one small
DataFrame (one Spark job), so max_examples stays low.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ingestao_dados_poli_spark.operators import relational as R

BATCH_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# intervals over a small domain so overlaps, touches, emptiness and
# inversion all occur; ids are positional
INTERVALS = st.lists(
    st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
    min_size=0,
    max_size=25,
)


@BATCH_SETTINGS
@given(left=INTERVALS, right=INTERVALS, bw=st.sampled_from([1, 3, 7, 64]))
def test_interval_join_matches_bruteforce(spark, left, right, bw):
    """interval_join == O(n²) half-open overlap reference, for ANY
    bucket width; empty/inverted intervals (s >= e) match nothing."""
    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(left)] or [(None, None, None)],
        "lid int, ls int, le int",
    ).filter(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)] or [(None, None, None)],
        "rid int, rs int, re int",
    ).filter(F.col("rid").isNotNull())
    out = R.interval_join(
        ldf,
        rdf,
        left_range=("ls", "le"),
        right_range=("rs", "re"),
        bucket_width=bw,
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    want = {
        (i, j)
        for i, (ls, le) in enumerate(left)
        if ls < le
        for j, (rs, re_) in enumerate(right)
        if rs < re_ and ls < re_ and rs < le
    }
    assert got == want


TS = st.lists(st.integers(0, 30), min_size=0, max_size=15)


@BATCH_SETTINGS
@given(left_ts=TS, right_ts=TS, slim=st.booleans())
def test_asof_join_matches_bruteforce(spark, left_ts, right_ts, slim):
    """asof_join == latest-right-at-or-before reference, including
    duplicate left timestamps and equal-ts right rows, in both payload
    modes."""
    ldf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(left_ts)] or [(None, None)],
        "lid int, ts int",
    ).filter(F.col("lid").isNotNull())
    # right unique per ts (operator contract): keep first occurrence
    seen: dict[int, int] = {}
    for t in right_ts:
        seen.setdefault(t, len(seen))
    rrows = [(v, t) for t, v in seen.items()]
    rdf = spark.createDataFrame(
        rrows or [(None, None)], "val int, ts int"
    ).filter(F.col("val").isNotNull())
    ldf = ldf.withColumn("k", F.lit(1))
    rdf = rdf.withColumn("k", F.lit(1))
    out = R.asof_join(
        ldf, rdf, key="k", right_cols=["val"], slim=slim
    ).collect()
    got = {r.lid: r.asof_val for r in out}
    want = {}
    for i, t in enumerate(left_ts):
        prior = [(rt, v) for v, rt in rrows if rt <= t]
        want[i] = max(prior)[1] if prior else None
    assert got == want
    assert len(out) == len(left_ts)


@BATCH_SETTINGS
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    parts=st.sampled_from([1, 3, 8]),
)
def test_contiguous_ids_total_order(spark, vals, parts):
    """contiguous_ids assigns exactly 0..N-1, consistent with the sort
    order of (val, uid), at any partitioning."""
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v int, uid int").repartition(parts)
    out = R.contiguous_ids(df, ["v", "uid"], id_col="rid").collect()
    assert sorted(r.rid for r in out) == list(range(len(rows)))
    by_rank = sorted(out, key=lambda r: r.rid)
    assert [(r.v, r.uid) for r in by_rank] == sorted(rows)


DOCS = st.lists(
    st.sampled_from(["alpha beta", "Alpha  Beta", "gamma", "delta x", "", " "]),
    min_size=0,
    max_size=12,
)


@BATCH_SETTINGS
@given(new=DOCS, existing=DOCS)
def test_dedup_incremental_matches_bruteforce(spark, new, existing):
    """dedup_incremental_exact == set-algebra reference under text
    normalization (lower + whitespace squash + trim), including empty
    strings, whitespace-only docs, and normalization collisions."""
    from ingestao_dados_poli_spark.operators import dedup as DD

    def norm(s):
        return " ".join(s.lower().split())

    ndf = spark.createDataFrame(
        list(enumerate(new)) or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    edf = spark.createDataFrame(
        list(enumerate(existing)) or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    got = sorted(
        r.doc_id for r in DD.dedup_incremental_exact(ndf, edf, "text", "doc_id").collect()
    )
    seen_existing = {norm(t) for t in existing}
    want, seen = [], set()
    for i, t in enumerate(new):
        n = norm(t)
        if n not in seen_existing and n not in seen:
            want.append(i)
            seen.add(n)
    assert got == sorted(want)
