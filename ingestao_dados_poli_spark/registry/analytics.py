"""Analytic registry (core slice): skew diagnostics, cohorts,
funnels, interval algebra, gap-fill, typed/JSON/map functions and the
revenue suites (q102-q164).

Split out of the former monolithic queries.py (round 5), then again in
round 6 into core / behavior / trend slices when it regrew past the
round-4 "no registry module >2,500 lines" line — every block is
verbatim. Registration happens via the shared `q` decorator from
`._base`, so importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403



# --------------------- 55. skew diagnostics: heavy hitters

@q(
    "q102_heavy_hitters",
    """
    WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1)
    SELECT l_suppkey, CAST(n AS BIGINT) AS n,
           CAST(round(n / (SELECT sum(n) FROM c), 6) AS DOUBLE) AS share
    FROM c ORDER BY n DESC, l_suppkey LIMIT 10
    """,
)
def q102_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic: the top-10 join/agg keys and the share of all
    rows each holds — what you inspect before choosing broadcast vs
    salted vs plain shuffle join (operators/relational.salted_join).
    partitioning.heavy_hitters does ONE map-side-combined groupBy,
    top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    heaps, no global sort), total via broadcast-joined aggregate of the
    same persisted grouped table — raw input scanned once."""
    li = _t(spark, sf_dir, "lineitem")
    from ingestao_dados_poli_spark.partitioning import heavy_hitters

    return heavy_hitters(li, ["l_suppkey"], k=10)



# --------------------- 56. mapInArrow vector kernel (zero-copy lane)

@q(
    "q103_arrow_normalize",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < 200
    ),
    n AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm,
             emb[1] AS x1
      FROM e
    )
    SELECT vec_id, CAST(round(nrm, 5) AS DOUBLE) AS norm,
           CAST(round(CASE WHEN nrm = 0 THEN 0.0 ELSE x1 / nrm END, 5)
                AS DOUBLE) AS u1
    FROM n
    """,
)
def q103_arrow_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms + unit vectors through similarity.l2_normalize_arrow —
    the mapInArrow zero-copy lane (raw Arrow buffers + numpy reduceat,
    below even Pandas UDFs: no pandas objects, no pickling). The oracle
    recomputes the same float64 math with DuckDB list lambdas. Scale
    shape: shuffle-free map over scan batches; the vec_id pushdown
    filter reaches the parquet scan."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = SIM.l2_normalize_arrow(emb)
    return v.select(
        "vec_id",
        F.round("norm", 5).alias("norm"),
        F.round(F.element_at("unit", 1), 5).alias("u1"),
    )



# --------------------- 57. native session windows (builtin, vs q20/q46)

@q(
    "q104_session_window_native",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
    SELECT user_id,
           CAST(min(ts) AS VARCHAR) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS VARCHAR) AS session_end,
           count(*) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def q104_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's BUILT-IN session_window (dynamic-
    gap merging windows, one shuffle on the group key, streaming-ready
    with a watermark) — the third sessionize implementation next to
    q20's lag+running-sum SQL twin and q46/stream_ops' custom stateful
    applyInPandasWithState, all three oracle-checked against the same
    gap semantics. Built-in session_window splits when the inter-event
    gap is >= the 30-minute gap (window end = last event + gap), which
    the oracle mirrors with an exact-timestamp interval comparison (not
    floored epoch seconds — micro-precision ties matter here)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").cast("string").alias("session_start"),
            F.col("sw.end").cast("string").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )



# --------------------- 58. referential integrity (cross-table quality)

@q(
    "q105_fk_check",
    """
    SELECT 'orders->customer' AS relation,
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_child,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
    """,
)
def q105_fk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential integrity through quality.fk_violations —
    the check the single-table expectation Suite can't express. Per
    relation: one left join of the child against the parent's DISTINCT
    keys + one aggregate (no NOT EXISTS subquery per row); orphan
    semantics match the oracle's NOT EXISTS exactly, including NULL
    child keys counting as orphans."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    a = Q.fk_violations(
        orders, customer, {"o_custkey": "c_custkey"}, "orders->customer"
    )
    b = Q.fk_violations(
        lineitem, part, {"l_partkey": "p_partkey"}, "lineitem->part"
    )
    return a.unionByName(b)



# --------------------- 59. daily new + cumulative unique users

@q(
    "q106_cumulative_uniques",
    """
    WITH fs AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1
    ),
    d AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
    SELECT CAST(first_day AS VARCHAR) AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY first_day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM d
    """,
)
def q106_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users + cumulative unique users WITHOUT a cumulative
    count-distinct (which has no partial aggregate and would rescan the
    prefix per day): each user contributes only their FIRST-seen day
    (one user-keyed agg), the per-day counts then cumsum in a window
    over the per-day table — whose cardinality is days-of-history, so
    the unpartitioned window is over a config-bounded few hundred rows
    at any event volume."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # INVARIANT (pinned by test_global_windows_are_post_aggregation):
    # the unpartitioned cumsum window runs over the per-day table —
    # |rows| = |distinct first-seen days|, calendar-bounded.
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        F.col("first_day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )



# --------------------- 60. weekly cohort retention

@q(
    "q107_cohort_retention",
    """
    WITH wk AS (
        SELECT DISTINCT user_id,
               CAST(floor((epoch(ts) - 1704067200) / 604800) AS BIGINT) AS week
        FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM wk JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def q107_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users bucketed by first-active
    week, counted per week-offset since their cohort. The (user, week)
    activity set is DISTINCT'd first so heavy users can't inflate
    retention; cohort assignment is one user-keyed agg joined back on
    the same hash-uniform key (AQE picks broadcast when the user dim is
    small). count(*) over the distinct set replaces per-cell
    count_distinct — same value, no second de-dup shuffle."""
    ev = _t(spark, sf_dir, "events")
    base = 1704067200  # 2024-01-01 UTC, the corpus epoch
    wk = ev.select(
        "user_id",
        F.floor((F.col("ts").cast("long") - base) / 604800).alias("week"),
    ).distinct()
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )



# --------------------- 61. ordered funnel (view -> click -> purchase)

@q(
    "q108_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel
    """,
)
def q108_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (first view, then a click at-or-after
    it, then a purchase at-or-after that): each stage is one conditional
    user-keyed min + an equi-join back on user_id — all hash-uniform
    shuffles, no per-user sequence collection, no window over raw
    events. Stage frames shrink monotonically, so AQE broadcasts the
    later joins' right sides."""
    ev = _t(spark, sf_dir, "events")

    def stage(prev: DataFrame | None, etype: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            prev_ts = prev.columns[1]
            e = e.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_ts))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = stage(None, "view", "v_ts")
    c = stage(v, "click", "c_ts")
    p = stage(c, "purchase", "p_ts")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in [(v, "n_view"), (c, "n_view_click"), (p, "n_full_funnel")]
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])



# --------------------- 65. interval-overlap join (binned, not NL-join)

@q(
    "q112_interval_overlap",
    """
    WITH iv AS (
        SELECT o_custkey, o_orderkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s,
               CAST(floor(epoch(o_orderdate)) AS BIGINT)
                   + (o_orderkey % 14 + 1) * 86400 AS e
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a.o_custkey) AS BIGINT) AS n_customers
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.s < b.e AND b.s < a.e
    """,
)
def q112_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping per-customer order-activity windows through
    relational.interval_join: intervals explode onto fixed-width
    buckets, the join is a hash EQUI-join on (custkey, bucket), exact
    overlap filters collisions, and a canonical-bucket guard (bucket of
    max(starts)) dedups multi-bucket pairs arithmetically — no
    distinct, no broadcast-nested-loop (the plan Spark picks for bare
    inequality joins, quadratic per key at scale). Oracle is the naive
    inequality self-join."""
    o = _t(spark, sf_dir, "orders")
    # NTZ → LTZ first (session tz pinned UTC): NTZ has no direct long cast
    s = F.col("o_orderdate").cast("timestamp").cast("long")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        s.alias("s"),
        (s + (F.col("o_orderkey") % 14 + 1) * 86400).alias("e"),
    )
    a = iv.select(
        "o_custkey",
        F.col("o_orderkey").alias("a_key"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = iv.select(
        "o_custkey",
        F.col("o_orderkey").alias("b_key"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    pairs = R.interval_join(
        a,
        b,
        left_range=("a_s", "a_e"),
        right_range=("b_s", "b_e"),
        bucket_width=14 * 86400,
        extra_keys=["o_custkey"],
    ).filter(F.col("a_key") < F.col("b_key"))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )



# --------------------- 66. contiguous row ids without a global window

@q(
    "q113_contiguous_ids",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
    FROM orders
    """,
)
def q113_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0..N-1 ids in o_orderkey order via
    relational.contiguous_ids: range-repartition → parallel per-
    partition ranks → offsets from the (one-row-per-partition) count
    table broadcast back. The oracle is the naive global row_number —
    which is exactly the plan this operator exists to AVOID running on
    the big table (a global-order window is one task at any scale);
    hash-matching it proves the two-phase id assignment is equivalent."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    return R.contiguous_ids(o, ["o_orderkey"])



# --------------------- 67. unpivot / melt (wide -> long)

@q(
    "q114_unpivot",
    """
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS avg_price,
               CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price,
               CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, value
    FROM wide UNPIVOT (value FOR metric IN (avg_price, max_price, min_price))
    """,
)
def q114_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape with the built-in unpivot/melt (the inverse
    of q36's pivot): metric columns become (metric, value) rows JVM-side
    — no explode-of-struct-array hand-rolling. Runs on the already-
    aggregated wide table, so the reshape touches group-count rows, not
    the raw scan."""
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["avg_price", "max_price", "min_price"],
        "metric",
        "value",
    )



# --------------------- 68. ANSI-safe try_* family over messy input

@q(
    "q115_try_functions",
    """
    WITH messy AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'N/A'
                    ELSE CAST(o_orderkey % 100 AS VARCHAR) END AS qty_s,
               CAST(o_orderkey % 7 AS DOUBLE) AS denom
        FROM orders
    ),
    parsed AS (
        SELECT TRY_CAST(qty_s AS BIGINT) AS qty,
               CASE WHEN denom = 0 THEN NULL
                    ELSE TRY_CAST(qty_s AS BIGINT) / denom END AS ratio
        FROM messy
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(qty) AS BIGINT) AS n_parsed,
           CAST(count(ratio) AS BIGINT) AS n_ratios,
           CAST(round(sum(ratio), 2) AS DOUBLE) AS sum_ratio
    FROM parsed
    """,
)
def q115_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe ingestion math on messy input: try_cast swallows
    unparseable strings as NULL (a plain cast THROWS under Spark 4 ANSI
    defaults and kills the job on the first bad row — fatal at 100 TB
    where some bad rows are a certainty) and try_divide nulls
    divide-by-zero instead of raising. The quarantine counts (parsed vs
    total) are the ingestion health metrics; the oracle mirrors with
    SQL TRY_CAST + a NULLIF-style guard."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    messy = o.select(
        "o_orderkey",
        F.when(k % 5 == 0, F.lit("N/A"))
        .otherwise((k % 100).cast("string"))
        .alias("qty_s"),
        (k % 7).cast("double").alias("denom"),
    )
    parsed = messy.select(
        F.col("qty_s").try_cast("bigint").alias("qty"),
        F.try_divide(F.col("qty_s").try_cast("bigint"), F.col("denom")).alias(
            "ratio"
        ),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("qty").alias("n_parsed"),
        F.count("ratio").alias("n_ratios"),
        F.round(F.sum("ratio"), 2).alias("sum_ratio"),
    )



# --------------------- 69. map-typed column functions

@q(
    "q116_map_functions",
    """
    WITH m AS (
        SELECT o_orderpriority AS prio, 'base' AS k1,
               o_totalprice AS v_base, 'tax' AS k2,
               round(o_totalprice * 0.1, 2) AS v_tax
        FROM orders WHERE o_orderkey % 100 = 0
    ),
    exploded AS (
        SELECT prio, k1 AS key, v_base * 2 AS value FROM m
        UNION ALL
        SELECT prio, k2 AS key, v_tax * 2 AS value FROM m
    )
    SELECT prio, key, CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
    FROM exploded GROUP BY 1, 2
    """,
)
def q116_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns end to end: build with map_from_arrays,
    rewrite every value JVM-side with transform_values (a map
    higher-order function — no explode-modify-regroup round trip), then
    explode to (key, value) rows for the aggregate. The oracle
    reconstructs the same rows relationally — proving the map algebra
    changes representation, not semantics."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    m = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.map_from_arrays(
            F.array(F.lit("base"), F.lit("tax")),
            F.array(
                F.col("o_totalprice"),
                F.round(F.col("o_totalprice") * 0.1, 2),
            ),
        ).alias("charges"),
    )
    doubled = m.select(
        "prio",
        F.transform_values("charges", lambda k, v: v * 2).alias("charges"),
    )
    rows = doubled.select("prio", F.explode("charges").alias("key", "value"))
    return rows.groupBy("prio", "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )



# --------------------- 70. regexp_extract_all

@q(
    "q117_regex_extract_all",
    """
    SELECT term, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(regexp_extract_all(text, '\\b(s[a-z]{3,})\\b', 1)) AS term
        FROM documents
    )
    GROUP BY term ORDER BY n DESC, term LIMIT 10
    """,
)
def q117_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL regex matches per row (regexp_extract_all + explode), not
    just the first — the shape of mention/entity extraction over a
    crawl. Scan-side regex in codegen, one grouped agg, top-k via
    TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(
            F.regexp_extract_all("text", F.lit(r"\b(s[a-z]{3,})\b"), F.lit(1))
        ).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(10)
    )



# --------------------- 71. collation-aware comparison (Spark 4)

@q(
    "q118_collated_distinct",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status_cs,
           CAST(count(DISTINCT lower(o_orderstatus)) AS BIGINT) AS n_status_ci
    FROM orders GROUP BY 1
    """,
)
def q118_collated_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: the same column counted distinct
    under binary (case-sensitive) vs UTF8_LCASE collation — collation-
    aware comparison pushes case-insensitivity into the comparator
    (hash/sort-based distinct works directly) instead of rewriting
    every predicate with lower(). The oracle expresses the LCASE
    semantics with lower(), which must agree."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderstatus").alias("n_status_cs"),
        F.count_distinct(
            F.collate(F.col("o_orderstatus"), "UTF8_LCASE")
        ).alias("n_status_ci"),
    )



# --------------------- 72. time-series gap repair (interpolation)

@q(
    "q119_gap_fill",
    """
    WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events WHERE user_id < 40
    ),
    w AS (
        SELECT user_id, event_id, tus, v,
          last_value(v IGNORE NULLS) OVER b AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS)
              OVER b AS pt,
          first_value(v IGNORE NULLS) OVER f AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS)
              OVER f AS nt
        FROM g
        WINDOW b AS (PARTITION BY user_id ORDER BY tus
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               f AS (PARTITION BY user_id ORDER BY tus
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           CAST(round(CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) * (tus - pt) / (nt - pt)
           END, 4) AS DOUBLE) AS v_filled
    FROM w
    """,
)
def q119_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of synthesized holes (every 7th event's
    value nulled) via timeseries.linear_interpolate: prev/next non-null
    neighbor values AND their timestamps come from four ignorenulls
    window expressions over two sorted frames — never the naive
    gap-to-observation range join (quadratic in gap length). Leading/
    trailing gaps nearest-fill. Ordered by unique-per-user epoch
    micros, so frames are deterministic; oracle is the identical
    algebra in DuckDB IGNORE-NULLS windows."""
    from ingestao_dados_poli_spark.operators import timeseries as TS

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    gappy = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tus"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = TS.linear_interpolate(
        gappy, "v", "tus", partition_by=["user_id"], out_col="v_filled"
    )
    return out.select(
        "user_id", "event_id", F.round("v_filled", 4).alias("v_filled")
    )



# --------------------- 73. nested serving-layer arrays

@q(
    "q120_recent_orders_nested",
    """
    SELECT o_custkey,
           array_to_string(
               list_transform(
                   (array_agg(o_orderkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC))[1:3],
                   x -> CAST(x AS VARCHAR)),
               ',') AS recent3,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def q120_recent_orders_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-layer denormalization: each customer's 3 most recent
    order keys INLINE as a nested array — collect_list of sort-key
    structs, sort_array, slice, project — all JVM array algebra in one
    grouped agg (the alternative, a row_number window + re-collect, is
    two shuffles). Negated sort keys give the descending order
    sort_array lacks; ties break on orderkey so the result is
    deterministic. Joined to string for the oracle comparison."""
    o = _t(spark, sf_dir, "orders")
    nd = -F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    item = F.struct(
        nd.alias("nd"),
        (-F.col("o_orderkey")).alias("nk"),
        F.col("o_orderkey").alias("k"),
    )
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list(item)), 1, 3),
                lambda s: s["k"].cast("string"),
            ),
            ",",
        ).alias("recent3"),
        F.count(F.lit(1)).alias("n_orders"),
    )



# --------------------- 74. bitmap exact-distinct (mergeable, not HLL)

@q(
    "q121_bitmap_distinct",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
    FROM orders GROUP BY 1
    """,
)
def q121_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting with mergeable state: Spark 3.5+ bitmap
    aggregates — values bucket by bitmap_bucket_number (32k-wide
    ranges), each (group, bucket) builds a fixed-size bitmap map-side,
    and the distinct count is the sum of bitmap_counts. Unlike
    count_distinct's Expand-based de-dup shuffle the state is bounded
    and mergeable (HLL's rollup property — q90 — but exact); unlike
    HLL there is no error. The right tool when key ranges are dense.
    Oracle is plain COUNT(DISTINCT)."""
    o = _t(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("_bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("_bm")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("_bm")).cast("long").alias("n_cust")
    )



# --------------------- 75. JSON round-trip through the Python DataSource sink

@q(
    "q122_json_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM documents
    """,
)
def q122_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties the IO connectors to the correctness gate (round-2 verdict
    #7): documents.parquet → JSONL via the manifest-committed
    ``jsonlsink`` Python DataSource → ``read_json`` (PERMISSIVE with
    explicit schema) → field-level parity. Returns one row
    (n_docs, n_roundtrip, n_mismatch); the oracle asserts the
    round-trip is LOSSLESS — n_roundtrip = |documents| and zero
    per-field hash mismatches — so a sink that drops rows, a manifest
    that lists an uncommitted file, or a reader that mangles escaping
    all turn the row red, not just a unit test.

    Only manifest-committed files are read back (the sink's
    exactly-once contract); the md5 parity hash covers every column
    with an explicit null sentinel so a null→empty-string corruption
    cannot cancel out.
    """
    import json as _json
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.sources import pyds, readers

    pyds.register(spark)
    docs = _t(spark, sf_dir, "documents")
    # pid-scoped REUSED dir, cleared on entry: bounds /tmp growth to
    # one corpus copy per process (mkdtemp per call leaked one per
    # bench run). Safe because each constructed DataFrame is fully
    # consumed before the next call re-enters (gate/bench are serial).
    base = f"/tmp/q122_jsonl_{_os.getpid()}"
    _shutil.rmtree(base, ignore_errors=True)
    out = _os.path.join(base, "data")
    # NOTE (r08, measured): fan_out before this sink A/B-measured 1.34x
    # AGAINST head — at 5k docs the repartition + 32 sink commits + a
    # 32-file read-back cost more than the single-task encode saves
    # (the q94 lesson). At real volume the source splits parallel on
    # its own and the sink scales per-partition; left as-is.
    docs.write.format("jsonlsink").mode("append").option("path", out).save()
    with open(_os.path.join(out, "_MANIFEST")) as fh:
        committed = _json.load(fh)["files"]

    back = readers.read_json(spark, committed, schema=docs.schema).select(
        *docs.columns
    )

    def fingerprint(df: DataFrame) -> DataFrame:
        cells = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in docs.columns
            if c != "doc_id"
        ]
        return df.select("doc_id", F.md5(F.concat_ws("\x1f", *cells)).alias("h"))

    o = fingerprint(docs).withColumnRenamed("h", "h_orig")
    r = fingerprint(back).withColumnRenamed("h", "h_rt")
    j = o.join(r, "doc_id", "full_outer")
    return j.agg(
        F.count("h_orig").cast("long").alias("n_docs"),
        F.count("h_rt").cast("long").alias("n_roundtrip"),
        F.sum(
            F.when(
                F.col("h_orig").isNull()
                | F.col("h_rt").isNull()
                | (F.col("h_orig") != F.col("h_rt")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_mismatch"),
    )



# ---------------- 78. TPC-H Q17 shape: correlated avg-quantity subquery

@q(
    "q125_small_qty_revenue",
    """
    WITH pavg AS (
        SELECT l_partkey, count(*) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS s
        FROM lineitem GROUP BY 1
    )
    SELECT p.p_brand,
           CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                      / 700.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN pavg a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * a.n * 5 < a.s
    GROUP BY 1
    """,
)
def q125_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small-quantity orders: lines
    with quantity below 20% of their part's average, per brand. The
    classic correlated scalar subquery DECORRELATED by hand into a
    per-part aggregate joined back on the same hash-uniform key (what
    Catalyst's RewriteCorrelatedScalarSubquery does to the SQL form;
    stating it as DataFrame ops makes the one-extra-scan cost
    explicit, and AQE broadcasts the part-level agg when small).
    Cross-engine exactness: the 0.2·avg threshold is evaluated in
    INTEGER form (5·qty·n < Σqty — quantities are integral) and
    revenue sums in cents-as-long, so no float boundary can flip a row
    between Spark and the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    pavg = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("s"),
    )
    return (
        li.join(pavg, "l_partkey")
        .filter(F.col("l_quantity").cast("long") * F.col("n") * 5 < F.col("s"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / 700.0,
                2,
            ).alias("avg_yearly")
        )
    )



# ------------- 79. TPC-H Q22 shape: dormant high-balance customers

@q(
    "q126_dormant_rich_customers",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2)
                AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY 1
    """,
)
def q126_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — high-balance customers gone quiet: acctbal
    above the positive-balance average AND no orders since 2000, per
    nation. Two classic subquery forms in one plan: a scalar aggregate
    (1-row table cross-joined broadcast — Spark's own decorrelation of
    the scalar subquery) and an ANTI join against a date-pruned order
    scan (the NOT EXISTS; the o_orderdate predicate pushes into the
    parquet scan so the anti-join build side is the filtered tail, not
    the fact table). Balance sums in cents-as-long for cross-engine
    hash equality; the avg threshold itself is compared as double —
    safe because acctbals are 2-dp values nowhere near the average's
    ulp."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0, 2
            ).alias("total_bal"),
        )
    )



# ---------------- 80. TPC-H Q18 shape: large-volume orders (HAVING semi)

@q(
    "q127_large_volume_orders",
    """
    WITH big AS (
        SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q127_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — who places the bulk orders: orders whose line
    quantities sum past a threshold, with customer attribution, top-100
    by price. The HAVING aggregate runs FIRST on the fact table (map-
    side combined, hash-uniform orderkey) so the expensive joins see
    only qualifying orderkeys (~0.2% here) — aggregate-then-join, the
    order Catalyst cannot derive itself when the threshold sits on the
    aggregate. Top-k via TakeOrderedAndProject (per-partition heaps),
    price-then-key tie-break for a deterministic oracle hash."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )



# -------------- 81. TPC-H Q7 shape: nation-pair trade volume by year

@q(
    "q128_nation_pair_volume",
    """
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS INT) AS yr,
           CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                               AS BIGINT)) / 100.0, 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
      AND ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q128_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — trade volume between nation pairs by year: the
    widest join tree in the registry (fact ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ nation, two roles for the same dim). Spark
    shape: the nation filters push into BOTH broadcast nation scans
    BEFORE the joins, and because customer/supplier join through those
    filtered broadcasts, AQE prunes most of the fact table at the
    earliest shuffle. Revenue per row is a deterministic double
    product rounded to cents ONCE, then summed as long — bitwise
    cross-engine equality with no float-order sensitivity."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    ns = F.broadcast(
        nation.filter(F.col("n_nationkey") < 3).select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    nc = F.broadcast(
        nation.filter(F.col("n_nationkey") < 3).select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(nc, cust["c_nationkey"] == nc["c_nk"])
        .join(ns, supp["s_nationkey"] == ns["s_nk"])
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
    )



# ----------------- 83. TPC-H Q5 shape: local-supplier volume by nation

@q(
    "q130_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                               AS BIGINT)) / 100.0, 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1998-01-01'
    GROUP BY 1
    """,
)
def q130_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue served by LOCAL suppliers per nation:
    the signature is the join-through equality s_nationkey =
    c_nationkey, which is not a star-schema edge but a constraint
    BETWEEN two dimension branches; Spark evaluates it as a residual
    condition on the supplier hash join, so no extra shuffle appears.
    Date range prunes orders at the scan; nation/region broadcast;
    revenue in cents-as-long (cross-engine exact)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == cust["c_nationkey"]),
        )
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
    )



# --------- 87. reproducible data mixing (hash-threshold sampling)

@q(
    "q134_deterministic_mix",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE source
              WHEN 'src0' THEN 'g'
              WHEN 'src1' THEN '80000000'
              WHEN 'src2' THEN '40000000'
              ELSE '1999999a'
          END
    GROUP BY source
    """,
)
def q134_deterministic_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-data mixing
    (`operators/relational.py` `stratified_sample_deterministic`):
    keep all of src0, half of src1, a quarter of src2, 10% of the rest,
    with membership a pure function of md5(doc_id) — the same rows
    survive on any engine, any partitioning, any rerun, which is what
    makes a data mix auditable (q49 keeps the engine-RNG `sampleBy`
    variant, rows-only by nature). FULLY value-oracled: DuckDB computes
    the identical md5-prefix threshold test, so Spark and the oracle
    must select the exact same doc_ids (id_sum pins membership, not
    just counts)."""
    docs = _t(spark, sf_dir, "documents")
    sampled = R.stratified_sample_deterministic(
        docs,
        "source",
        "doc_id",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default=0.1,
    )
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )



# -------------- 80. incremental aggregate maintenance (MV delta refresh)

@q(
    "q138_incremental_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS o_totalprice_min,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS o_totalprice_max,
           CAST(round(sum(o_totalprice) / count(*), 4) AS DOUBLE)
               AS o_totalprice_avg
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q138_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance (`operators/incremental.py`):
    aggregate the pre-cutoff base ONCE into mergeable per-group state
    (cnt/sum/min/max), publish it as a versioned snapshot, then refresh
    with only the post-cutoff delta — merge cost is O(|delta| +
    |state|), the base is NEVER rescanned (locked by
    test_plans.test_q138_incremental_never_rescans_base: the refresh
    plan's only orders scan carries the cutoff filter pushed down). The
    refreshed state publishes as snapshot v=2 — atomic and
    time-travelable like any table publish. Oracled against the
    full-table aggregate: incremental fold must equal one-shot compute
    exactly (counts/extrema) and to rounding (float sums: addition
    order differs by construction — THE ulp-level caveat of algebraic
    MV maintenance, surfaced here by rounding both engines to 2/4 dp).
    """
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.operators import incremental as IC
    from ingestao_dados_poli_spark.sources import versioned as V

    base_path = f"/tmp/q138_mv_{_os.getpid()}"
    _shutil.rmtree(base_path, ignore_errors=True)
    cutoff = "1997-06-01"
    keys, measures = ["o_orderpriority"], ["o_totalprice"]
    orders = _t(spark, sf_dir, "orders")
    base_state = IC.partial_aggregate(
        orders.filter(F.col("o_orderdate") < cutoff), keys, measures
    )
    V.publish(spark, base_state, base_path)
    delta_state = IC.partial_aggregate(
        orders.filter(F.col("o_orderdate") >= cutoff), keys, measures
    )
    merged = IC.merge_aggregates(
        V.read_latest(spark, base_path), delta_state, keys, measures
    )
    V.publish(spark, merged, base_path)
    out = IC.finalize(V.read_latest(spark, base_path), measures, avg_scale=4)
    return out.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.round("o_totalprice_sum", 2).alias("total"),
        F.round("o_totalprice_min", 2).alias("o_totalprice_min"),
        F.round("o_totalprice_max", 2).alias("o_totalprice_max"),
        F.col("o_totalprice_avg"),
    )



# ------------- 83. disjunctive multi-side predicate join (TPC-H Q19 shape)

@q(
    "q141_disjunctive_join",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q141_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's optimizer stress: an OR-of-ANDs predicate that mixes
    columns from BOTH join sides. Expressed declaratively — no manual
    split into three unioned joins — because Catalyst's CNF conversion
    derives the per-side implications itself: the part scan receives
    In(p_brand, [12,23,34]) + the p_size bound, the lineitem scan the
    l_quantity envelope [1,30], BEFORE the join (locked by
    test_plans.test_q141_disjunction_pushes_both_sides). At 100 TB the
    derived lineitem bound is the whole game: without it every line
    row joins first and filters after. Dim side broadcasts; the resid-
    ual disjunction evaluates post-join inside codegen. Brand#34 keeps
    a deliberately-empty branch honest (exists in data domains, may
    match zero rows at small SF)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )



# ------------- 87. correlated EXISTS / NOT EXISTS (TPC-H Q21 shape)

@q(
    "q145_sole_blame_supplier",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q145_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's join topology on the testdata schema: per returned
    ('R') line, a correlated EXISTS (the order had OTHER suppliers) and
    NOT EXISTS (none of the others was also 'R') — the sole-blame
    supplier count. Declared as a left_semi + left_anti join pair with
    a COMPOUND condition (equi on l_orderkey + non-equi suppkey guard):
    Catalyst keeps both as hash/sort-merge joins keyed on the equi part
    — never a BNLJ — and the 10-row supplier dim broadcasts. The anti
    side pre-filters to 'R' lines before joining, so the heavy stream
    is scanned once per exists-branch with the filter pushed to
    parquet. Oracled against DuckDB's native correlated subqueries —
    same semantics through a completely different decorrelation path."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    sup = _t(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    has_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_r = has_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_r.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )



# ------------- 98. multi-format federation union (parquet + csv + jsonl)

@q(
    "q156_multi_format_union",
    """
    WITH h AS (
      SELECT source, n_chars,
             CAST(('0x' || substr(md5(concat_ws(chr(31),
                 CAST(doc_id AS VARCHAR), text)), 1, 15)) AS BIGINT) AS hh
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           bit_xor(hh) AS text_fp
    FROM h GROUP BY source
    """,
)
def q156_multi_format_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format federation: the same logical table arrives as parquet,
    pipe-CSV, and JSONL shards (the landing reality the reference's
    three CSV dialects hint at, 0a:26-52); each shard reads through
    its typed reader (`sources/readers.py`), schema-aligns, unions,
    and aggregates. Losslessness across serialization round-trips is
    the point: the per-source digest includes an order-insensitive
    (doc_id, text) fingerprint (`operators/audit.py`), so a CSV
    quoting bug or JSON escaping difference flips the hash — the
    oracle computes the digest from the parquet original."""
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.functions.cleaning import align_union
    from ingestao_dados_poli_spark.operators import audit as AU
    from ingestao_dados_poli_spark.sources.readers import read_csv, read_json

    base = f"/tmp/q156_fmt_{_os.getpid()}"
    docs = _t(spark, sf_dir, "documents")
    if not _os.path.exists(base):
        _shutil.rmtree(base, ignore_errors=True)
        docs.filter(F.col("doc_id") % 3 == 1).write.option(
            "header", "true"
        ).option("sep", "|").mode("overwrite").csv(base + "/csv")
        docs.filter(F.col("doc_id") % 3 == 2).write.mode("overwrite").json(
            base + "/jsonl"
        )
    part0 = docs.filter(F.col("doc_id") % 3 == 0)
    part1 = read_csv(
        spark, base + "/csv", schema=docs.schema, sep="|"
    ).drop("_corrupt_record")
    part2 = read_json(spark, base + "/jsonl", schema=docs.schema).drop(
        "_corrupt_record"
    )
    u = align_union([part0, part1, part2])
    return (
        u.withColumn("_h", AU.row_fingerprint(["doc_id", "text"]))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("bit_xor(_h)").alias("text_fp"),
        )
    )



# ------------- 99. inverted index build + AND-semantics lookup

@q(
    "q157_inverted_index",
    """
    WITH posting AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    hits AS (
        SELECT doc_id FROM posting WHERE term IN ('spark', 'join')
        GROUP BY doc_id HAVING count(DISTINCT term) = 2)
    SELECT d.doc_id, d.source
    FROM documents d JOIN hits USING (doc_id)
    """,
)
def q157_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-index keyword search
    (`operators/corpus.py:build_inverted_index` / `lookup_all_terms`):
    a distinct (term, doc) posting table answers 'docs containing ALL
    of [spark, join]' via scan-side term filter + ONE having-count
    group-by — no k-way posting joins, no skew from a hot term's long
    posting list on a join side, no corpus text touched at query time.
    At 100 TB the index lives term-hash-partitioned on disk (build =
    one scan + one map-side-combined shuffle) and maintains
    incrementally like the fingerprint store."""
    from ingestao_dados_poli_spark.operators.corpus import (
        build_inverted_index,
        lookup_all_terms,
    )

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs)
    hits = lookup_all_terms(index, ["spark", "join"])
    return hits.join(docs.select("doc_id", "source"), "doc_id")



# ------------- 101. cogroup applyInPandas reconciliation

@q(
    "q159_cogroup_recon",
    """
    WITH li AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS li_net
        FROM lineitem GROUP BY l_orderkey),
    classed AS (
        SELECT o.o_totalprice,
               CASE
                 WHEN li.l_orderkey IS NULL THEN 'no_lines'
                 WHEN abs(o.o_totalprice - li.li_net) <= 0.01 * o.o_totalprice
                      THEN 'reconciled'
                 ELSE 'mismatch'
               END AS status
        FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS header_total
    FROM classed GROUP BY status
    """,
)
def q159_cogroup_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUP extension point (`groupBy().cogroup().applyInPandas`)
    — two tables grouped by the same key land in ONE Python worker call
    as aligned pandas frames. Probed here with the q155 reconciliation
    semantics so the declarative twin oracles it: grouping is by a
    64-way key BUCKET, not by order (one worker call per bucket with
    vectorized pandas inside — per-entity cogroup at 150k groups would
    drown in per-group overhead), which is the shape any custom
    two-sided merge logic should copy. Use the built-in join/agg path
    (q155) when SQL can express the logic; cogroup is for when it
    can't (bitemporal merges, per-key model scoring against reference
    curves)."""
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 64).alias("b"),
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("li_net")
        )
        .select("l_orderkey", "li_net", (F.col("l_orderkey") % 64).alias("b"))
    )

    def recon(key, o_pdf: pd.DataFrame, l_pdf: pd.DataFrame) -> pd.DataFrame:
        m = o_pdf.merge(
            l_pdf, how="left", left_on="o_orderkey", right_on="l_orderkey"
        )
        no_lines = m["l_orderkey"].isna()
        ok = (m["o_totalprice"] - m["li_net"]).abs() <= 0.01 * m["o_totalprice"]
        status = pd.Series("mismatch", index=m.index)
        status[ok.fillna(False)] = "reconciled"
        status[no_lines] = "no_lines"
        out = pd.DataFrame(
            {"status": status, "o_totalprice": m["o_totalprice"]}
        )
        return (
            out.groupby("status", as_index=False)
            .agg(n_orders=("status", "size"), header_total=("o_totalprice", "sum"))
        )

    partial = (
        orders.groupBy("b")
        .cogroup(li.groupBy("b"))
        .applyInPandas(
            recon, "status string, n_orders long, header_total double"
        )
    )
    return partial.groupBy("status").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(F.sum("header_total"), 2).alias("header_total"),
    )



# ------------- 103. analytic-window completeness (rank family + frames)

@q(
    "q161_window_suite",
    """
    WITH w AS (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               round(percent_rank() OVER win, 6) AS pct_rank,
               round(cume_dist() OVER win, 6) AS cume,
               nth_value(c_custkey, 3) OVER (
                   win ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS third_richest,
               first_value(c_acctbal) OVER (
                   win ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS top_bal
        FROM customer
        WINDOW win AS (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey ASC))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(pct_rank), 6) AS DOUBLE) AS avg_pct_rank,
           CAST(round(avg(cume), 6) AS DOUBLE) AS avg_cume,
           CAST(max(third_richest) AS BIGINT) AS third_richest,
           CAST(round(max(top_bal), 2) AS DOUBLE) AS top_bal
    FROM w GROUP BY c_mktsegment
    """,
)
def q161_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window surface in one oracled pass:
    percent_rank / cume_dist (relative standing — the feature-scaling
    primitives), nth_value and first_value over an explicit
    full-partition frame (default frames END AT CURRENT ROW — the
    classic silent-wrong-answer; the explicit frame is the point).
    One shuffle on the partition key, tie-broken ordering so engines
    agree on every rank. Rolled up per segment to keep the oracle
    surface dense."""
    cust = _t(spark, sf_dir, "customer")
    win = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    full = win.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = cust.select(
        "c_mktsegment",
        F.round(F.percent_rank().over(win), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(win), 6).alias("cume"),
        F.nth_value("c_custkey", 3).over(full).alias("third_richest"),
        F.first_value("c_acctbal").over(full).alias("top_bal"),
    )
    return w.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("pct_rank"), 6).alias("avg_pct_rank"),
        F.round(F.avg("cume"), 6).alias("avg_cume"),
        F.max("third_richest").cast("long").alias("third_richest"),
        F.round(F.max("top_bal"), 2).alias("top_bal"),
    )



# ------------- 104. outer generators (empty/null rows must survive)

@q(
    "q162_outer_generators",
    """
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN []
                    WHEN o_orderkey % 3 = 1 THEN NULL
                    ELSE [o_orderkey % 7, o_orderkey % 5] END AS xs
        FROM orders WHERE o_orderkey < 3000),
    ex AS (
        SELECT o_orderkey, u.x AS x
        FROM base LEFT JOIN LATERAL unnest(xs) AS u(x) ON TRUE)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(x) AS BIGINT) AS n_elems,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(coalesce(x, -1)) AS BIGINT) AS checksum
    FROM ex
    """,
)
def q162_outer_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics, pinned: rows whose array is EMPTY or
    NULL survive the explode as a single null-element row — plain
    explode silently DROPS them, the classic row-loss bug when a fact
    table's optional list column feeds a flatten (an LLM pipeline's
    doc->chunks explode loses every empty doc the same way). The
    oracle mirrors it with DuckDB's LEFT JOIN LATERAL unnest. Summary
    counts prove: n_orders == all source rows (nothing lost),
    n_rows > n_elems (the null-preserved rows), checksum pins element
    values."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    base = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit(None).cast("array<bigint>"))
        .otherwise(
            F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5)
        )
        .alias("xs"),
    )
    ex = base.select(
        "o_orderkey", F.explode_outer("xs").alias("x")
    )
    return ex.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("x").cast("long").alias("n_elems"),
        F.count_distinct("o_orderkey").cast("long").alias("n_orders"),
        F.sum(F.coalesce(F.col("x"), F.lit(-1))).cast("long").alias("checksum"),
    )



# ------------- 106. join strategy hints (the engine's control surface)

@q(
    "q164_join_hints",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q164_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control surface: the same fact-fact join forced
    through SHUFFLE_HASH instead of the planner's default sort-merge.
    Shuffled-hash skips both sort passes — the right call when one
    side comfortably builds an in-memory hash table per partition and
    spilling risk is low (sort-merge remains the robust default; AQE
    can also make this switch at runtime from observed sizes). The
    hint changes the PHYSICAL plan only (ShuffledHashJoin, asserted in
    test_plans) — results are oracle-identical to the unhinted join by
    definition."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = li.join(
        orders.hint("shuffle_hash"),
        li.l_orderkey == orders.o_orderkey,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
    )



