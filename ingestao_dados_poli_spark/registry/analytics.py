"""Analytic registry: cohorts, funnels, histograms, anomaly scoring,
rollup hierarchies, UD(A)Fs and the later windowed suites (q102+).

Split out of the former monolithic queries.py (round 5) — every
block is verbatim; registration happens via the shared `q` decorator
from `._base`, so importing this module populates QUERIES/ORACLES.
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



# ------------- 107. EXISTS-gated priority count (TPC-H Q4 shape)

@q(
    "q165_priority_count",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q165_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape: orders in a quarter having at least one line
    shipped after the order date, counted per priority. The correlated
    EXISTS with a cross-table comparison becomes a left_semi join with
    compound condition (equi on orderkey + the l_shipdate >
    o_orderdate residual) — semi join means the fact side's multiple
    matching lines can't double-count an order, and the quarter filter
    pushes into the orders scan before the join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    gated = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return gated.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )



# ------------- 108. returned-revenue customer ranking (TPC-H Q10 shape)

@q(
    "q166_returned_revenue_topk",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q166_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter
    — 4-table join with the date filter pushed to orders, the 'R' flag
    pushed to lineitem, nation broadcast, and the final top-20 via
    TakeOrderedAndProject (rounded-revenue + custkey tie-break so
    float noise can't flip rank 20 across engines)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)



# ------------- 109. conditional revenue share (TPC-H Q14 shape)

@q(
    "q167_promo_share",
    """
    SELECT CAST(round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS DOUBLE)
               AS promo_share_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '1997-03-01'
      AND l.l_shipdate < DATE '1997-04-01'
    GROUP BY ALL
    """,
)
def q167_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month — the
    conditional-aggregate ratio computed in a SINGLE pass (sum(CASE)
    over the same scan, never two filtered subqueries joined back),
    with the month filter pushed to the lineitem scan and part
    broadcast. The ratio divides unrounded sums and rounds once at the
    end — rounding the numerator and denominator separately is the
    classic cross-engine parity bug."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").like("PROMO%"), net).otherwise(0.0))
            / F.sum(net),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )



# ------------- 110. declarative pipeline end-to-end (zone hop as data)

@q(
    "q168_pipeline_end_to_end",
    """
    WITH silver AS (
        SELECT doc_id, source,
               len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                   ' ')) AS n_tokens
        FROM documents WHERE n_chars >= 50)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM silver GROUP BY source
    """,
)
def q168_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative zone hop (`plans/pipeline.py`) run END TO END
    inside the oracle gate: Source(parquet) → transforms (length gate,
    whitespace normalize, token count) → quality suite validated on
    the SAME cached plan → Sink(parquet) → read the written zone back
    and aggregate. What the oracle certifies is the whole hop —
    config-described steps compile to one Catalyst plan, the suite
    passes, and the SINK's bytes (not the in-memory frame) carry
    exactly the transformed population. The reference's notebook hop
    (etl/1:44-186) as six lines of configuration."""
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.plans.pipeline import (
        Pipeline,
        Sink,
        Source,
    )
    from ingestao_dados_poli_spark.quality import Suite, not_null

    base = f"/tmp/q168_pipe_{_os.getpid()}"
    _shutil.rmtree(base, ignore_errors=True)
    out = base + "/silver"

    def gate(df: DataFrame) -> DataFrame:
        return df.filter(F.col("n_chars") >= 50)

    def tokenize(df: DataFrame) -> DataFrame:
        norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
        return df.select(
            "doc_id", "source",
            F.size(F.split(norm, " ")).alias("n_tokens"),
        )

    pipe = Pipeline(
        name="docs_silver",
        source=Source(path=f"{sf_dir}/documents.parquet"),
        transforms=[gate, tokenize],
        suite=Suite("docs_silver", [not_null("doc_id"), not_null("n_tokens")]),
        sink=Sink(path=out, target_file_partitions=4),
    )
    report = pipe.run(spark)
    assert report["validation"]["success"], report
    silver = spark.read.parquet(out)
    return silver.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )



# ------------- 111. calendar-hierarchy rollup with grouping_id

@q(
    "q169_time_hierarchy_rollup",
    """
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
           coalesce(CAST(quarter(o_orderdate) AS VARCHAR), 'ALL') AS qtr,
           CAST(GROUPING(year(o_orderdate)) * 2
                + GROUPING(quarter(o_orderdate)) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
    """,
)
def q169_time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup (year → quarter → grand total) with
    grouping_id disambiguation: a NULL produced by the rollup's
    subtotal levels is NOT a NULL in the data — GROUPING()/grouping_id
    is the only correct discriminator, surfaced here as the gid column
    and used to label subtotal rows 'ALL'. One Expand + one shuffle —
    the rollup never rescans per level."""
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    qtr = F.quarter("o_orderdate")
    return (
        orders.rollup(yr.alias("y"), qtr.alias("q"))
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("y").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce(F.col("q").cast("string"), F.lit("ALL")).alias("qtr"),
            "gid", "n_orders", "total",
        )
    )



# ------------- 112. array set algebra on aggregated sets

@q(
    "q170_array_set_ops",
    """
    WITH h1 AS (
        SELECT o_custkey, list_sort(list_distinct(list(o_orderpriority)))
                   AS p1
        FROM orders WHERE o_orderdate < DATE '1997-01-01'
        GROUP BY o_custkey),
    h2 AS (
        SELECT o_custkey, list_sort(list_distinct(list(o_orderpriority)))
                   AS p2
        FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        GROUP BY o_custkey),
    j AS (
        SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
               coalesce(p1, []) AS p1, coalesce(p2, []) AS p2
        FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(len(list_intersect(p1, p2))) AS BIGINT) AS common,
           CAST(sum(len(list_filter(p1, x -> NOT list_contains(p2, x))))
                AS BIGINT) AS dropped,
           CAST(sum(len(list_filter(p2, x -> NOT list_contains(p1, x))))
                AS BIGINT) AS gained
    FROM j
    """,
)
def q170_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over AGGREGATED sets: each customer's distinct
    order-priority set before/after a date split, then intersect /
    except in-row to measure behavior change (common, dropped, gained
    priorities). collect_set builds the sets in the grouped agg (one
    shuffle per period), the set ops run in-row with no further
    shuffle, and the full-outer join on the hash-uniform key aligns
    the two periods. The per-customer set-valued state stays bounded
    by the domain (5 priorities), the property that makes
    collect_set-based profiles safe at scale."""
    orders = _t(spark, sf_dir, "orders")
    before = (
        orders.filter(F.col("o_orderdate") < "1997-01-01")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set("o_orderpriority")).alias("p1"))
    )
    after = (
        orders.filter(F.col("o_orderdate") >= "1997-01-01")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set("o_orderpriority")).alias("p2"))
    )
    j = before.join(after, "o_custkey", "full_outer").select(
        F.coalesce(F.col("p1"), F.array().cast("array<string>")).alias("p1"),
        F.coalesce(F.col("p2"), F.array().cast("array<string>")).alias("p2"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.size(F.array_intersect("p1", "p2"))).cast("long").alias("common"),
        F.sum(F.size(F.array_except("p1", "p2"))).cast("long").alias("dropped"),
        F.sum(F.size(F.array_except("p2", "p1"))).cast("long").alias("gained"),
    )



# ------------- 114. equi-depth histogram (quantile-bounded profiling)

@q(
    "q172_equidepth_histogram",
    """
    WITH b AS (
        SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS b1,
               round(quantile_cont(o_totalprice, 0.50), 2) AS b2,
               round(quantile_cont(o_totalprice, 0.75), 2) AS b3
        FROM orders)
    SELECT CAST(sum(CASE WHEN o_totalprice <= b1 THEN 1 ELSE 0 END)
                AS BIGINT) AS q1_n,
           CAST(sum(CASE WHEN o_totalprice > b1 AND o_totalprice <= b2
                         THEN 1 ELSE 0 END) AS BIGINT) AS q2_n,
           CAST(sum(CASE WHEN o_totalprice > b2 AND o_totalprice <= b3
                         THEN 1 ELSE 0 END) AS BIGINT) AS q3_n,
           CAST(sum(CASE WHEN o_totalprice > b3 THEN 1 ELSE 0 END)
                AS BIGINT) AS q4_n,
           CAST(max(b1) AS DOUBLE) AS b1,
           CAST(max(b2) AS DOUBLE) AS b2,
           CAST(max(b3) AS DOUBLE) AS b3
    FROM orders, b
    """,
)
def q172_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bounded) histogram — the profiling shape
    optimizers and drift monitors want when fixed-width bins (q56)
    would dump 90% of a skewed column into one bucket. Exact quartile
    boundaries in one aggregate pass, broadcast back as a 1-row
    literal, bucket membership as sum(CASE) in a second pass — two
    passes total, no per-row window. Boundaries are rounded to the
    data's own 2-decimal grain in BOTH engines before classification,
    making the bucket edges ulp-insensitive (linear-interpolation
    quantiles are engine-deterministic but not bit-promised). The
    100 TB variant swaps percentile for percentile_approx and accepts
    the documented rank error (q64's trade, same shape)."""
    orders = _t(spark, sf_dir, "orders")
    # one array-percentile call: scalar percentile() aggs each keep
    # and sort their own buffer; the array form sorts once (q217's fix)
    pct = F.percentile(
        "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    b = orders.agg(pct.alias("_p")).select(
        F.round(F.get("_p", 0), 2).alias("b1"),
        F.round(F.get("_p", 1), 2).alias("b2"),
        F.round(F.get("_p", 2), 2).alias("b3"),
    )
    j = orders.crossJoin(F.broadcast(b))
    v = F.col("o_totalprice")
    return j.agg(
        F.sum(F.when(v <= F.col("b1"), 1).otherwise(0)).cast("long").alias("q1_n"),
        F.sum(F.when((v > F.col("b1")) & (v <= F.col("b2")), 1).otherwise(0))
        .cast("long")
        .alias("q2_n"),
        F.sum(F.when((v > F.col("b2")) & (v <= F.col("b3")), 1).otherwise(0))
        .cast("long")
        .alias("q3_n"),
        F.sum(F.when(v > F.col("b3"), 1).otherwise(0)).cast("long").alias("q4_n"),
        F.max("b1").alias("b1"),
        F.max("b2").alias("b2"),
        F.max("b3").alias("b3"),
    )



# ------------- 115. per-group winsorization (outlier capping)

@q(
    "q173_winsorize",
    """
    WITH caps AS (
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.05), 2) AS lo,
               round(quantile_cont(o_totalprice, 0.95), 2) AS hi
        FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o.o_totalprice < c.lo
                         OR o.o_totalprice > c.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_capped,
           CAST(round(sum(least(greatest(o.o_totalprice, c.lo), c.hi)), 2)
                AS DOUBLE) AS winsorized_sum
    FROM orders o JOIN caps c ON o.o_orderpriority = c.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def q173_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — the robust-statistics data-cleaning
    primitive (cap each group's values at its own p05/p95 instead of
    deleting outliers): per-group caps in ONE grouped percentile pass,
    broadcast join back (group count is small by definition), clamp
    in-row with least/greatest. Caps round to the data's 2-decimal
    grain in both engines (same ulp-insensitivity argument as q172).
    Never a per-row window over the full table — the caps table is the
    only state that moves."""
    orders = _t(spark, sf_dir, "orders")
    caps = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile(
                "o_totalprice", F.array(F.lit(0.05), F.lit(0.95))
            ).alias("_p")
        )
        .select(
            "o_orderpriority",
            F.round(F.get("_p", 0), 2).alias("lo"),
            F.round(F.get("_p", 1), 2).alias("hi"),
        )
    )
    j = orders.join(F.broadcast(caps), "o_orderpriority")
    v = F.col("o_totalprice")
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when((v < F.col("lo")) | (v > F.col("hi")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_capped"),
        F.round(F.sum(clamped), 2).alias("winsorized_sum"),
    )



# ------------- 116. observe() in-flight metrics (monitoring surface)

@q(
    "q174_observed_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total,
           CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_large
    FROM orders
    """,
)
def q174_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production monitoring surface: `Observation`/`df.observe`
    attaches named aggregate metrics to a flowing query — they are
    computed DURING the main action's single pass (an accumulator-style
    side channel, visible to listeners), not by a second scan the way
    a metrics afterthought usually costs. Here the observed metrics ARE
    the result under test: the query's real work is a throwaway write
    to a noop-style count, the metrics come back through the
    observation, and the oracle recomputes them declaratively —
    proving the side channel reports exactly what a dedicated
    aggregation would. The 1-row createDataFrame is metric publication
    (config-sized), not data movement."""
    from pyspark.sql import Observation

    orders = _t(spark, sf_dir, "orders")
    obs = Observation("q174")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias(
            "n_large"
        ),
    )
    # the main action: one pass; metrics ride it
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), float(m["total"]), int(m["n_large"]))],
        "n_rows long, total double, n_large long",
    )



# ------------- 117. exact DECIMAL money arithmetic (no rounding anywhere)

@q(
    "q175_decimal_exact",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,2)))
                AS VARCHAR) AS total_exact
    FROM orders GROUP BY o_orderpriority
    """,
)
def q175_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic done right: cast prices to DECIMAL(18,2) at the
    scan and sum in decimal — the result is EXACT, so the oracle
    compares it with NO rounding anywhere (every float-summing query
    in this registry needs a round(...) guard; this one, stringified
    to dodge engine decimal-width metadata, matches to the last cent
    by construction). The 100 TB relevance: decimal aggregation is
    whole-stage-codegen'd 128-bit integer math — order-independent,
    re-partition-independent, audit-grade — which float money columns
    can never be. Sums are widened to DECIMAL(38,2) explicitly so both
    engines overflow-check the same bound."""
    orders = _t(spark, sf_dir, "orders")
    dec = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    return dec.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("p").cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .cast("string")
        .alias("total_exact"),
    )



# ------------- 120. nested document model (two-level HOF processing)

@q(
    "q178_nested_model",
    """
    WITH per_order AS (
        SELECT o.o_custkey, o.o_orderkey,
               count(*) AS n_lines,
               sum(CAST(l.l_quantity AS BIGINT)) AS order_qty,
               round(sum(l.l_extendedprice), 2) AS order_value
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey < 100
        GROUP BY o.o_custkey, o.o_orderkey)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(order_qty) AS BIGINT) AS total_qty,
           CAST(round(max(order_value), 2) AS DOUBLE) AS max_order_value
    FROM per_order GROUP BY o_custkey
    """,
)
def q178_nested_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-model shape: customer -> array<order> ->
    array<line> built with two grouped collect_lists, then EVERY
    metric computed by higher-order functions walking the nested value
    IN-ROW — size, two-level aggregate lambdas, transform + array_max
    — with no explode and no re-shuffle after assembly. This is how a
    serving/feature store consumes nested payloads: assembling costs
    two shuffles once, every downstream metric is then shuffle-free.
    The oracle computes the same metrics from the FLAT relational
    form — nesting and flat algebra must agree exactly, which is the
    document model's consistency contract. (Per-entity state is
    bounded: a customer's own orders/lines — the collect_list safety
    rule this registry applies everywhere.)"""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    li = _t(spark, sf_dir, "lineitem")
    lines = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "o_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_quantity").cast("long").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            ).alias("lines")
        )
    )
    nested = lines.groupBy("o_custkey").agg(
        F.collect_list(
            F.struct(F.col("o_orderkey").alias("okey"), F.col("lines"))
        ).alias("orders")
    )
    o = F.col("orders")
    n_lines = F.aggregate(
        o, F.lit(0).cast("long"), lambda acc, x: acc + F.size(x["lines"])
    )
    total_qty = F.aggregate(
        o,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.aggregate(
            x["lines"], F.lit(0).cast("long"), lambda a2, ln: a2 + ln["qty"]
        ),
    )
    order_vals = F.transform(
        o,
        lambda x: F.round(
            F.aggregate(
                x["lines"], F.lit(0.0), lambda a2, ln: a2 + ln["price"]
            ),
            2,
        ),
    )
    return nested.select(
        "o_custkey",
        F.size(o).cast("long").alias("n_orders"),
        n_lines.alias("n_lines"),
        total_qty.alias("total_qty"),
        F.round(F.array_max(order_vals), 2).alias("max_order_value"),
    )



# ------------- 121. grouped-aggregate pandas UDAF (custom aggregate)

@q(
    "q179_grouped_agg_udaf",
    """
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC,
                                           o_orderkey ASC) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
    SELECT o_orderpriority,
           CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS trimmed_mean,
           CAST(count(*) AS BIGINT) AS n_used
    FROM ranked
    WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
    GROUP BY o_orderpriority
    """,
)
def q179_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-aggregate extension point: a GROUPED_AGG pandas UDF
    (vectorized UDAF — whole group arrives as one numpy-backed Series,
    one Python call per group, Arrow transfer) computing a 10%-trimmed
    mean, the robust-statistics aggregate SQL lacks. Count-based
    trimming (drop floor(n*0.1) rows from each sorted end) makes the
    semantics exactly reproducible in SQL — which is what the oracle
    does with a rank-window formulation. Same contract as avg: usable
    in groupBy here; the 100 TB note is that a grouped-agg UDF has no
    partial aggregation — the full group shuffles to one task, so keep
    groups bounded (5 here) or decompose into algebraic pieces
    (operators/incremental.py) when they aren't."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: queries.py's `from __future__ import
    # annotations` stringifies hints, so pandas_udf can't infer
    # GROUPED_AGG from a signature here
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        x = np.sort(v.to_numpy(dtype=np.float64))
        k = int(len(x) // 10)
        kept = x[k : len(x) - k] if len(x) > 2 * k else x
        return float(kept.mean())

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_n(v):
        n = len(v)
        return int(n - 2 * (n // 10))

    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(trimmed_mean("o_totalprice"), 2).alias("trimmed_mean"),
        trimmed_n("o_totalprice").alias("n_used"),
    )



# ------------- 122. SQL-registered vectorized UDF (Python kernel via SQL)

@q(
    "q180_sql_registered_udf",
    """
    SELECT source,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q180_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python kernels behind the SQL front door: a VECTORIZED
    (Arrow-batched) pandas UDF registered with spark.udf.register and
    called from plain SQL text — the shape that lets SQL-only users
    reach Python logic without ever seeing a DataFrame API, at
    pandas-batch speed rather than row-at-a-time (the registry's
    standing rule: no scalar Python UDFs in hot paths; registration
    changes the CALLER, not the execution model). The kernel is
    deliberately SQL-replicable (whitespace token count) so the oracle
    proves the registered path computes exactly what the declarative
    twin does."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def ws_tokens(texts):
        return texts.str.split(" ").str.len().astype("int64")

    spark.udf.register("ws_tokens", ws_tokens)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("q180_docs")
    return spark.sql(
        """
        SELECT source,
               CAST(sum(ws_tokens(text)) AS BIGINT) AS total_tokens,
               count(*) AS n_docs
        FROM q180_docs GROUP BY source
        """
    )



# ------------- 130. event-transition analysis (product funnel edges)

@q(
    "q188_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM events),
    transitions AS (
        SELECT event_type AS from_type, next_type AS to_type
        FROM seq
        WHERE next_type IS NOT NULL
          AND next_ts - ts <= INTERVAL 30 MINUTE)
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
    FROM transitions GROUP BY from_type, to_type
    ORDER BY n DESC, from_type, to_type LIMIT 15
    """,
)
def q188_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-graph edges: consecutive event-type transitions per
    user within a 30-minute gap (the same gap bound the sessionizers
    use), counted into the top-15 transition matrix a product-analytics
    funnel is built from. One window shuffle on user_id produces every
    adjacent pair via lead() — never a self-join of events on
    'next event after mine' (an inequality join that degrades
    quadratically in per-user event count). Top-15 by count with full
    tie-break so rank boundaries are engine-stable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    trans = seq.filter(
        F.col("next_type").isNotNull()
        & (
            F.col("next_ts").cast("long") - F.col("ts").cast("long")
            <= 30 * 60
        )
    )
    return (
        trans.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "from_type", "to_type")
        .limit(15)
    )



# ------------- 131. dormancy / resurrection cohort (monthly set algebra)

@q(
    "q189_resurrected_users",
    """
    WITH weekly AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        FROM events),
    w1 AS (SELECT user_id FROM weekly
           WHERE w = TIMESTAMP '2024-01-01 00:00:00'),
    w2 AS (SELECT user_id FROM weekly
           WHERE w = TIMESTAMP '2024-01-08 00:00:00'),
    w3 AS (SELECT user_id FROM weekly
           WHERE w = TIMESTAMP '2024-01-15 00:00:00')
    SELECT CAST((SELECT count(*) FROM w1) AS BIGINT) AS w1_active,
           CAST((SELECT count(*) FROM w1
                 WHERE user_id NOT IN (SELECT user_id FROM w2)) AS BIGINT)
               AS churned_w2,
           CAST((SELECT count(*) FROM w1
                 WHERE user_id NOT IN (SELECT user_id FROM w2)
                   AND user_id IN (SELECT user_id FROM w3)) AS BIGINT)
               AS resurrected_w3
    """,
)
def q189_resurrected_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy/resurrection cohort: of week 1's active users, how
    many skipped week 2 entirely and came back in week 3 — the churn
    signal a retention team watches beyond simple cohort retention
    (q107). ONE distinct (user, week) pre-aggregation feeds every
    week set; membership algebra is then semi/anti joins on the
    deduplicated sets (never EXISTS probes against raw events — the
    weekly distinct is what bounds the join inputs at 100 TB). The
    oracle expresses the same algebra with correlated IN/NOT IN. The
    three tiny count aggregates crossJoin into one row (1-row sides —
    the allowlisted scalar-broadcast shape)."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()

    def week(ts: str) -> DataFrame:
        return weekly.filter(F.col("w") == ts).select("user_id")

    w1, w2, w3 = (
        week("2024-01-01"),
        week("2024-01-08"),
        week("2024-01-15"),
    )
    churned = w1.join(w2, "user_id", "left_anti")
    resurrected = churned.join(w3, "user_id", "left_semi")
    return (
        w1.agg(F.count(F.lit(1)).cast("long").alias("w1_active"))
        .crossJoin(
            churned.agg(F.count(F.lit(1)).cast("long").alias("churned_w2"))
        )
        .crossJoin(
            resurrected.agg(
                F.count(F.lit(1)).cast("long").alias("resurrected_w3")
            )
        )
    )


# ------------- 135. last-touch attribution / market-basket lift

@q(
    "q197_last_touch_attribution",
    """
    WITH w AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS channel
        FROM events)
    SELECT coalesce(channel, 'none') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM w WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q197_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: every purchase credits
    the user's most recent NON-purchase event (ignore-nulls last_value
    over an unbounded-preceding-to-1 frame), 'none' when the purchase
    is the session opener. ONE shuffle — the per-user event-time window
    — then a tiny channel rollup; no self-join, no as-of join (q33's
    operator solves the two-table case; attribution is single-stream,
    so the window IS the right plan at 100 TB: state per user = one
    running value). Revenue summed in integer cents; (ts, event_id)
    ordering makes the frame deterministic under equal timestamps."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channeled = events.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        channeled.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@q(
    "q198_basket_lift",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS c_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3)
    SELECT part_a, part_b,
           CAST(c_ab AS BIGINT) AS c_ab,
           CAST(ca.c AS BIGINT) AS c_a,
           CAST(cb.c AS BIGINT) AS c_b,
           CAST(round(n.n_orders * c_ab * 1.0 / (ca.c * cb.c), 4) AS DOUBLE)
               AS lift
    FROM pairs
    JOIN cnt ca ON part_a = ca.l_partkey
    JOIN cnt cb ON part_b = cb.l_partkey
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b LIMIT 15
    """,
)
def q198_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: co-purchased part pairs with
    support >= 3, ranked by LIFT = N * c_ab / (c_a * c_b) — the
    recommender-bootstrap query. Scale shape: the pair generation is a
    self-equi-join ON THE ORDER KEY, so fan-out per key is bounded by
    basket size (~4 items -> ~6 pairs), never a cross product; item
    counts broadcast (part dim << pair set); the support filter prunes
    the tail BEFORE the lift join. Lift is a single expression over
    exact integer counts — identical doubles on both engines — and the
    top-15 cut is tie-broken by the part-id pair."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n_orders = items.select("l_orderkey").distinct().count()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ca = F.broadcast(cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")))
    cb = F.broadcast(cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.round(
                F.lit(n_orders) * F.col("c_ab") / (F.col("c_a") * F.col("c_b")),
                4,
            )
            .cast("double")
            .alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(15)
    )


# ---------------- 136. chi-square independence (event_type x weekday)

@q(
    "q199_chi_square_cells",
    """
    WITH cells AS (
        SELECT event_type, EXTRACT(dow FROM ts) AS dow,
               count(*) AS observed
        FROM events GROUP BY 1, 2),
    rt AS (SELECT event_type, sum(observed) AS r FROM cells GROUP BY 1),
    ct AS (SELECT dow, sum(observed) AS c FROM cells GROUP BY 1),
    n AS (SELECT sum(observed) AS n FROM cells)
    SELECT cells.event_type,
           CAST(cells.dow AS INT) AS dow,
           CAST(observed AS BIGINT) AS observed,
           CAST(round(1000.0 * r * c / n) AS BIGINT) AS expected_millis,
           CAST(round(1000.0 * (observed - 1.0 * r * c / n)
                             * (observed - 1.0 * r * c / n)
                             / (1.0 * r * c / n)) AS BIGINT)
               AS contrib_millis
    FROM cells
    JOIN rt USING (event_type)
    JOIN ct USING (dow)
    CROSS JOIN n
    """,
)
def q199_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (event_type x weekday), reported as
    the per-cell contribution table — the data-drift / seasonality
    screen run before trusting a training-data time slice. Float
    discipline: each cell's expected count and (O-E)^2/E contribution
    is ONE closed-form expression over exact integer marginals,
    quantized to millis — no float SUM anywhere, so engines can't
    drift on accumulation order (the total statistic is then an exact
    integer sum the reader can take downstream). Scale shape: one
    map-side-combined groupBy on (type, dow) collapses 100 TB to a
    35-cell table; marginals and N derive from the CELLS (tiny
    re-aggs, broadcast back) — the raw stream is scanned ONCE.
    Weekday alignment: Spark dayofweek() is 1=Sunday..7, DuckDB
    EXTRACT(dow) is 0=Sunday..6 — the Spark side subtracts 1."""
    events = _t(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("observed"))
    rt = cells.groupBy("event_type").agg(F.sum("observed").alias("r"))
    ct = cells.groupBy("dow").agg(F.sum("observed").alias("c"))
    n = cells.agg(F.sum("observed").alias("n"))
    e = F.col("r") * F.col("c") / F.col("n")
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("observed").cast("long").alias("observed"),
            # association mirrors the oracle text exactly (1000 first,
            # division last) — a different fp evaluation order can flip
            # a .5 rounding edge even when the math is "the same"
            F.round(F.lit(1000.0) * F.col("r") * F.col("c") / F.col("n"))
            .cast("long")
            .alias("expected_millis"),
            F.round(
                F.lit(1000.0)
                * (F.col("observed") - e)
                * (F.col("observed") - e)
                / e
            )
            .cast("long")
            .alias("contrib_millis"),
        )
    )


# ------- 137. sketch algebra / interval coalescing / robust outliers

@q(
    "q213_hll_sketch_algebra",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS merge_within_2pct,
           TRUE AS est_within_5pct
    FROM events
    """,
)
def q213_hll_sketch_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch algebra — the cube-building primitive at
    100 TB: per-slice HLL sketches union to the global sketch with NO
    rescan (Datasketches HLL via hll_sketch_agg / hll_union_agg). The
    query computes the distinct-user estimate BOTH ways — one direct
    sketch, and per-event-type partials union-merged — and
    self-asserts (q129 pattern) that the two agree within 2% and that
    the direct estimate is within 5% of the exact count; a violated
    invariant raises instead of returning rows. (First cut asserted
    EQUALITY — true while sketches stay sparse, found false at sf0.1:
    once a sketch goes dense the union gadget's target representation
    shifts the estimator by a few counts, 1488 vs 1494 of 1500. The
    honest mergeability contract is closeness, not bit-equality.)
    The oracle pins the exact count and the two invariant flags.
    Driver traffic: three scalars."""
    ev = _t(spark, sf_dir, "events")
    row = (
        ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct"),
            F.countDistinct("user_id").alias("exact"),
        )
        .crossJoin(
            F.broadcast(
                ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"))
                .agg(
                    F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged")
                )
            )
        )
        .collect()[0]
    )
    if abs(row["direct"] - row["merged"]) > 0.02 * max(row["direct"], 1):
        raise AssertionError(
            f"sketch union inconsistent: {row['direct']} vs {row['merged']}"
        )
    if abs(row["direct"] - row["exact"]) > 0.05 * max(row["exact"], 1):
        raise AssertionError(
            f"HLL estimate {row['direct']} outside 5% of exact {row['exact']}"
        )
    return spark.createDataFrame(
        [(int(row["exact"]), True, True)],
        "n_exact long, merge_within_2pct boolean, est_within_5pct boolean",
    )


@q(
    "q214_interval_merge",
    """
    WITH iv AS (
        SELECT o_custkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s,
               CAST(floor(epoch(o_orderdate)) AS BIGINT)
                   + (o_orderkey % 14 + 1) * 86400 AS e,
               o_orderkey
        FROM orders),
    flagged AS (
        SELECT o_custkey, s, e,
               CASE WHEN max(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                     OR s > max(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_grp
        FROM iv),
    grp AS (
        SELECT o_custkey, s, e,
               sum(new_grp) OVER (
                   PARTITION BY o_custkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM flagged),
    merged AS (
        SELECT o_custkey, g, min(s) AS ms, max(e) AS me, count(*) AS n_raw
        FROM grp GROUP BY 1, 2)
    SELECT o_custkey,
           CAST(sum(n_raw) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_merged,
           CAST(sum(me - ms) AS BIGINT) AS covered_seconds
    FROM merged GROUP BY 1
    """,
)
def q214_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (merge overlapping per-key windows) — the
    availability/billing/session primitive q112's overlap COUNT does
    not give you: each customer's order-activity intervals collapse to
    their disjoint union via the classic single-window algorithm (new
    group when the start clears the running max of prior ends, group
    id = running sum of the flag, then min/max per group). TWO window
    passes over one per-key shuffle, no self-join — at 100 TB this is
    the formulation that works, because the q112-style pair join is
    quadratic in per-key interval count while this is n log n sort.
    All-integer epoch arithmetic; (s, e, orderkey) ordering breaks
    ties identically in both engines."""
    orders = _t(spark, sf_dir, "orders")
    epoch = F.floor(
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    ).cast("long")
    iv = orders.select(
        "o_custkey",
        epoch.alias("s"),
        (epoch + (F.col("o_orderkey") % 14 + 1) * 86400).alias("e"),
        "o_orderkey",
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "o_custkey",
        "s",
        "e",
        F.when(prior_max.isNull() | (F.col("s") > prior_max), 1)
        .otherwise(0)
        .alias("new_grp"),
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = flagged.select(
        "o_custkey", "s", "e", F.sum("new_grp").over(w_run).alias("g")
    )
    merged = grp.groupBy("o_custkey", "g").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return merged.groupBy("o_custkey").agg(
        F.sum("n_raw").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_seconds"),
    )


@q(
    "q215_mad_outliers",
    """
    WITH x AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS x2
        FROM orders),
    med AS (SELECT o_orderpriority,
                   quantile_cont(x2, 0.5) AS med2
            FROM x GROUP BY 1),
    dev AS (SELECT x.o_orderpriority, x2, med2, abs(x2 - med2) AS dev2
            FROM x JOIN med USING (o_orderpriority)),
    mad AS (SELECT o_orderpriority, med2,
                   quantile_cont(dev2, 0.5) AS mad2
            FROM dev GROUP BY 1, 2)
    SELECT d.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(m.med2 / 2 AS DOUBLE) AS median_cents,
           CAST(m.mad2 / 2 AS DOUBLE) AS mad_cents,
           CAST(sum(CASE WHEN 2 * d.dev2 > 10 * m.mad2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.o_orderpriority = m.o_orderpriority
    GROUP BY 1, 3, 4
    """,
)
def q215_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median absolute deviation per priority
    with a 5xMAD cut — the heavy-tail-safe variant of q73's z-score
    (one fat order drags a mean+stddev gate, not a median+MAD one).
    Exactness trick stacked twice: prices enter as DOUBLED integer
    cents so the first median interpolates to an exact integer, and
    the outlier comparison is 2*dev > 10*mad so BOTH sides stay
    integer-valued even when the second median lands on a half — no
    rounding guard anywhere (q187's lesson, applied to nested
    quantiles). Two grouped exact percentiles + one broadcast join
    back; the 100 TB swap is percentile_approx."""
    orders = _t(spark, sf_dir, "orders")
    x = orders.select(
        "o_orderpriority",
        (F.round(F.col("o_totalprice") * 100).cast("long") * 2).alias("x2"),
    )
    med = x.groupBy("o_orderpriority").agg(
        F.percentile("x2", F.lit(0.5)).alias("med2")
    )
    dev = x.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med2",
        F.abs(F.col("x2") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("o_orderpriority", "med2").agg(
        F.percentile("dev2", F.lit(0.5)).alias("mad2")
    )
    return (
        dev.join(
            F.broadcast(mad.select("o_orderpriority", "mad2")), "o_orderpriority"
        )
        .groupBy(
            "o_orderpriority",
            (F.col("med2") / 2).cast("double").alias("median_cents"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max((F.col("mad2") / 2).cast("double")).alias("mad_cents"),
            F.sum(
                F.when(2 * F.col("dev2") > 10 * F.col("mad2"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "median_cents",
            "mad_cents",
            "n_outliers",
        )
    )


@q(
    "q216_theta_sketch_setops",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 50.0),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM a
                 WHERE user_id IN (SELECT user_id FROM b)) AS BIGINT)
               AS n_inter,
           CAST((SELECT count(*) FROM (SELECT user_id FROM a UNION
                                       SELECT user_id FROM b)) AS BIGINT)
               AS n_union,
           CAST((SELECT count(*) FROM a
                 WHERE user_id NOT IN (SELECT user_id FROM b)) AS BIGINT)
               AS n_diff,
           TRUE AS sketch_within_2pct
    """,
)
def q216_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA — the piece HLL (q213) cannot do:
    union AND intersection AND difference of distinct-user sets, all
    from two single-pass sketches (Datasketches Theta via
    theta_sketch_agg / theta_union / theta_intersection /
    theta_difference). At 100 TB the audience-overlap question
    ("how many high-value purchasers also hit errors?") needs no
    re-scan per set expression: per-segment sketches are built once in
    one pass (FILTER'd aggs) and every boolean combination is sketch
    arithmetic on KB-sized payloads. Self-asserts (q129 pattern) each
    sketch estimate within 2% of the exactly-computed answer — theta
    stays in exact mode below its nominal-entries threshold, so at
    test SFs the estimates are exact, and the margin covers sampling
    mode at real scale. Output pins the exact counts; a violated
    invariant raises instead of returning rows. Driver traffic: one
    row of scalars."""
    ev = _t(spark, sf_dir, "events")
    a = (F.col("event_type") == "purchase") & (F.col("value") > 50.0)
    b = F.col("event_type") == "error"
    row = (
        ev.agg(
            F.expr(
                "theta_sketch_agg(user_id) FILTER"
                " (WHERE event_type = 'purchase' AND value > 50.0d)"
            ).alias("sk_a"),
            F.expr(
                "theta_sketch_agg(user_id) FILTER (WHERE event_type = 'error')"
            ).alias("sk_b"),
            F.count_distinct(F.when(a, F.col("user_id"))).alias("n_a"),
            F.count_distinct(F.when(b, F.col("user_id"))).alias("n_b"),
            F.count_distinct(F.when(a | b, F.col("user_id"))).alias("n_union"),
        )
        .select(
            F.expr("theta_sketch_estimate(sk_a)").alias("est_a"),
            F.expr("theta_sketch_estimate(sk_b)").alias("est_b"),
            F.expr(
                "theta_sketch_estimate(theta_union(sk_a, sk_b))"
            ).alias("est_union"),
            F.expr(
                "theta_sketch_estimate(theta_intersection(sk_a, sk_b))"
            ).alias("est_inter"),
            F.expr(
                "theta_sketch_estimate(theta_difference(sk_a, sk_b))"
            ).alias("est_diff"),
            "n_a",
            "n_b",
            "n_union",
        )
        .collect()[0]
    )
    n_inter = row["n_a"] + row["n_b"] - row["n_union"]
    n_diff = row["n_a"] - n_inter
    for est, exact, tag in [
        (row["est_a"], row["n_a"], "a"),
        (row["est_b"], row["n_b"], "b"),
        (row["est_union"], row["n_union"], "union"),
        (row["est_inter"], n_inter, "inter"),
        (row["est_diff"], n_diff, "diff"),
    ]:
        if abs(est - exact) > 0.02 * max(exact, 50):
            raise AssertionError(f"theta {tag}: est {est} vs exact {exact}")
    return spark.createDataFrame(
        [
            (
                int(row["n_a"]),
                int(row["n_b"]),
                int(n_inter),
                int(row["n_union"]),
                int(n_diff),
                True,
            )
        ],
        "n_a long, n_b long, n_inter long, n_union long, n_diff long,"
        " sketch_within_2pct boolean",
    )


@q(
    "q217_kll_quantile_merge",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25)
               AS p25_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.50)
               AS p50_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75)
               AS p75_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.95)
               AS p95_cents,
           TRUE AS sketch_rank_within_3pct
    FROM lineitem
    """,
)
def q217_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketches (Datasketches KLL, k=200) — exact
    percentiles need a full sort per question; at 100 TB the
    per-partition KLL partials merge associatively (kll_sketch_merge
    fold over collect_list of 8 slice partials — the same
    partial→combine shape a 1000-executor tree aggregation runs), so
    price-distribution quantiles come from one pass and KB-sized
    state. Self-assert (q129 pattern): each sketch quantile's EXACT
    rank — recomputed against the data in a second scalar agg, not the
    sketch's own claim — must sit within 3% normalized rank of the
    target (k=200 guarantees ~1.65% at 99% confidence); violation
    raises. Output pins exact interpolated percentiles over integer
    cents (midpoints are binary-exact — the q187/q215 trick), which is
    what the DuckDB oracle pins too. Driver traffic: two scalar
    rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.pmod(F.col("l_orderkey"), F.lit(8)).alias("slice"),
    )
    # cached: the 2-column projection is read by exactly two jobs
    # (sketch build, then combined percentile+rank audit) — one disk
    # scan instead of three, the rest served from memory
    li = li.persist()
    try:
        srow = (
            li.groupBy("slice")
            .agg(F.expr("kll_sketch_agg_bigint(cents, 200)").alias("sk"))
            .agg(F.collect_list("sk").alias("sks"))
            .select(
                F.expr(
                    "aggregate(slice(sks, 2, size(sks)), sks[0],"
                    " (acc, x) -> kll_sketch_merge_bigint(acc, x))"
                ).alias("merged")
            )
            .select(
                *[
                    F.expr(
                        f"kll_sketch_get_quantile_bigint(merged, {qq}d)"
                    ).alias(f"v{tag}")
                    for qq, tag in [
                        (0.25, 25), (0.5, 50), (0.75, 75), (0.95, 95),
                    ]
                ],
            )
            .collect()[0]
        )
        # ONE follow-up scan computes the exact percentiles the output
        # pins AND re-derives each sketch value's EXACT rank from the
        # data — a stronger check than asking the sketch to grade its
        # own homework, and no third pass
        # ONE array-percentile agg: four scalar percentile() calls each
        # keep their own value buffer and sort it (4x the work — measured
        # 3.9s vs 1.0s at sf0.1); the array form sorts once
        row = li.agg(
            F.percentile(
                "cents",
                F.array(*[F.lit(x) for x in (0.25, 0.50, 0.75, 0.95)]),
            ).alias("pcts"),
            F.count(F.lit(1)).alias("n"),
            *[
                F.avg(
                    (F.col("cents") <= F.lit(int(srow[f"v{tag}"])))
                    .cast("double")
                ).alias(f"r{tag}")
                for tag in [25, 50, 75, 95]
            ],
        ).collect()[0]
    finally:
        li.unpersist()
    for qq, tag in [(0.25, 25), (0.5, 50), (0.75, 75), (0.95, 95)]:
        r = row[f"r{tag}"]
        if abs(r - qq) > 0.03:
            raise AssertionError(f"kll quantile q{tag} has exact rank {r}")
    p25, p50, p75, p95 = row["pcts"]
    return spark.createDataFrame(
        [
            (
                int(row["n"]),
                float(p25),
                float(p50),
                float(p75),
                float(p95),
                True,
            )
        ],
        "n_lines long, p25_cents double, p50_cents double, p75_cents double,"
        " p95_cents double, sketch_rank_within_3pct boolean",
    )


@q(
    "q218_topk_sketch_combine",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1 ORDER BY n_events DESC, event_type
    """,
)
def q218_topk_sketch_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable frequent-items sketches (Datasketches Frequent Items
    via approx_top_k_accumulate / _combine / _estimate) — the
    heavy-hitters primitive: per-slice partials (8 user-hash slices
    standing in for per-executor partials) combine associatively into
    the global top-k with NO per-slice rescan. With maxItemsTracked=64
    >= the distinct-item count nothing is ever evicted, so the sketch
    counts are EXACT and the query self-asserts (q129 pattern) a
    full-outer reconciliation against the exact groupBy — any missing
    item or count drift raises. At real cardinality the same plan
    degrades gracefully to epsilon-bounded estimates. Output is the
    exact ranking; ties broken by item for cross-engine determinism.
    Driver traffic: one 5-row result."""
    ev = _t(spark, sf_dir, "events")
    partials = ev.groupBy(
        F.pmod(F.xxhash64("user_id"), F.lit(8)).alias("slice")
    ).agg(F.expr("approx_top_k_accumulate(event_type, 64)").alias("st"))
    est = (
        partials.agg(
            F.expr(
                "approx_top_k_estimate(approx_top_k_combine(st, 64), 5)"
            ).alias("top")
        )
        .select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").cast("long").alias("n_events"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    bad = (
        est.join(exact, "event_type", "full")
        .where(
            F.col("n_events").isNull()
            | F.col("n_exact").isNull()
            | (F.col("n_events") != F.col("n_exact"))
        )
        .count()
    )
    if bad:
        raise AssertionError(f"approx_top_k merge not exact: {bad} mismatches")
    return est.orderBy(F.desc("n_events"), "event_type")


@q(
    "q231_fd_profiling",
    """
    WITH p1 AS (
      SELECT o_orderkey, o_custkey, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), v1 AS (
      SELECT o_orderkey, sum(n) AS n_rows, count(*) AS variants
      FROM p1 GROUP BY 1 HAVING count(*) > 1
    ), p2 AS (
      SELECT lang, source, count(*) AS n
      FROM documents GROUP BY 1, 2
    ), v2 AS (
      SELECT lang, sum(n) AS n_rows, count(*) AS variants
      FROM p2 GROUP BY 1 HAVING count(*) > 1
    )
    SELECT fd, n_violating_keys, rows_in_violations, max_variants FROM (
      SELECT 'documents: lang -> source' AS fd,
             CAST(count(*) AS BIGINT) AS n_violating_keys,
             CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS rows_in_violations,
             CAST(coalesce(max(variants), 0) AS BIGINT) AS max_variants
      FROM v2
      UNION ALL
      SELECT 'orders: o_orderkey -> o_custkey',
             CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_rows), 0) AS BIGINT),
             CAST(coalesce(max(variants), 0) AS BIGINT)
      FROM v1
    ) ORDER BY fd
    """,
)
def q231_fd_profiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (`quality.fd_violations`): one
    candidate key FD that must HOLD (o_orderkey -> o_custkey — zero
    violating keys proves it) and one that must FAIL (documents
    lang -> source — every language spans many sources), summarized
    as (violating keys, rows bound to them, worst variant count).
    The schema-discovery pass run before declaring keys or
    denormalizing. Two map-side-combined aggs per FD; shuffles carry
    distinct (lhs, rhs) pairs, never rows."""
    orders = _t(spark, sf_dir, "orders")
    docs = _t(spark, sf_dir, "documents")

    def summarize(v, name):
        return v.agg(
            F.count(F.lit(1)).cast("long").alias("n_violating_keys"),
            F.coalesce(F.sum("n_rows"), F.lit(0))
            .cast("long")
            .alias("rows_in_violations"),
            F.coalesce(F.max("n_rhs_variants"), F.lit(0))
            .cast("long")
            .alias("max_variants"),
        ).select(F.lit(name).alias("fd"), "*")

    a = summarize(
        Q.fd_violations(orders, ["o_orderkey"], ["o_custkey"]),
        "orders: o_orderkey -> o_custkey",
    )
    b = summarize(
        Q.fd_violations(docs, ["lang"], ["source"]),
        "documents: lang -> source",
    )
    return b.unionByName(a).orderBy("fd")



# --------------------- 132. deterministic PII pseudonymization

@q(
    "q236_masked_view",
    """
    WITH m AS (
        SELECT c_mktsegment,
               'anon_' || substr(md5('pepper:' || c_name), 1, 12) AS name_m,
               ('0x' || substr(md5('pepper:' || CAST(c_custkey AS VARCHAR)),
                               1, 12))::BIGINT AS key_m
        FROM customer),
    g AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT name_m) AS BIGINT) AS n_masked_names,
               CAST(count(DISTINCT key_m) AS BIGINT) AS n_masked_keys,
               CAST(bit_xor(key_m) AS BIGINT) AS key_fp
        FROM m GROUP BY 1),
    o AS (
        SELECT c_mktsegment,
               CAST(count(DISTINCT c_name) AS BIGINT) AS n_orig_names
        FROM customer GROUP BY 1)
    SELECT g.c_mktsegment, n_rows, n_orig_names, n_masked_names,
           n_masked_keys, key_fp
    FROM g JOIN o USING (c_mktsegment)
    ORDER BY c_mktsegment
    """,
)
def q236_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII pseudonymization (privacy.mask_columns): the
    released view replaces c_name with a salted-md5 text pseudonym and
    c_custkey with a 48-bit bigint pseudonym — reversible by nobody
    without the pepper, yet equality-preserving, so joins/group-bys on
    the masked columns still work. The audit row set PROVES the 1:1
    property cross-engine: per segment, distinct masked names must
    equal distinct original names (computed on an independent unmasked
    branch and joined in), distinct masked keys must equal n_rows
    (custkey is unique), and the bit_xor fingerprint of the masked
    keys pins the exact pseudonym values against the oracle's own md5
    construction. Masking is a pure scan-side projection (one md5 per
    cell, no shuffle); both audit branches are 5-row aggregates, the
    original-side one broadcast into the join."""
    from ingestao_dados_poli_spark.operators import privacy as PV

    cust = _t(spark, sf_dir, "customer")
    masked = PV.mask_columns(
        cust, {"c_name": "text", "c_custkey": "numeric"}, salt="pepper"
    )
    g = masked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("c_name").alias("n_masked_names"),
        F.count_distinct("c_custkey").alias("n_masked_keys"),
        F.bit_xor("c_custkey").alias("key_fp"),
    )
    o = cust.groupBy("c_mktsegment").agg(
        F.count_distinct("c_name").alias("n_orig_names")
    )
    return (
        g.join(F.broadcast(o), "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_rows",
            "n_orig_names",
            "n_masked_names",
            "n_masked_keys",
            "key_fp",
        )
        .orderBy("c_mktsegment")
    )



# --------------------- 133. behavioral Markov transition matrix

@q(
    "q238_event_transitions",
    """
    WITH t AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    c AS (
        SELECT prev AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           CAST((1000 * n) // sum(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS permille
    FROM c ORDER BY from_type, to_type
    """,
)
def q238_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov chain: per-user event-type bigrams via a lag
    window, aggregated into a transition matrix with row-normalized
    probabilities in integer PERMILLE (1000*n div row_total — integer
    division keeps the values exactly equal cross-engine, the q134
    trick). Scale shape: the lag window partitions by user_id, so
    state per task is one user's event stream (bounded, spillable);
    the transition matrix itself is |event_types|² rows — the second
    window (row totals) runs on that tiny table, never on fact rows.
    At 100 TB the only heavy move is the one user_id shuffle, which a
    layout bucketed by user_id (sources/writers.bucketize) eliminates
    entirely."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return (
        trans.withColumn(
            "permille",
            F.expr("(1000 * n) div sum(n) over (partition by from_type)"),
        )
        .select("from_type", "to_type", "n", "permille")
        .orderBy("from_type", "to_type")
    )



# --------------------- 134. count-min sketch frequency estimates

@q(
    "q239_count_min_sketch",
    """
    WITH f AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
               FROM orders GROUP BY 1),
    d AS (SELECT unnest([0, 1, 2, 3]) AS depth),
    cells AS (
        SELECT depth,
               ('0x' || substr(md5(depth || ':' || CAST(key AS VARCHAR)),
                               1, 12))::BIGINT % 256 AS bucket,
               sum(n) AS cnt
        FROM f CROSS JOIN d GROUP BY 1, 2),
    top AS (SELECT key, n FROM f ORDER BY n DESC, key LIMIT 10),
    probe AS (
        SELECT t.key, t.n, d.depth,
               ('0x' || substr(md5(d.depth || ':' || CAST(t.key AS VARCHAR)),
                               1, 12))::BIGINT % 256 AS bucket
        FROM top t CROSS JOIN d),
    est AS (
        SELECT p.key, p.n, min(c.cnt) AS cms_est
        FROM probe p JOIN cells c USING (depth, bucket)
        GROUP BY 1, 2)
    SELECT key AS o_custkey, n AS exact_n,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - n AS BIGINT) AS overestimate
    FROM est ORDER BY exact_n DESC, o_custkey
    """,
)
def q239_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (sketches.cms_build/cms_estimate): a 4x256
    grid summarizes the full o_custkey frequency distribution (~1500
    keys into 1024 cells — collisions guaranteed, which is the point),
    then the 10 true heaviest keys are point-estimated from the grid.
    The output pins the CMS's one-sided guarantee cross-engine:
    overestimate >= 0 on every row (min-of-cells can only add
    collision mass), with the exact overestimate values hash-checked
    against DuckDB's rebuild of the identical md5-indexed grid.
    Completes the mergeable-sketch family (HLL q213, theta q216, KLL
    q217, frequent-items q218) with the frequency-estimate member.
    Scale shape: exact per-key counts aggregate map-side FIRST, the
    depth fan-out explodes only the vocabulary, and the probe join
    broadcasts the 1024-cell grid."""
    from ingestao_dados_poli_spark.operators import sketches as SK

    orders = _t(spark, sf_dir, "orders")
    cms = SK.cms_build(orders, "o_custkey", depth=4, width=256)
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "o_custkey")
        .limit(10)
    )
    est = SK.cms_estimate(cms, top, "o_custkey", depth=4, width=256)
    return est.select(
        "o_custkey",
        "exact_n",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_n"))
        .cast("long")
        .alias("overestimate"),
    ).orderBy(F.desc("exact_n"), "o_custkey")



# --------------------- 135. bigram next-event model: train/eval

@q(
    "q242_next_event_model",
    """
    WITH t AS (
        SELECT user_id, event_type AS to_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        FROM events),
    tr AS (
        SELECT from_type, to_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 4096 AS b
        FROM t WHERE from_type IS NOT NULL),
    model AS (
        SELECT from_type, to_type, count(*) AS n
        FROM tr WHERE b < 3277 GROUP BY 1, 2),
    pred AS (
        SELECT from_type, to_type AS predicted_next
        FROM (SELECT from_type, to_type,
                     row_number() OVER (
                         PARTITION BY from_type
                         ORDER BY n DESC, to_type) AS r
              FROM model) WHERE r = 1),
    testc AS (
        SELECT from_type, to_type, count(*) AS n
        FROM tr WHERE b >= 3277 GROUP BY 1, 2)
    SELECT t.from_type, p.predicted_next,
           CAST(sum(t.n) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.to_type = p.predicted_next
                         THEN t.n ELSE 0 END) AS BIGINT) AS n_correct,
           CAST((1000 * sum(CASE WHEN t.to_type = p.predicted_next
                                 THEN t.n ELSE 0 END)) // sum(t.n)
                AS BIGINT) AS acc_permille
    FROM testc t JOIN pred p USING (from_type)
    GROUP BY 1, 2 ORDER BY t.from_type
    """,
)
def q242_next_event_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simplest train→eval loop a behavioral pipeline runs, end to
    end in one plan: split USERS deterministically 80/20 by md5 bucket
    (corpus.hash_bucket — whole streams stay on one side, no
    leakage), fit a bigram MLE next-event model on the train side
    (argmax transition count, smallest event type breaking ties so the
    argmax is total-order deterministic), and score exact-match
    accuracy on the held-out side in integer permille. Builds on
    q238's transition machinery; proves cross-engine that model
    FITTING (not just feature counting) reproduces bit-for-bit when
    tie-breaks are pinned. Scale shape: one user_id-partitioned lag
    window over facts; everything downstream operates on the
    |event_types|²-row transition tables, and the fitted model
    (|event_types| rows) broadcasts into the eval join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .select(
            "from_type",
            F.col("event_type").alias("to_type"),
            CO.hash_bucket(F.col("user_id"), 4096).alias("_b"),
        )
    )
    model = (
        trans.filter(F.col("_b") < 3277)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("from_type").orderBy(F.desc("n"), "to_type")
    pred = (
        model.withColumn("_r", F.row_number().over(wm))
        .filter(F.col("_r") == 1)
        .select("from_type", F.col("to_type").alias("predicted_next"))
    )
    testc = (
        trans.filter(F.col("_b") >= 3277)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    correct = F.when(
        F.col("to_type") == F.col("predicted_next"), F.col("n")
    ).otherwise(F.lit(0))
    return (
        testc.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted_next")
        .agg(
            F.sum("n").cast("long").alias("n_test"),
            F.sum(correct).cast("long").alias("n_correct"),
        )
        .withColumn(
            "acc_permille",
            F.expr("(1000 * n_correct) div n_test").cast("long"),
        )
        .orderBy("from_type")
    )



# --------------------- 136. Pareto frontier (skyline)

@q(
    "q245_pareto_frontier",
    """
    WITH g AS (
        SELECT p_size, min(round(p_retailprice, 2)) AS best
        FROM part GROUP BY 1),
    s AS (
        SELECT p_size, best,
               min(best) OVER (ORDER BY p_size DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prior
        FROM g)
    SELECT CAST(p_size AS BIGINT) AS p_size,
           CAST(best AS DOUBLE) AS min_price
    FROM s WHERE prior IS NULL OR best < prior
    ORDER BY p_size DESC
    """,
)
def q245_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D Pareto frontier / skyline (relational.pareto_frontier_2d):
    the (size, price) points no other part dominates — bigger-and-
    cheaper beats both dimensions, so the frontier is the set of
    strictly improving price minima scanning sizes downward. The
    textbook skyline is a quadratic NOT-EXISTS self-join; the engine's
    plan is the 2D specialization — ONE map-side-combined groupBy
    (best price per size) followed by a running-min sweep over the
    ~50-row aggregate, with the unpartitioned window safely
    post-aggregation (the registry-wide plan invariant). Skylines
    merge distributively (skyline(A∪B) = skyline(skyline(A) ∪
    skyline(B))), so shard-local frontiers recombine with the same
    two steps at any scale."""
    part = _t(spark, sf_dir, "part").select(
        F.col("p_size").cast("long").alias("p_size"),
        F.round("p_retailprice", 2).alias("price"),
    )
    fr = R.pareto_frontier_2d(part, "p_size", "price")
    return fr.select(
        "p_size", F.col("price").alias("min_price")
    ).orderBy(F.desc("p_size"))



# --------------------- 137. CUSUM change-point chart

@q(
    "q246_cusum_changepoint",
    """
    WITH daily AS (
        SELECT CAST(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
                    AS VARCHAR) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
    t AS (SELECT *, sum(cents) OVER () // count(*) OVER () AS target
          FROM daily),
    p AS (SELECT day, cents,
                 sum(cents - target) OVER (
                     ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS pre
          FROM t),
    c AS (SELECT day, cents,
                 pre - least(0, min(pre) OVER (
                     ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)) AS cusum
          FROM p)
    SELECT day, CAST(cents AS BIGINT) AS cents,
           CAST(cusum AS BIGINT) AS cusum
    FROM c ORDER BY cusum DESC, day LIMIT 20
    """,
)
def q246_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart (timeseries.cusum_upper): the 20 days with
    the strongest sustained upward revenue drift. The Page recursion
    s_t = max(0, s_{t-1} + x_t - target) looks inherently sequential;
    the engine runs its closed form s_t = p_t - min(0, min prefix p)
    — two cumulative windows over one sorted pass, no iteration, no
    UDF — with everything in integer cents (per-row cents BEFORE the
    sum: a float sum's rounding would depend on reduction order and
    break cross-engine equality). Both global windows sit over the
    POST-AGGREGATION daily table (registry plan invariant); the
    reference level is the integer-div daily mean from the same
    table. Top-k via TakeOrderedAndProject."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp")).alias(
            "_day"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    daily = daily.withColumn(
        "_target",
        F.expr(
            "sum(cents) over () div count(1) over ()"
        ),
    )
    from ingestao_dados_poli_spark.operators import timeseries as TS

    charted = TS.cusum_upper(daily, "cents", "_day", F.col("_target"))
    return (
        charted.select(
            F.col("_day").cast("string").alias("day"),
            F.col("cents"),
            F.col("cusum").cast("long").alias("cusum"),
        )
        .orderBy(F.desc("cusum"), "day")
        .limit(20)
    )



# --------------------- 138. Benford first-digit screen

@q(
    "q247_benford_profile",
    """
    WITH v AS (SELECT o_totalprice FROM orders WHERE o_totalprice >= 1),
    d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM v),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    e(digit, exp_ppm) AS (VALUES
        (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
    t AS (SELECT c.digit, c.n,
                 (1000000 * c.n) // sum(c.n) OVER () AS obs_ppm,
                 e.exp_ppm
          FROM c JOIN e USING (digit))
    SELECT digit, n, CAST(obs_ppm AS BIGINT) AS obs_ppm,
           CAST(exp_ppm AS BIGINT) AS exp_ppm,
           CAST(obs_ppm - exp_ppm AS BIGINT) AS delta_ppm
    FROM t ORDER BY digit
    """,
)
def q247_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen (quality.benford_profile)
    over order totals — the forensic-accounting profile that flags
    fabricated, truncated, or clamped numeric columns (natural
    multiplicative data follows P(d) = log10(1+1/d); TPC-H's
    uniform-ish totals visibly do NOT, and the signed per-digit
    deviations say exactly where). Expected shares are integer-PPM
    LITERALS, so no cross-engine log() enters the comparison; observed
    shares are exact integer division. One 9-key map-side-combined
    groupBy + a window over the 9-row aggregate."""
    orders = _t(spark, sf_dir, "orders")
    return Q.benford_profile(orders, "o_totalprice")



# --------------------- 139. Lorenz curve + Gini concentration

@q(
    "q249_lorenz_gini",
    """
    WITH per AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    r AS (SELECT o_custkey, v,
                 row_number() OVER (ORDER BY v, o_custkey) AS i,
                 sum(v) OVER (ORDER BY v, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 count(*) OVER () AS n,
                 sum(v) OVER () AS S
          FROM per),
    r2 AS (SELECT *, sum(i * v) OVER () AS W FROM r),
    g AS (SELECT *,
                 (1000 * (2 * W - (n + 1) * S)) // (n * S) AS gini
          FROM r2),
    d AS (SELECT (10 * i + n - 1) // n AS pt, count(*) AS n_keys,
                 max(cum) AS cum_v, max(S) AS S, max(gini) AS gini
          FROM g GROUP BY 1)
    SELECT CAST(pt AS BIGINT) AS point,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(cum_v AS BIGINT) AS cum_value,
           CAST((1000 * cum_v) // S AS BIGINT) AS cum_share_permille,
           CAST(gini AS BIGINT) AS gini_permille
    FROM d ORDER BY point
    """,
)
def q249_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile (quality.lorenz_gini): customers
    sort by total spend, the Lorenz curve reports each decile's exact
    cumulative permille share, and the constant gini_permille column
    carries the closed-form Gini G = (2*Σi*v_i - (n+1)S)/(nS) — the
    skew number you read before picking a join/partition strategy on
    this key (0 = uniform, →1000 = one whale). Arithmetic is exact
    integers with the ×1000 numerator in DECIMAL(38) exact-multiple
    division (ANSI-safe where a long would overflow past ~1e5 keys ×
    1e13 cents); the DuckDB twin runs the same formula in HUGEINT, so
    the hash match certifies the decimal path. All windows sit over
    the per-customer aggregate — raw orders are never globally
    sorted."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return Q.lorenz_gini(orders, "o_custkey", "cents", n_points=10)



# --------------------- 140. event precedence matrix

@q(
    "q253_event_precedence",
    """
    WITH s AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events),
    f AS (SELECT user_id, event_type, min(seq) AS fs
          FROM s GROUP BY 1, 2),
    p AS (SELECT a.event_type AS first_type, b.event_type AS then_type,
                 count(*) AS n_users
          FROM f a JOIN f b ON a.user_id = b.user_id
                           AND a.event_type <> b.event_type
                           AND a.fs < b.fs
          GROUP BY 1, 2)
    SELECT first_type, then_type, CAST(n_users AS BIGINT) AS n_users
    FROM p ORDER BY 1, 2
    """,
)
def q253_event_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type precedence matrix: for every ordered pair (a, b),
    how many users saw their FIRST a strictly before their first b —
    the any-gap ordering signal q238's adjacent-bigram matrix cannot
    see (onboarding flows, feature-discovery order). First occurrence
    is the min of a per-user (ts, event_id) ROW SEQUENCE, so ties
    break deterministically and the comparison is on unique integers.
    Scale shape: one user-partitioned window; the first-occurrence
    table (<= |event_types| rows per user) self-joins CO-PARTITIONED
    on user_id — the quadratic is |types|² per user, never users²;
    output is the |types|² matrix."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("seq", F.row_number().over(w))
        .groupBy("user_id", "event_type")
        .agg(F.min("seq").alias("fs"))
    )
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("first_type"),
        F.col("fs").alias("fa"),
    )
    b = firsts.select(
        "user_id",
        F.col("event_type").alias("then_type"),
        F.col("fs").alias("fb"),
    )
    return (
        a.join(b, "user_id")
        .filter(
            (F.col("first_type") != F.col("then_type"))
            & (F.col("fa") < F.col("fb"))
        )
        .groupBy("first_type", "then_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("first_type", "then_type")
    )



# --------------------- 141. trailing-window distinct actives

@q(
    "q255_trailing_actives",
    """
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    cov AS (SELECT user_id, day + CAST(k AS INTEGER) AS cday
            FROM d, unnest(range(0, 7)) AS t(k)),
    days AS (SELECT DISTINCT day FROM d),
    w AS (SELECT cday, count(DISTINCT user_id) AS wau
          FROM cov GROUP BY 1),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau
            FROM d GROUP BY 1)
    SELECT CAST(days.day AS VARCHAR) AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau
    FROM days JOIN dau ON days.day = dau.day
              JOIN w ON w.cday = days.day
    ORDER BY 1
    """,
)
def q255_trailing_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day distinct actives (WAU) per day, EXACT.
    Sliding-window COUNT DISTINCT can't use a plain window frame
    (distinct doesn't decompose over frames) and the naive per-day
    self-join rescans the fact table once per day; the scalable shape
    is the BOUNDED EXPLODE: dedup to (user, day) first (one map-side-
    combined distinct — the big shrink happens before any fan-out),
    then each active-day covers the next 7 calendar days (x7 fan-out
    of the already-deduped table) and one distinct-count per covered
    day finishes it. Fan-out factor = window width, independent of
    data volume. Output restricted to days with activity."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).distinct()
    cov = d.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "day",
    ).select("user_id", F.expr("date_add(day, k)").alias("cday"))
    days = d.select("day").distinct()
    wau = cov.groupBy("cday").agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = d.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        days.join(dau, "day")
        .join(wau, days.day == wau.cday)
        .select(
            F.col("day").cast("string").alias("day"), "dau", "wau"
        )
        .orderBy("day")
    )



# --------------------- 142. exact binary-decay popularity

@q(
    "q256_decayed_popularity",
    """
    WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events),
    s AS (SELECT event_type,
                 count(*) AS n_events,
                 sum(1::BIGINT << (40 - least(
                     (r.ref - epoch_us(ts)) // (7::BIGINT * 86400 * 1000000),
                     40))) AS score
          FROM events, r GROUP BY event_type),
    m AS (SELECT *, max(score) OVER () AS top FROM s)
    SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(score AS BIGINT) AS score_units,
           CAST((1000 * score) // top AS BIGINT) AS rel_permille
    FROM m ORDER BY score_units DESC, event_type
    """,
)
def q256_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed popularity, EXACT: each event weighs
    2^-(age in 7-day half-lives), summed per event type — the
    freshness-weighted ranking behind trending feeds. Floating decay
    (exp(-λΔt)) would accumulate differently per reduction order;
    quantizing age to INTEGER half-lives makes every weight a power
    of two, scored in units of 2^-40 via a single shiftleft — sums
    are exact bigints, order-independent, and still mergeable across
    shards/streams (the sketch-family property, free of sketches).
    The reference instant is the corpus max timestamp (1-row
    broadcast crossJoin, the allowlisted shape); relative permille
    normalizes against the top type via a window over the 5-row
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref"))
    half_life_us = 7 * 86400 * 1000000
    weight = F.expr(
        "shiftleft(cast(1 as bigint), cast(40 - least("
        f"(ref - unix_micros(ts)) div {half_life_us}, 40) as int))"
    )
    # scores live in DECIMAL(38,0): at sf0.1 a hot type's sum is
    # ~1.1e18 (fits a long) but 1000x it for the permille does NOT —
    # ANSI mode turns that silent wrap into a hard ARITHMETIC_OVERFLOW
    # (bench caught exactly this at sf0.1).
    s = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(weight.cast("decimal(38,0)")).alias("score"),
        )
    )
    m = s.withColumn("top", F.max("score").over(Window.partitionBy()))
    num = F.lit(1000).cast("decimal(38,0)") * F.col("score")
    den = F.col("top")
    return m.select(
        "event_type",
        "n_events",
        F.col("score").cast("long").alias("score_units"),
        ((num - num % den) / den).cast("long").alias("rel_permille"),
    ).orderBy(F.desc("score_units"), "event_type")



# --------------------- 143. exact OLS trend per segment

@q(
    "q257_ols_trend",
    """
    WITH daily AS (
        SELECT o_orderpriority AS prio,
               CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        FROM orders GROUP BY 1, 2),
    xy AS (SELECT prio, y,
                  row_number() OVER (PARTITION BY prio ORDER BY day) AS x
           FROM daily),
    agg AS (SELECT prio, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy GROUP BY 1)
    SELECT prio AS o_orderpriority, CAST(n AS BIGINT) AS n_days,
           CAST((1000000 * (n * sxy - sx * sy))
                // (n * sxx - sx * sx) AS BIGINT) AS slope_micro,
           CAST((1000000 * (sy * sxx - sx * sxy))
                // (n * sxx - sx * sx) AS BIGINT) AS intercept_micro
    FROM agg ORDER BY 1
    """,
)
def q257_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ordinary-least-squares revenue trend, EXACT: slope
    and intercept of daily cents over day index from the closed-form
    normal equations — every moment (Σx, Σy, Σxy, Σx²) is an exact
    integer from one map-side-combined aggregation, and the final
    division emits micro-units via DECIMAL(38) FLOOR division
    (exact-multiple trick with `%`, whose sign follows the dividend
    in BOTH engines, so a NEGATIVE slope truncates toward zero
    identically to DuckDB's `//`
    truncates toward zero on negatives, and a floor-style division
    here would read one micro-unit lower on a falling trend). No
    iterative fitting, no
    floats until nothing is left to round. Scale shape: daily
    pre-aggregation bounds the window input; moments are one further
    groupBy; at bigger scales only the decimal widths grow."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
        .cast("date")
        .alias("day"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    w = Window.partitionBy("prio").orderBy("day")
    xy = daily.withColumn("x", F.row_number().over(w))
    dec = "decimal(38,0)"
    agg = xy.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
    )
    num_s = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1000000).cast(dec)
    )
    num_b = (
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        * F.lit(1000000).cast(dec)
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")

    def truncdiv(num, d):
        return ((num - num % d) / d).cast("long")

    return agg.select(
        F.col("prio").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n_days"),
        truncdiv(num_s, den).alias("slope_micro"),
        truncdiv(num_b, den).alias("intercept_micro"),
    ).orderBy("o_orderpriority")



# --------------------- 144. RFM customer segmentation

@q(
    "q261_rfm_segmentation",
    """
    WITH per AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_date,
               count(*) AS freq,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
    scored AS (
        SELECT o_custkey,
               ntile(5) OVER (ORDER BY last_date, o_custkey) AS r_q,
               ntile(5) OVER (ORDER BY freq, o_custkey) AS f_q,
               ntile(5) OVER (ORDER BY cents, o_custkey) AS m_q
        FROM per)
    SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
           CAST(m_q AS INTEGER) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q261_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) segmentation — the marketing
    workhorse: each customer lands in an (R,F,M) quintile cell, and
    the segment census drives campaign targeting. Quintiles use
    ntile(5) under a TOTAL order (metric, custkey): the SQL-standard
    ntile fills earlier buckets first, so with a pinned tie-break
    both engines assign identical buckets — no percentile thresholds,
    no float boundaries, recency needs no date arithmetic at all
    (ntile is invariant under the monotone last-date transform).
    Scale shape: one map-side-combined per-customer aggregate; the
    three unpartitioned ntile windows run POST-aggregation (plan
    invariant) and a production run would partition them by market
    segment."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_date"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    scored = per.select(
        F.ntile(5)
        .over(Window.orderBy("last_date", "o_custkey"))
        .alias("r_q"),
        F.ntile(5).over(Window.orderBy("freq", "o_custkey")).alias("f_q"),
        F.ntile(5).over(Window.orderBy("cents", "o_custkey")).alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )



# --------------------- 145. sequence-pattern matching (regex events)

@q(
    "q262_sequence_pattern",
    """
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1),
    m AS (SELECT user_id,
                 len(regexp_extract_all(seq, 'v+c+p')) AS n_matches
          FROM s)
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_users_matched,
           CAST(sum(n_matches) AS BIGINT) AS total_matches
    FROM m GROUP BY 1 ORDER BY 1
    """,
)
def q262_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence mining: each user's event stream
    collapses to an initial-letter string in (ts, event_id) order,
    and a REGEX counts the behavioral motif views->clicks->purchase
    ('v+c+p', non-overlapping greedy — identical semantics in both
    engines' regex). Encoding sequences as strings turns arbitrary
    ordered-pattern queries (optional steps, alternation, bounded
    gaps '[^p]{0,3}') into one scan-side regexp over a per-user
    string — the poor man's MATCH_RECOGNIZE Spark doesn't ship.
    Scale shape: the only shuffle is the per-user collect (bounded by
    a user's event count — the same bound any per-user sessionization
    carries); the regex never leaves codegen. Event-type initials are
    distinct in this corpus (c/e/p/s/v), so the encoding is
    lossless."""
    ev = _t(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts",
                                "event_id",
                                F.substring("event_type", 1, 1).alias(
                                    "ini"
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("ini"),
                ),
                "",
            ).alias("seq")
        )
    )
    m = seq.select(
        "user_id",
        F.regexp_count("seq", F.lit("v+c+p")).alias("n_matches"),
    )
    return (
        m.groupBy((F.col("user_id") % 10).cast("long").alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(
                F.when(F.col("n_matches") > 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_users_matched"),
            F.sum("n_matches").cast("long").alias("total_matches"),
        )
        .orderBy("user_bucket")
    )



# --------------------- 146. sweep-line peak concurrency

@q(
    "q263_peak_concurrency",
    """
    WITH iv AS (
        SELECT epoch_us(ts) AS s,
               epoch_us(ts) + ((event_id % 60) + 1) * 60000000 AS e
        FROM events),
    b AS (
        SELECT s // 86400000000 AS day, s AS b_us, 1 AS delta FROM iv
        UNION ALL
        SELECT e // 86400000000, e, -1 FROM iv),
    pre AS (
        SELECT day, delta,
               sum(delta) OVER (PARTITION BY day ORDER BY b_us, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS p
        FROM b),
    peaks AS (SELECT day, max(p) AS maxp FROM pre GROUP BY 1),
    sp AS (SELECT s, e, CAST(t.d AS BIGINT) AS day
           FROM iv, unnest(range(CAST(s // 86400000000 + 1 AS BIGINT),
                                 CAST(e // 86400000000 + 1 AS BIGINT)))
                AS t(d)
           WHERE e > t.d * 86400000000),
    carry AS (SELECT day, count(*) AS c FROM sp GROUP BY 1)
    SELECT CAST(make_timestamp(p.day * 86400000000) AS DATE)::VARCHAR
               AS day,
           CAST(coalesce(c.c, 0) AS BIGINT) AS carry_in,
           CAST(coalesce(c.c, 0) + greatest(p.maxp, 0) AS BIGINT) AS peak
    FROM peaks p LEFT JOIN carry c ON p.day = c.day
    ORDER BY 1
    """,
)
def q263_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day (max simultaneous open sessions) via
    the classic SWEEP LINE — +1 at open, -1 at close, max prefix sum
    — made DISTRIBUTED: boundaries partition by DAY, and sessions
    spanning a day boundary enter as an exact carry-in count (a
    bounded explode over the <= 2 days each ~hour-long session
    touches), so no global ordering ever exists; peak = carry_in +
    max(0, within-day max prefix). Half-open [s, e) semantics: at an
    instant, closes process before opens (delta ascending in the
    sort). Session length derives deterministically from event_id.
    Scale shape: per-day windows bounded by daily volume, carry
    computed by a tiny fan-out + count — the pattern that makes
    interval-overlap analytics (call centers, connection pools,
    cluster schedulers) work on unbounded history."""
    D = 86400000000
    ev = _t(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + ((F.col("event_id") % 60) + 1) * 60000000
        ).alias("e"),
    )
    b = ev.select(
        F.expr(f"s div {D}").alias("day"),
        F.col("s").alias("b_us"),
        F.lit(1).alias("delta"),
    ).unionByName(
        ev.select(
            F.expr(f"e div {D}").alias("day"),
            F.col("e").alias("b_us"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy("b_us", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaks = (
        b.withColumn("p", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("p").alias("maxp"))
    )
    # guard: Spark's sequence(lo, hi) DESCENDS when hi < lo (DuckDB's
    # range is empty) — a within-day session must contribute no carry
    lo, hi = F.expr(f"s div {D} + 1"), F.expr(f"e div {D}")
    sp = ev.select(
        "e",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("day"),
    ).filter(F.col("e") > F.col("day") * D)
    carry = sp.groupBy("day").agg(F.count(F.lit(1)).alias("c"))
    return (
        peaks.join(carry, "day", "left")
        .select(
            F.timestamp_micros(F.col("day") * D)
            .cast("date")
            .cast("string")
            .alias("day"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("carry_in"),
            (
                F.coalesce(F.col("c"), F.lit(0))
                + F.greatest(F.col("maxp"), F.lit(0))
            )
            .cast("long")
            .alias("peak"),
        )
        .orderBy("day")
    )



# --------------------- 147. exact weighted median

@q(
    "q264_weighted_median",
    """
    WITH h AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               sum(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2),
    c AS (SELECT flag, cents, w,
                 sum(w) OVER (PARTITION BY flag ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw,
                 sum(w) OVER (PARTITION BY flag) AS tw
          FROM h)
    SELECT flag, CAST(min(cents) AS BIGINT) AS wmedian_cents,
           CAST(max(tw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag
    """,
)
def q264_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group (quantity-weighted price): the
    smallest value whose cumulative weight reaches half the group
    total — the robust center percentile_approx can only approximate
    and plain median ignores weights for. Runs on the DISTINCT-VALUE
    histogram (one map-side-combined groupBy collapses the fact table
    to (group, value, weight) cells), so the cumulative window scans
    value-cardinality rows, never raw rows — the q248 derivation
    specialized to the 50% crossing point. Pure integer comparison
    (2*cumw >= total), no interpolation, no floats."""
    li = _t(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    wc = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = h.withColumn("cw", F.sum("w").over(wc)).withColumn(
        "tw", F.sum("w").over(Window.partitionBy("flag"))
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("cents").cast("long").alias("wmedian_cents"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("flag")
    )



# --------------------- 148. KWIC concordance

@q(
    "q265_kwic_concordance",
    """
    WITH tok AS (SELECT doc_id,
                        string_split(trim(regexp_replace(
                            lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                 FROM documents WHERE doc_id < 200),
    ex AS (SELECT doc_id, i AS pos, toks[i] AS tk, toks
           FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)),
    hits AS (SELECT doc_id, pos,
                    coalesce(array_to_string(
                        toks[greatest(pos - 2, 1):pos - 1], ' '), '')
                        AS left_ctx,
                    coalesce(array_to_string(
                        toks[pos + 1:least(pos + 2, len(toks))], ' '), '')
                        AS right_ctx
             FROM ex WHERE tk = 'merge')
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, left_ctx, right_ctx
    FROM hits ORDER BY doc_id, pos
    """,
)
def q265_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC (keyword-in-context) concordance: every occurrence of a
    term with its ±2-word context window — the corpus-inspection
    query behind "how is this token actually used" during vocab and
    filter-rule design. Built on the positional-index machinery
    (q250): posexplode with the token ARRAY carried alongside, so
    context extraction is an in-row slice at each hit — no second
    join back to the document, no substring scanning. Scale shape:
    scan-side explode + filter; output rows = term frequency. The
    slice bounds clamp at document edges (greatest/least), matching
    the oracle's 1-based array slicing exactly."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
        " ",
    )
    ex = docs.select(
        "doc_id",
        norm.alias("toks"),
        F.posexplode(norm).alias("pos0", "tk"),
    ).withColumn("pos", F.col("pos0") + 1)
    hits = ex.filter(F.col("tk") == "merge").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(
            F.slice(
                F.col("toks"),
                F.greatest(F.col("pos") - 2, F.lit(1)),
                F.when(F.col("pos") - 2 >= 1, F.lit(2)).otherwise(
                    F.col("pos") - 1
                ),
            ),
            " ",
        ).alias("left_ctx"),
        F.array_join(
            F.slice(
                F.col("toks"),
                F.col("pos") + 1,
                F.greatest(
                    F.least(
                        F.lit(2), F.size(F.col("toks")) - F.col("pos")
                    ),
                    F.lit(0),
                ),
            ),
            " ",
        ).alias("right_ctx"),
    )
    return hits.orderBy("doc_id", "pos")


# --------------------- 149. time-weighted average (TWAP)

@q(
    "q276_twap_daily",
    """
    WITH ev AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents,
               event_id
        FROM events),
    seg AS (
        SELECT day, cents,
               lead(us) OVER (PARTITION BY user_id, day
                              ORDER BY us, event_id) - us AS dt
        FROM ev),
    agg AS (
        SELECT day, sum(cents * dt) AS wsum, sum(dt) AS tsum
        FROM seg WHERE dt IS NOT NULL GROUP BY 1)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST((1000000 * wsum) // tsum AS BIGINT) AS twap_microcents
    FROM agg WHERE tsum > 0 ORDER BY 1
    """,
)
def q276_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP — the fair-average standard
    when observations arrive irregularly: each reading holds until the
    user's next event, so sparse quiet periods aren't swamped by burst
    sampling). Each event's value (in exact cents) is weighted by the
    MICROSECONDS until that user's next same-day event (lead over a
    (user, day) window with an event_id tie-break so duplicate
    timestamps order identically in both engines); the day's TWAP is
    Σ(cents·dt) / Σdt emitted in exact integer micro-cents. Scale
    shape: the window partitions by (user, day) — per-partition state
    is one user-day of events; the day rollup is one
    map-side-combined groupBy; nothing global until the final
    ~thousands-of-days frame."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy("us", "event_id")
    seg = ev.select(
        "day", "cents", (F.lead("us", 1).over(w) - F.col("us")).alias("dt")
    )
    dec = "decimal(38,0)"
    agg = (
        seg.filter(F.col("dt").isNotNull())
        .groupBy("day")
        .agg(
            F.sum(F.col("cents").cast(dec) * F.col("dt")).alias("wsum"),
            F.sum("dt").cast(dec).alias("tsum"),
        )
    )
    num = F.lit(1000000).cast(dec) * F.col("wsum")
    den = F.col("tsum")
    return (
        agg.filter(F.col("tsum") > 0)
        .select(
            F.col("day").cast("string").alias("day"),
            ((num - num % den) / den).cast("long").alias("twap_microcents"),
        )
        .orderBy("day")
    )


# --------------------- 150. behavioral path mining (top trigrams)

@q(
    "q278_path_trigrams",
    """
    WITH ordered AS (
        SELECT event_type AS t1,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t3
        FROM events),
    paths AS (
        SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
        FROM ordered WHERE t3 IS NOT NULL GROUP BY 1),
    ranked AS (
        SELECT path, n,
               row_number() OVER (ORDER BY n DESC, path) AS rk
        FROM paths)
    SELECT path, CAST(n AS BIGINT) AS n FROM ranked
    WHERE rk <= 10 ORDER BY n DESC, path
    """,
)
def q278_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 10 most common length-3 event-type
    sequences across user journeys (the input to funnel redesign and
    next-action models; q188/q238 cover single transitions, this is
    the order-3 extension). Consecutive triples come from two lead()
    calls over a per-user window with an event_id tie-break (duplicate
    timestamps order identically in both engines — no RNG, no
    nondeterministic row order), then one count agg and a top-k. Scale
    shape: window state is one user's stream; trigram cardinality is
    |event_types|³ at worst, so the count agg map-side combines to a
    tiny frame before the global top-10 sort."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = (
        ordered.filter(F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = F.row_number().over(Window.orderBy(F.desc("n"), "path"))
    return (
        paths.withColumn("rk", rk)
        .filter(F.col("rk") <= 10)
        .select("path", "n")
        .orderBy(F.desc("n"), "path")
    )


# --------------------- 151. Theil–Sen robust trend (median of slopes)

@q(
    "q285_theil_sen_trend",
    """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        FROM orders GROUP BY 1),
    idx AS (SELECT y, row_number() OVER (ORDER BY wk) AS x FROM weekly),
    pairs AS (
        SELECT (1000000 * (b.y - a.y)) // (b.x - a.x) AS slope
        FROM idx a JOIN idx b ON b.x > a.x),
    m AS (SELECT count(*) AS m FROM pairs),
    sv AS (SELECT slope, count(*) AS cnt FROM pairs GROUP BY 1),
    cum AS (SELECT slope,
                   sum(cnt) OVER (ORDER BY slope) AS cum_cnt
            FROM sv),
    med AS (SELECT min(slope) AS slope_micro FROM cum, m
            WHERE cum_cnt >= (m.m + 1) // 2),
    resid AS (
        SELECT 1000000 * i.y - s.slope_micro * i.x AS r
        FROM idx i CROSS JOIN med s),
    rm AS (SELECT count(*) AS m FROM resid),
    rv AS (SELECT r, count(*) AS cnt FROM resid GROUP BY 1),
    rcum AS (SELECT r, sum(cnt) OVER (ORDER BY r) AS cum_cnt FROM rv),
    rmed AS (SELECT min(r) AS intercept_micro FROM rcum, rm
             WHERE cum_cnt >= (rm.m + 1) // 2)
    SELECT CAST((SELECT count(*) FROM weekly) AS BIGINT) AS n_weeks,
           CAST(m.m AS BIGINT) AS n_pairs,
           CAST(med.slope_micro AS BIGINT) AS slope_micro,
           CAST(rmed.intercept_micro AS BIGINT) AS intercept_micro
    FROM m CROSS JOIN med CROSS JOIN rmed
    """,
)
def q285_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise slopes —
    29% breakdown point, so a quarter of the weeks can be corrupted
    before the estimate moves, where q257's OLS folds to a single
    outlier. Exactness: slopes truncate to integer micro BEFORE the
    median (both engines rank identical integers; the lower median —
    k = (m+1) div 2 — is picked by a cumulative-count crossing on the
    distinct-value histogram, q264's weighted-median machinery, no
    percentile interpolation); the intercept is the same exact median
    over per-week residuals against the chosen slope. Scale shape:
    the O(n²) pair join runs on the WEEKLY aggregate — a few hundred
    rows per decade regardless of corpus size (the fact table
    collapses first), so ~10⁵ pair rows where a row-level pair join
    would be 10¹³; medians run over distinct-value histograms, not
    raw pair lists."""
    orders = _t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("wk")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    # The weekly series and the pair table feed several consumers
    # (counts, two medians) — localCheckpoint once so the fact-table
    # scan runs once, not per crossJoined scalar subtree (first cut
    # re-derived it 6x: 34 exchanges for a 4-scalar answer).
    idx = (
        weekly.withColumn("x", F.row_number().over(Window.orderBy("wk")))
        .select("x", "y")
        .localCheckpoint()
    )
    a = idx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = idx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    # 1000000 * weekly-cents-delta overflows BIGINT at larger SF under
    # ANSI (same exposure q256 hit); DuckDB auto-promotes to HUGEINT,
    # so route the numerator through DECIMAL(38,0) and truncate with
    # the exact-multiple trick (num - num % den keeps div-toward-zero,
    # matching DuckDB `//` on negatives).
    s_num = (F.lit(1000000).cast("decimal(38,0)")
             * (F.col("yb") - F.col("ya")).cast("decimal(38,0)"))
    s_den = (F.col("xb") - F.col("xa")).cast("decimal(38,0)")
    pairs = (
        a.join(b, F.col("xb") > F.col("xa"))
        .select(
            ((s_num - s_num % s_den) / s_den).cast("long").alias("slope")
        )
        .localCheckpoint()
    )

    def lower_median_value(df: DataFrame, col: str) -> int:
        """Exact lower median (k = (m+1) div 2) via cumulative counts
        over the distinct-value histogram — never sorts raw rows; the
        result is a 1-row scalar collect."""
        m = df.count()
        sv = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        cum = sv.withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy(col).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        [row] = (
            cum.filter(F.col("cum") >= F.lit((m + 1) // 2))
            .agg(F.min(col).alias("v"))
            .collect()
        )
        return int(row.v)

    n_weeks = idx.count()
    n_pairs = pairs.count()
    slope = lower_median_value(pairs, "slope")
    # Same HUGEINT-vs-long exposure as the slope numerator: 1000000*y
    # is weekly cents ×10⁶ — stay in decimal(38,0) through the median
    # (the DuckDB twin stays in HUGEINT); int() on the scalar at the
    # end is exact.
    resid = idx.select(
        (
            F.lit(1000000).cast("decimal(38,0)")
            * F.col("y").cast("decimal(38,0)")
            - F.lit(slope).cast("decimal(38,0)")
            * F.col("x").cast("decimal(38,0)")
        ).alias("r")
    )
    intercept = lower_median_value(resid, "r")
    return spark.createDataFrame(
        [(n_weeks, n_pairs, slope, intercept)],
        "n_weeks long, n_pairs long, slope_micro long, intercept_micro long",
    )


# --------------------- 152. exact Wasserstein-1 drift

@q(
    "q287_wasserstein_drift",
    """
    WITH src AS (
        SELECT o_orderpriority AS prio,
               least(CAST(floor(o_totalprice / 60000.0) AS INTEGER), 9)
                   AS bin
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    counts AS (
        SELECT bin,
               sum(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END) AS cb
        FROM src GROUP BY 1),
    grid AS (SELECT unnest(range(0, 10)) AS bin),
    filled AS (
        SELECT g.bin, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
        FROM grid g LEFT JOIN counts c ON g.bin = c.bin),
    cum AS (
        SELECT bin,
               sum(ca) OVER (ORDER BY bin) AS cuma,
               sum(cb) OVER (ORDER BY bin) AS cumb,
               (SELECT sum(ca) FROM filled) AS na,
               (SELECT sum(cb) FROM filled) AS nb
        FROM filled),
    gaps AS (
        SELECT bin,
               (1000000 * cuma) // na AS cdf_a_micro,
               (1000000 * cumb) // nb AS cdf_b_micro,
               (1000000 * abs(cuma * nb - cumb * na)) // (na * nb)
                   AS gap_micro
        FROM cum)
    SELECT CAST(bin AS INTEGER) AS bin,
           CAST(cdf_a_micro AS BIGINT) AS cdf_a_micro,
           CAST(cdf_b_micro AS BIGINT) AS cdf_b_micro,
           CAST(gap_micro AS BIGINT) AS gap_micro
    FROM gaps
    UNION ALL
    SELECT -1, 0, 0, CAST(sum(gap_micro) AS BIGINT) FROM gaps
    ORDER BY bin
    """,
)
def q287_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Wasserstein-1 (earth-mover) drift between two segments'
    price distributions on a fixed equi-width grid — the
    distribution-shift measure that, unlike PSI (q80), respects the
    METRIC on the support: probability mass moved two bins costs
    twice mass moved one bin, so a gradual rightward shift scores
    proportionally to its size instead of saturating a log-ratio. On
    a shared grid W1 = binwidth·Σ_bins |CDF_a − CDF_b|; each CDF gap
    is exact integer micro via cross-multiplication
    (|cum_a·n_b − cum_b·n_a| // (n_a·n_b)) — no float CDFs, no
    rounding drift, summable per bin (the -1 row is the total in
    micro-bin units). Scale shape: one conditional-count agg over the
    scan collapses everything to 10 bins; windows and joins run on
    the grid only."""
    orders = _t(spark, sf_dir, "orders")
    src = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_orderpriority").alias("prio"),
        F.least(
            F.floor(F.col("o_totalprice") / 60000.0).cast("int"), F.lit(9)
        ).alias("bin"),
    )
    counts = src.groupBy("bin").agg(
        F.sum(F.when(F.col("prio") == "1-URGENT", 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("prio") == "5-LOW", 1).otherwise(0)).alias("cb"),
    )
    grid = spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    filled = grid.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    cum = filled.select(
        "bin",
        F.sum("ca").over(w).cast(dec).alias("cuma"),
        F.sum("cb").over(w).cast(dec).alias("cumb"),
        F.sum("ca").over(wtot).cast(dec).alias("na"),
        F.sum("cb").over(wtot).cast(dec).alias("nb"),
    )

    def tdv(num, den):
        return ((num - num % den) / den).cast("long")

    M = F.lit(1000000).cast(dec)
    gaps = cum.select(
        "bin",
        tdv(M * F.col("cuma"), F.col("na")).alias("cdf_a_micro"),
        tdv(M * F.col("cumb"), F.col("nb")).alias("cdf_b_micro"),
        tdv(
            M
            * F.abs(
                F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")
            ),
            F.col("na") * F.col("nb"),
        ).alias("gap_micro"),
    )
    total = gaps.agg(F.sum("gap_micro").alias("g")).select(
        F.lit(-1).alias("bin"),
        F.lit(0).cast("long").alias("cdf_a_micro"),
        F.lit(0).cast("long").alias("cdf_b_micro"),
        F.col("g").cast("long").alias("gap_micro"),
    )
    return gaps.unionByName(total).orderBy("bin")


# --------------------- 153. cohort LTV curves

@q(
    "q289_cohort_ltv",
    """
    WITH om AS (
        SELECT o_custkey,
               (date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate)) AS m,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    cohorts AS (
        SELECT o_custkey, min(m) AS cohort_m FROM om GROUP BY 1),
    sizes AS (
        SELECT cohort_m, count(*) AS n_customers
        FROM cohorts GROUP BY 1),
    rev AS (
        SELECT c.cohort_m, o.m - c.cohort_m AS age, sum(o.cents) AS cents
        FROM om o JOIN cohorts c USING (o_custkey)
        GROUP BY 1, 2),
    curve AS (
        SELECT cohort_m, age,
               sum(cents) OVER (PARTITION BY cohort_m ORDER BY age)
                   AS cum_cents
        FROM rev)
    SELECT CAST(v.cohort_m AS INTEGER) AS cohort_month,
           CAST(v.age AS INTEGER) AS age_months,
           CAST(s.n_customers AS BIGINT) AS n_customers,
           CAST((1000000 * v.cum_cents) // s.n_customers AS BIGINT)
               AS ltv_microcents
    FROM curve v JOIN sizes s USING (cohort_m)
    WHERE v.age <= 12
    ORDER BY 1, 2
    """,
)
def q289_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by
    first-purchase month, cumulative revenue per customer tracked by
    cohort age (capped at 12 months for a bounded, comparable curve
    matrix) — the retention-economics view q107's retention counts
    don't price. Months live as integer year*12+month so age is pure
    integer subtraction (no interval arithmetic to reconcile);
    per-customer LTV is a truncating micro-cents division by the
    cohort's size. Scale shape: one groupBy(customer) for cohorts
    (map-side combined), revenue collapses to (cohort, age) grain
    BEFORE the running-sum window — the window input is cohorts ×
    ages (~hundreds of rows) regardless of corpus size; the cohort
    assignment rides a broadcast-joinable customer→cohort map at any
    realistic cardinality (AQE picks the join side)."""
    orders = _t(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohorts = om.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = cohorts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        om.join(cohorts, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"))
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("cohort_m").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = rev.withColumn("cum_cents", F.sum("cents").over(w))
    dec = "decimal(38,0)"
    num = F.lit(1000000).cast(dec) * F.col("cum_cents").cast(dec)
    den = F.col("n_customers").cast(dec)
    return (
        curve.join(F.broadcast(sizes), "cohort_m")
        .filter(F.col("age") <= 12)
        .select(
            F.col("cohort_m").cast("int").alias("cohort_month"),
            F.col("age").cast("int").alias("age_months"),
            F.col("n_customers").cast("long").alias("n_customers"),
            ((num - num % den) / den).cast("long").alias("ltv_microcents"),
        )
        .orderBy("cohort_month", "age_months")
    )


# --------------------- 154. exact conversion-latency quantiles

@q(
    "q292_conversion_latency",
    """
    WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT user_id, min(ts) AS first_purchase FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
    lat AS (
        SELECT (epoch_us(p.first_purchase) - epoch_us(v.first_view))
                   // 1000000 AS s
        FROM v JOIN p USING (user_id)
        WHERE p.first_purchase >= v.first_view),
    m AS (SELECT count(*) AS m FROM lat),
    hist AS (SELECT s, count(*) AS cnt FROM lat GROUP BY 1),
    cum AS (SELECT s, sum(cnt) OVER (ORDER BY s) AS cum_cnt FROM hist),
    qs AS (
        SELECT (SELECT min(s) FROM cum, m
                WHERE cum_cnt >= (m.m + 3) // 4) AS p25,
               (SELECT min(s) FROM cum, m
                WHERE cum_cnt >= (m.m + 1) // 2) AS p50,
               (SELECT min(s) FROM cum, m
                WHERE cum_cnt >= (3 * m.m + 3) // 4) AS p75)
    SELECT CAST(m.m AS BIGINT) AS n_users,
           CAST(qs.p25 AS BIGINT) AS p25_s,
           CAST(qs.p50 AS BIGINT) AS p50_s,
           CAST(qs.p75 AS BIGINT) AS p75_s
    FROM m CROSS JOIN qs
    """,
)
def q292_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact p25/p50/p75 of the seconds
    between each user's FIRST view and FIRST purchase (users who
    purchased at-or-after their first view) — the product metric
    funnels (q108) and transition matrices (q188) don't give. Exact
    order statistics use the ceil-rank convention k_q = ceil(q·m)
    picked off a cumulative-count walk over the DISTINCT-latency
    histogram (q264's machinery): integer seconds in, integer seconds
    out, no percentile interpolation for engines to disagree on.
    Scale shape: first-touch collapse is one map-side-combined
    groupBy per event type, the join runs at user grain, and the
    quantile walk runs over distinct latency values only."""
    ev = _t(spark, sf_dir, "events")

    def first_of(etype, alias):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min("ts").alias(alias))
        )

    lat = (
        first_of("view", "fv")
        .join(first_of("purchase", "fp"), "user_id")
        .filter(F.col("fp") >= F.col("fv"))
        .select(
            (
                (F.unix_micros("fp") - F.unix_micros("fv"))
                / F.lit(1000000)
            )
            .cast("long")
            .alias("s")
        )
    )
    lat = lat.localCheckpoint()
    m = lat.count()
    hist = lat.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.withColumn(
        "cum_cnt",
        F.sum("cnt").over(
            Window.orderBy("s").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).localCheckpoint()

    def q_at(k: int) -> int:
        [row] = (
            cum.filter(F.col("cum_cnt") >= F.lit(k))
            .agg(F.min("s").alias("v"))
            .collect()
        )
        return int(row.v)

    p25 = q_at((m + 3) // 4)
    p50 = q_at((m + 1) // 2)
    p75 = q_at((3 * m + 3) // 4)
    return spark.createDataFrame(
        [(m, p25, p50, p75)],
        "n_users long, p25_s long, p50_s long, p75_s long",
    )


# --------------------- 155. position-based multi-touch attribution

@q(
    "q295_position_attribution",
    """
    WITH conv AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
    touch AS (
        SELECT user_id, ts AS tts, event_id AS tid, event_type
        FROM events WHERE event_type IN ('view', 'click')),
    joined AS (
        SELECT c.pid, c.cents, t.event_type, t.tts, t.tid
        FROM conv c JOIN touch t
          ON c.user_id = t.user_id
         AND t.tts >= c.pts - INTERVAL 7 DAY
         AND t.tts < c.pts),
    ranked AS (
        SELECT pid, cents, event_type,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY tts, tid) AS rn,
               count(*) OVER (PARTITION BY pid) AS n
        FROM joined),
    credited AS (
        SELECT event_type,
               CASE
                 WHEN n = 1 THEN cents
                 WHEN rn = 1 THEN (2 * cents) // 5
                      + CASE WHEN n = 2 THEN
                          (cents - 2 * ((2 * cents) // 5) + 1) // 2
                        ELSE 0 END
                 WHEN rn = n THEN (2 * cents) // 5
                      + CASE WHEN n = 2 THEN
                          (cents - 2 * ((2 * cents) // 5)) // 2
                        ELSE 0 END
                 ELSE (cents - 2 * ((2 * cents) // 5)) // (n - 2)
                      + CASE WHEN rn - 1
                                  <= (cents - 2 * ((2 * cents) // 5))
                                     % (n - 2)
                             THEN 1 ELSE 0 END
               END AS credit
        FROM ranked),
    attributed AS (
        SELECT event_type, sum(credit) AS credit_cents
        FROM credited GROUP BY 1),
    orphan AS (
        SELECT '(none)' AS event_type,
               coalesce(sum(cents), 0) AS credit_cents
        FROM conv WHERE NOT EXISTS (
            SELECT 1 FROM joined j WHERE j.pid = conv.pid))
    SELECT event_type, CAST(credit_cents AS BIGINT) AS credit_cents
    FROM (SELECT * FROM attributed UNION ALL SELECT * FROM orphan)
    ORDER BY event_type
    """,
)
def q295_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution with EXACT
    integer credit: each purchase's cents split 40% to the first
    touch, 40% to the last, 20% across the middles — the
    largest-remainder discipline (q244) scaled to a per-conversion
    window: truncating divisions set every base share and the
    leftover cents go to the EARLIEST middles, so Σ credit == cents
    for every conversion, bit-identical in both engines (a float
    40/20/40 would leak fractional cents per conversion — billions
    of conversions leak real money). Touches are the user's
    view/click events in the 7 days strictly before the purchase;
    purchases with no touches land in the '(none)' bucket so total
    credited always equals total revenue. Scale shape: the
    touch-window join is an equi-join on user with a range residual
    (never a cross join); ranking windows partition per conversion
    (state = one conversion's touches); the rollup is
    event-type-cardinality."""
    ev = _t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        "event_type",
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY"))
        & (F.col("tts") < F.col("pts"))
    ).select("pid", "cents", "event_type", "tts", "tid")
    wp = Window.partitionBy("pid")
    ranked = joined.select(
        "pid",
        "cents",
        "event_type",
        F.row_number().over(wp.orderBy("tts", "tid")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    base40 = F.expr("(2 * cents) div 5")
    pool = F.col("cents") - 2 * base40
    credit = (
        F.when(F.col("n") == 1, F.col("cents"))
        .when(
            F.col("rn") == 1,
            base40
            + F.when(
                F.col("n") == 2, F.expr("((cents - 2 * ((2 * cents) div 5)) + 1) div 2")
            ).otherwise(F.lit(0)),
        )
        .when(
            F.col("rn") == F.col("n"),
            base40
            + F.when(
                F.col("n") == 2, F.expr("(cents - 2 * ((2 * cents) div 5)) div 2")
            ).otherwise(F.lit(0)),
        )
        .otherwise(
            F.expr("(cents - 2 * ((2 * cents) div 5)) div (n - 2)")
            + F.when(
                F.col("rn") - 1
                <= F.expr("(cents - 2 * ((2 * cents) div 5)) % (n - 2)"),
                1,
            ).otherwise(0)
        )
    )
    attributed = ranked.select("event_type", credit.alias("credit")).groupBy(
        "event_type"
    ).agg(F.sum("credit").alias("credit_cents"))
    orphan = (
        conv.join(joined.select("pid").distinct(), "pid", "left_anti")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("credit_cents"))
        .select(F.lit("(none)").alias("event_type"), "credit_cents")
    )
    return (
        attributed.unionByName(orphan)
        .select(
            "event_type", F.col("credit_cents").cast("long").alias("credit_cents")
        )
        .orderBy("event_type")
    )


# --------------------- 156. share-of-parent hierarchy report

@q(
    "q298_share_of_parent",
    """
    WITH base AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2),
    reg AS (SELECT region, sum(cents) AS rcents FROM base GROUP BY 1),
    tot AS (SELECT sum(cents) AS tcents FROM base)
    SELECT b.region, b.nation,
           CAST(b.cents AS BIGINT) AS cents,
           CAST((1000000 * b.cents) // r.rcents AS BIGINT)
               AS share_of_region_micro,
           CAST((1000000 * r.rcents) // t.tcents AS BIGINT)
               AS region_share_micro
    FROM base b JOIN reg r USING (region) CROSS JOIN tot t
    ORDER BY b.region, b.nation
    """,
)
def q298_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent on the region→nation hierarchy — the
    ratio_to_report shape every BI rollup needs (q18's ROLLUP gives
    subtotals; this gives each node's weight WITHIN its parent and
    each parent's weight in the whole, both as exact truncating
    micro-shares of integer cents). Scale shape: the fact table joins
    customer→nation→region through broadcastable dims (AQE picks
    broadcast; nation/region are config-sized), collapses to
    (region, nation) grain in one map-side-combined agg, and every
    share computation runs on that ≤ |nations| frame — the 1-row
    grand total is the allowlisted broadcast crossJoin."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    reg = base.groupBy("region").agg(F.sum("cents").alias("rcents"))
    tot = base.agg(F.sum("cents").alias("tcents"))
    dec = "decimal(38,0)"

    def tdv(num, den):
        num = num.cast(dec)
        den = den.cast(dec)
        return ((num - num % den) / den).cast("long")

    M = F.lit(1000000).cast(dec)
    return (
        base.join(reg, "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("cents").cast("long").alias("cents"),
            tdv(M * F.col("cents"), F.col("rcents")).alias(
                "share_of_region_micro"
            ),
            tdv(M * F.col("rcents"), F.col("tcents")).alias(
                "region_share_micro"
            ),
        )
        .orderBy("region", "nation")
    )
