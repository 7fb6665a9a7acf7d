"""Model-evaluation and experiment-statistics queries (registry domain
added late round 5): ranking quality (AUC), survival analysis
(Nelson–Aalen), controlled-experiment variance reduction (CUPED),
autocorrelation, and seasonality-adjusted anomaly screens. Everything
is EXACT integer arithmetic end-to-end (the q257 normal-equations
discipline): moments accumulate as DECIMAL(38), ratios emit micro/
permille units via truncating division (`div` / DuckDB `//`, both
truncate toward zero), so there is never a float boundary for the
value hash to trip on.

These extend the reference's analytics surface (aggregation queries,
ref etl/4:26-91) to the evaluation loop a training-data pipeline runs
after mixing/dedup: did the filter's score rank duplicates ahead of
keepers (AUC), how long do users survive (hazard), did the A/B data
diet change downstream spend (CUPED), is the daily volume stationary
(ACF), which days are anomalous after weekday seasonality (screen).
"""

from __future__ import annotations

from ingestao_dados_poli_spark.registry._base import (
    DataFrame,
    F,
    SparkSession,
    Window,
    _scratch,
    _t,
    fan_out,
    q,
)

_DEC = "decimal(38,0)"


def _truncdiv(num, den):
    """Integer division truncating toward zero on DECIMAL operands —
    matches DuckDB `//` (verified: -7//2 = -3) and Spark `div` on
    integral types; spelled out because Spark's `/` on decimals is
    true division and `div`'s long result would be fine here but this
    form keeps the intermediate in decimal until the final cast."""
    return ((num - num % den) / den).cast("long")


# --------------------- 152. exact AUC (Mann–Whitney) per segment

@q(
    "q269_auc_mann_whitney",
    """
    WITH scored AS (
        SELECT l_linestatus AS grp,
               CAST(round(l_discount * 100) AS INTEGER) AS s,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_pos
        FROM lineitem),
    per_score AS (
        SELECT grp, s,
               sum(is_pos) AS p,
               sum(1 - is_pos) AS nneg
        FROM scored GROUP BY 1, 2),
    cum AS (
        SELECT grp, s, p, nneg,
               coalesce(sum(nneg) OVER (PARTITION BY grp ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS neg_below
        FROM per_score),
    agg AS (
        SELECT grp,
               sum(p) AS pos, sum(nneg) AS neg,
               sum(p * (2 * neg_below + nneg)) AS num2
        FROM cum GROUP BY 1)
    SELECT grp AS l_linestatus,
           CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
           CAST(CASE WHEN pos * neg = 0 THEN 0
                ELSE (1000000 * num2) // (2 * pos * neg) END AS BIGINT)
               AS auc_micro
    FROM agg ORDER BY 1
    """,
)
def q269_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC per segment WITHOUT a global sort: the
    Mann–Whitney identity AUC = P(s⁺>s⁻) + ½P(s⁺=s⁻) over pos/neg
    pairs, computed by grouping on DISTINCT SCORE VALUES — per score
    count positives/negatives, a window over ordered scores yields
    negatives-strictly-below, and Σ p_s·(2·cum_neg_below + neg_s) is
    exactly 2·(concordant + ½·tied). A rank-based AUC
    (`(Σrank⁺ - P(P+1)/2)/(P·N)`) needs a TOTAL order over every row
    — a full sort of the fact table; this form shuffles once on
    (segment, score) whose cardinality is segments × distinct scores
    (here 2 × 11 discount levels), then a tiny window — the shape that
    survives 100 TB. Emits exact micro units via truncating division.
    Labels: was the line item returned; score: its discount level."""
    li = _t(spark, sf_dir, "lineitem")
    scored = li.select(
        F.col("l_linestatus").alias("grp"),
        F.round(F.col("l_discount") * 100).cast("int").alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
    )
    per_score = scored.groupBy("grp", "s").agg(
        F.sum("is_pos").alias("p"),
        F.sum(F.lit(1) - F.col("is_pos")).alias("nneg"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("nneg").over(w), F.lit(0))
    )
    agg = cum.groupBy("grp").agg(
        F.sum("p").cast(_DEC).alias("pos"),
        F.sum("nneg").cast(_DEC).alias("neg"),
        F.sum(
            F.col("p").cast(_DEC)
            * (F.lit(2).cast(_DEC) * F.col("neg_below") + F.col("nneg"))
        ).alias("num2"),
    )
    return agg.select(
        F.col("grp").alias("l_linestatus"),
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"),
        # An all-positive or all-negative segment makes the Mann–Whitney
        # denominator zero — ANSI Spark would throw DIVIDE_BY_ZERO where
        # DuckDB's `// 0` yields NULL, so both engines pin it to 0
        # (AUC is undefined with one class; 0 is the sentinel).
        F.when(F.col("pos") * F.col("neg") == 0, F.lit(0).cast("long"))
        .otherwise(
            _truncdiv(
                F.lit(1000000).cast(_DEC) * F.col("num2"),
                F.lit(2).cast(_DEC) * F.col("pos") * F.col("neg"),
            )
        )
        .alias("auc_micro"),
    ).orderBy("l_linestatus")


# --------------------- 153. Nelson–Aalen cumulative hazard (survival)

@q(
    "q270_nelson_aalen",
    """
    WITH cutoff AS (
        SELECT max(CAST(o_orderdate AS DATE)) - 365 AS cut
        FROM orders),
    life AS (
        SELECT o_custkey,
               date_diff('day', min(CAST(o_orderdate AS DATE)),
                         max(CAST(o_orderdate AS DATE))) // 30 AS dur_m,
               CASE WHEN max(CAST(o_orderdate AS DATE))
                         < (SELECT cut FROM cutoff) THEN 1 ELSE 0 END AS ev
        FROM orders GROUP BY 1),
    per_t AS (
        SELECT dur_m, sum(ev) AS d, count(*) AS leaving
        FROM life GROUP BY 1),
    risk AS (
        SELECT dur_m, d,
               sum(leaving) OVER (ORDER BY dur_m
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_at_risk
        FROM per_t),
    haz AS (
        SELECT dur_m, d, n_at_risk,
               sum((1000000 * d) // n_at_risk)
                   OVER (ORDER BY dur_m) AS cumhaz_micro
        FROM risk)
    SELECT CAST(dur_m AS BIGINT) AS duration_months,
           CAST(d AS BIGINT) AS n_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(cumhaz_micro AS BIGINT) AS cumhaz_micro
    FROM haz WHERE d > 0 ORDER BY 1
    """,
)
def q270_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis with right-censoring, EXACT: the Nelson–Aalen
    cumulative-hazard estimator H(t) = Σ_{u≤t} d_u/n_u over customer
    lifetimes (months between first and last order, "churn" observed
    only when the last order predates max-date − 365d; later customers
    are censored — they leave the risk set without an event). Chosen
    over Kaplan–Meier's Π(1−d/n) precisely because SUMS linearize:
    each hazard increment truncates to exact integer micro BEFORE the
    running sum, so both engines agree bit-for-bit, while a product
    estimator forces float exp/ln whose last-ULP behavior is libm-
    specific. Scale shape: one groupBy(customer) over the fact table
    (map-side combined), then all windows run over DISTINCT MONTH
    DURATIONS — dozens of rows regardless of corpus size; the at-risk
    count n_t = Σ_{u≥t} leaving_u comes from a reversed running sum,
    not a per-customer window."""
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min(od).alias("first_d"), F.max(od).alias("last_d")
    )
    cut = orders.agg(
        F.date_sub(F.max(od), 365).alias("cut")
    )
    life = per_cust.crossJoin(F.broadcast(cut)).select(
        F.expr("datediff(last_d, first_d) div 30").alias("dur_m"),
        F.when(F.col("last_d") < F.col("cut"), 1).otherwise(0).alias("ev"),
    )
    per_t = life.groupBy("dur_m").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w_risk = (
        Window.orderBy("dur_m")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = per_t.withColumn("n_at_risk", F.sum("leaving").over(w_risk))
    w_cum = Window.orderBy("dur_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    haz = risk.withColumn(
        "term", F.expr("(1000000 * d) div n_at_risk")
    ).withColumn("cumhaz_micro", F.sum("term").over(w_cum))
    return haz.filter(F.col("d") > 0).select(
        F.col("dur_m").cast("long").alias("duration_months"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("cumhaz_micro").cast("long").alias("cumhaz_micro"),
    ).orderBy("duration_months")


# --------------------- 154. CUPED variance-reduced experiment readout

@q(
    "q271_cuped_adjustment",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               o_custkey % 2 AS arm,
               sum(CASE WHEN date_part('year', o_orderdate) = 1995
                        THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               sum(CASE WHEN date_part('year', o_orderdate) = 1996
                        THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM orders
        WHERE date_part('year', o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2),
    tot AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM per_cust),
    theta AS (
        SELECT n, sx,
               (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                   AS theta_micro
        FROM tot),
    arms AS (
        SELECT arm, count(*) AS ng, sum(x) AS sxg, sum(y) AS syg
        FROM per_cust GROUP BY 1)
    SELECT CAST(a.arm AS BIGINT) AS arm,
           CAST(a.ng AS BIGINT) AS n_customers,
           CAST(t.theta_micro AS BIGINT) AS theta_micro,
           CAST((1000000 * a.syg) // a.ng AS BIGINT) AS mean_post_micro,
           CAST((1000000 * a.syg) // a.ng
                - (t.theta_micro * ((1000000 * a.sxg) // a.ng
                                    - (1000000 * t.sx) // t.n)) // 1000000
                AS BIGINT) AS adj_post_micro
    FROM arms a CROSS JOIN theta t ORDER BY 1
    """,
)
def q271_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data, Deng et
    al. WSDM 2013) — THE industry-standard variance-reduction readout
    for A/B tests: adjust each arm's post-period metric by
    θ·(x̄_arm − x̄), where θ = cov(x,y)/var(x) is fit on pre-period
    spend (1995 cents) against post-period spend (1996 cents), pooled
    across arms (here a deterministic custkey-parity split, so both
    engines agree on assignment). EXACT staged integer arithmetic:
    θ in micro via DECIMAL(38) normal-equation moments and truncating
    division, arm means in micro likewise, and the adjustment
    multiplies the two micro quantities and strips the double scaling
    with one more truncating division — the SAME staged formula on
    both engines, so no rational-arithmetic overflow (the naive
    common-denominator form multiplies three row-count-sized sums and
    blows DECIMAL(38) at cluster scale). One scan, one
    groupBy(customer), a 1-row moments agg broadcast back."""
    orders = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        orders.filter(yr.isin(1995, 1996))
        .groupBy(
            "o_custkey", F.pmod(F.col("o_custkey"), F.lit(2)).alias("arm")
        )
        .agg(
            F.sum(F.when(yr == 1995, cents).otherwise(0)).alias("x"),
            F.sum(F.when(yr == 1996, cents).otherwise(0)).alias("y"),
        )
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).alias("sxx"),
    )
    theta = tot.select(
        "n",
        "sx",
        _truncdiv(
            F.lit(1000000).cast(_DEC)
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")),
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
        ).alias("theta_micro"),
    )
    arms = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast(_DEC).alias("ng"),
        F.sum("x").cast(_DEC).alias("sxg"),
        F.sum("y").cast(_DEC).alias("syg"),
    )
    joined = arms.crossJoin(F.broadcast(theta))
    mean_post = _truncdiv(
        F.lit(1000000).cast(_DEC) * F.col("syg"), F.col("ng")
    )
    mean_x_g = _truncdiv(
        F.lit(1000000).cast(_DEC) * F.col("sxg"), F.col("ng")
    )
    mean_x = _truncdiv(
        F.lit(1000000).cast(_DEC) * F.col("sx"), F.col("n")
    )
    adj = mean_post - _truncdiv(
        F.col("theta_micro").cast(_DEC) * (mean_x_g - mean_x).cast(_DEC),
        F.lit(1000000).cast(_DEC),
    )
    return joined.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("ng").cast("long").alias("n_customers"),
        F.col("theta_micro").cast("long").alias("theta_micro"),
        mean_post.alias("mean_post_micro"),
        adj.alias("adj_post_micro"),
    ).orderBy("arm")


# --------------------- 155. exact autocorrelation of the daily series

@q(
    "q272_acf_daily_volume",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               count(*) AS y
        FROM orders GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(y) AS HUGEINT) AS s FROM daily),
    idx AS (SELECT y, row_number() OVER (ORDER BY day) AS i FROM daily),
    lagged AS (
        SELECT k.lag AS lag, a.y, b.y AS y_prev
        FROM idx a
        CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k
        LEFT JOIN idx b ON b.i = a.i - k.lag),
    parts AS (
        SELECT l.lag,
               sum(CASE WHEN l.y_prev IS NOT NULL
                        THEN (t.n * l.y - t.s) * (t.n * l.y_prev - t.s)
                        ELSE 0 END) AS num,
               sum((t.n * l.y - t.s) * (t.n * l.y - t.s)) AS den
        FROM lagged l CROSS JOIN tot t GROUP BY 1)
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST((1000000 * num) // den AS BIGINT) AS acf_micro
    FROM parts ORDER BY 1
    """,
)
def q272_acf_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact autocorrelation function of daily order volume at lags
    1..7 — the stationarity screen run before trusting any trend
    model: r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)², with both sides
    multiplied through by n² so every term is an integer
    ((n·y_t − S) replaces (y_t − ȳ)) — no float mean subtraction.
    Scale shape: the fact table collapses to DAILY grain first (one
    map-side-combined groupBy bounds everything downstream to ~2.4k
    rows/decade regardless of corpus size), the 1-row total broadcast
    back; the lag-k series come from an index EQUI-JOIN (day-number
    self-join with the 7 lags exploded as data) rather than 7 separate
    F.lag windows, so all lags materialize in one shuffle instead of
    sequentially widening one plan."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    tot = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("y").cast(_DEC).alias("s"),
    )
    # F.lag needs a literal offset; with lag as DATA the lag-k series
    # comes from joining the day-indexed series to itself on the
    # computed key i - lag == i' (an equi-join Catalyst hash-joins).
    idx = Window.orderBy("day")
    di = daily.withColumn("i", F.row_number().over(idx))
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    left = di.select("i", "y").crossJoin(F.broadcast(lags))
    shifted = di.select(F.col("i").alias("ip"), F.col("y").alias("y_prev"))
    lagged = left.join(shifted, left.i - left.lag == shifted.ip, "left")
    joined = lagged.crossJoin(F.broadcast(tot))
    tot_n, tot_s = F.col("n"), F.col("s")
    parts = joined.groupBy("lag").agg(
        F.sum(
            F.when(
                F.col("y_prev").isNotNull(),
                (tot_n * F.col("y") - tot_s)
                * (tot_n * F.col("y_prev") - tot_s),
            ).otherwise(F.lit(0).cast(_DEC))
        ).alias("num"),
        F.sum(
            (tot_n * F.col("y") - tot_s) * (tot_n * F.col("y") - tot_s)
        ).alias("den"),
    )
    return parts.select(
        F.col("lag").cast("int").alias("lag"),
        _truncdiv(
            F.lit(1000000).cast(_DEC) * F.col("num"), F.col("den")
        ).alias("acf_micro"),
    ).orderBy("lag")


# --------------------- 156. seasonality-adjusted anomaly cells

# Oracle shared by the batch screen (q273) and its streaming twin
# (q283): both must equal the same DuckDB recomputation from the raw
# table — the streaming path differs only in HOW the cell table is
# maintained, never in what it contains.
_SEASONAL_SQL = """
    WITH cells AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(date_part('hour', ts) AS INTEGER) AS hod,
               count(*) AS c
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT hod, count(*) AS n, sum(c) AS s, sum(c * c) AS qq
        FROM cells GROUP BY 1)
    SELECT CAST(d.day AS VARCHAR) AS day, d.hod, CAST(d.c AS BIGINT) AS c,
           CASE WHEN s.n * d.c - s.s > 0 THEN 1 ELSE -1 END AS direction
    FROM cells d JOIN stats s ON d.hod = s.hod
    WHERE (s.n * d.c - s.s) * (s.n * d.c - s.s)
          > 4 * (s.n * s.qq - s.s * s.s)
    ORDER BY d.day, d.hod
    """


def _hour_seasonal_screen(cells: DataFrame) -> DataFrame:
    """2σ hour-of-day anomaly screen over a (day, hod, c) cell table —
    the shared tail of q273 (batch cells) and q283 (streamed cells).
    Pure integer predicate: (n·c − S)² > 4·(n·Q − S²)."""
    stats = cells.groupBy("hod").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("c").cast(_DEC).alias("s"),
        F.sum(F.col("c").cast(_DEC) * F.col("c")).alias("qq"),
    )
    j = cells.join(F.broadcast(stats), "hod")
    dev = F.col("n") * F.col("c") - F.col("s")
    cond = dev * dev > F.lit(4).cast(_DEC) * (
        F.col("n") * F.col("qq") - F.col("s") * F.col("s")
    )
    return (
        j.filter(cond)
        .select(
            F.col("day").cast("string").alias("day"),
            "hod",
            F.col("c").cast("long").alias("c"),
            F.when(dev > 0, 1).otherwise(-1).alias("direction"),
        )
        .orderBy("day", "hod")
    )


@q("q273_seasonal_anomaly_hours", _SEASONAL_SQL)
def q273_seasonal_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted volume anomaly screen: hourly event counts
    are compared against their OWN HOUR-OF-DAY's mean and variance
    across days (the 3am lull is not an anomaly at 3am), flagging
    cells beyond 2σ. The test (c − μ_h)² > (2σ_h)² is multiplied
    through by n² — with population variance, n²σ² = n·Q − S², so the
    integer form is (n·c − S)² > 4·(n·Q − S²): no sqrt, no float mean,
    no stddev rounding to reconcile across engines. Scale shape: the
    event stream collapses to (day, hour) grain in one
    map-side-combined groupBy; the 24-row hour stats broadcast-join
    back onto the cells, so nothing downstream of the first agg ever
    exceeds cells-count rows."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return _hour_seasonal_screen(cells)


# --------------------- 157. calibration / reliability diagram

@q(
    "q274_calibration_bins",
    """
    WITH feat AS (
        SELECT CAST(round(l_discount * 100) AS INTEGER) AS d,
               CAST(floor(l_quantity / 10) AS INTEGER) AS qb,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                   || CAST(l_linenumber AS VARCHAR)), 1, 8))
                   ::BIGINT % 5 AS fold
        FROM lineitem),
    model AS (
        SELECT d, qb,
               (1000000 * sum(y)) // count(*) AS p_hat_micro
        FROM feat WHERE fold < 4 GROUP BY 1, 2),
    test AS (
        SELECT m.p_hat_micro, f.y
        FROM feat f JOIN model m ON f.d = m.d AND f.qb = m.qb
        WHERE f.fold = 4),
    binned AS (
        SELECT p_hat_micro // 100000 AS bin, p_hat_micro, y FROM test)
    SELECT CAST(bin AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(p_hat_micro) // count(*) AS BIGINT) AS mean_pred_micro,
           CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS obs_micro
    FROM binned GROUP BY 1 ORDER BY 1
    """,
)
def q274_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration bins) over a DETERMINISTIC
    md5 train/test fold split — the eval step that tells you whether a
    filter's scores can be read as probabilities: fit p̂(return | 
    discount, quantity-bucket) as an exact micro-rate on the 4 train
    folds, score the held-out fold by joining on the feature cell,
    bucket predictions into deciles, and compare mean-predicted
    against observed rate per bucket. The fold is a pure md5 function
    of the row key (q83's split idiom) so both engines carve
    identical folds; every rate is a truncating integer division —
    the diagram is bit-reproducible. Scale shape: the "model" is a
    groupBy over feature CELLS (|discounts| × |qty buckets| ≈ 66
    rows) that AQE broadcasts back onto the test fold; no per-row
    state, one scan each side. Unseen test cells drop at the inner
    join (a real holdout would route them to a prior)."""
    li = _t(spark, sf_dir, "lineitem")
    # fan_out BEFORE the md5/fold projection (r08): a projection built
    # below the repartition executes at scan parallelism (plan-checked:
    # Project(md5) sat under the Exchange — 600k md5+conv calls on the
    # 3 scan tasks, a 1.3 s stage); shuffling the 5 raw columns first
    # runs the hash work 32-way above the exchange.
    li = fan_out(
        li.select(
            "l_discount",
            "l_quantity",
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
        )
    )
    feat = li.select(
        F.round(F.col("l_discount") * 100).cast("int").alias("d"),
        F.floor(F.col("l_quantity") / 10).cast("int").alias("qb"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("fold"),
    )
    # ONE pass over feat (r08): the r07 intent of sharing the
    # repartition exchange between model and test branches never
    # materialized — Catalyst pushes the fold<4 / fold==4 filters BELOW
    # the repartition, the subtrees stop being equal, and ReusedExchange
    # cannot fire (drill: two full ~1 s scan+md5 passes; an eager
    # checkpoint barrier A/B-measured 1.08x against — materialization
    # costs more than the saved scan). Instead both folds aggregate in
    # the SAME 66-cell groupBy with conditional sums, and the reliability
    # diagram folds over cells: per test row, p_hat/bin/y depend only on
    # its (d, qb) cell, so sum(p_hat) over test rows = sum(p_hat*test_n)
    # over cells, count = sum(test_n), sum(y) = sum(test_y) — identical
    # integers, identical truncating divisions. Inner-join semantics
    # kept: cells with no train rows drop (train_n >= 1), cells with no
    # test rows produce no bin contribution (test_n >= 1).
    is_tr = F.col("fold") < 4
    is_te = F.col("fold") == 4
    cells = (
        feat.groupBy("d", "qb")
        .agg(
            F.sum(F.when(is_tr, 1).otherwise(0)).alias("train_n"),
            F.sum(F.when(is_tr, F.col("y")).otherwise(0)).alias("train_y"),
            F.sum(F.when(is_te, 1).otherwise(0)).alias("test_n"),
            F.sum(F.when(is_te, F.col("y")).otherwise(0)).alias("test_y"),
        )
        .filter((F.col("train_n") >= 1) & (F.col("test_n") >= 1))
        .withColumn(
            "p_hat_micro",
            _truncdiv(
                F.lit(1000000).cast(_DEC) * F.col("train_y").cast(_DEC),
                F.col("train_n").cast(_DEC),
            ),
        )
    )
    binned = cells.withColumn("bin", F.expr("p_hat_micro div 100000"))
    return (
        binned.groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.sum("test_n").alias("n_test"),
            _truncdiv(
                F.sum(
                    F.col("p_hat_micro").cast(_DEC)
                    * F.col("test_n").cast(_DEC)
                ),
                F.sum("test_n").cast(_DEC),
            ).alias("mean_pred_micro"),
            _truncdiv(
                F.lit(1000000).cast(_DEC) * F.sum("test_y").cast(_DEC),
                F.sum("test_n").cast(_DEC),
            ).alias("obs_micro"),
        )
        .orderBy("bin")
    )


# --------------------- 158. MASE forecast-accuracy ratio

@q(
    "q277_mase_seasonal",
    """
    WITH daily AS (
        SELECT o_orderpriority AS prio,
               CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               count(*) AS y
        FROM orders GROUP BY 1, 2),
    lagged AS (
        SELECT prio, y,
               lag(y, 1) OVER (PARTITION BY prio ORDER BY day) AS y1,
               lag(y, 7) OVER (PARTITION BY prio ORDER BY day) AS y7
        FROM daily),
    err AS (
        SELECT prio,
               sum(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) END) AS e1,
               sum(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN y7 IS NOT NULL THEN abs(y - y7) END) AS e7,
               sum(CASE WHEN y7 IS NOT NULL THEN 1 ELSE 0 END) AS n7
        FROM lagged GROUP BY 1)
    SELECT prio AS o_orderpriority,
           CAST(CASE WHEN n1 = 0 THEN 0
                ELSE (1000000 * e1) // n1 END AS BIGINT) AS mae_naive_micro,
           CAST(CASE WHEN n7 = 0 THEN 0
                ELSE (1000000 * e7) // n7 END AS BIGINT) AS mae_seasonal_micro,
           CAST(CASE WHEN coalesce(e1, 0) * n7 = 0 THEN 0
                ELSE (1000000 * e7 * n1) // (e1 * n7) END AS BIGINT)
               AS mase_micro
    FROM err ORDER BY 1
    """,
)
def q277_mase_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Mean Absolute Scaled Error, Hyndman & Koehler 2006) of a
    weekly seasonal-naive forecast against the one-step naive scale —
    THE unit-free forecast-accuracy standard: mase < 1 means ŷ_t =
    y_{t−7} beats ŷ_t = y_{t−1} on this series. Errors are integer
    count deltas, means and the final ratio exact micro via
    truncating division ((e7·n1)//(e1·n7) keeps the ratio in integers
    instead of dividing two truncated means). Scale shape: the fact
    table collapses to (priority, day) grain first; lag windows run
    per priority over the daily series — thousands of rows per group
    regardless of corpus size."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("prio").orderBy("day")
    lagged = daily.select(
        "prio",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"),
    )
    err = lagged.groupBy("prio").agg(
        F.sum(
            F.when(F.col("y1").isNotNull(), F.abs(F.col("y") - F.col("y1")))
        ).cast(_DEC).alias("e1"),
        F.sum(F.when(F.col("y1").isNotNull(), 1).otherwise(0))
        .cast(_DEC)
        .alias("n1"),
        F.sum(
            F.when(F.col("y7").isNotNull(), F.abs(F.col("y") - F.col("y7")))
        ).cast(_DEC).alias("e7"),
        F.sum(F.when(F.col("y7").isNotNull(), 1).otherwise(0))
        .cast(_DEC)
        .alias("n7"),
    )
    M = F.lit(1000000).cast(_DEC)
    zero = F.lit(0).cast("long")
    # A series too short for the lag (n=0) or a perfectly-flat naive
    # error (e1=0) zeroes a denominator: ANSI Spark throws where DuckDB
    # NULLs, so both engines pin the undefined ratio to 0 (same guard
    # pattern as q291's precision/recall).
    return err.select(
        F.col("prio").alias("o_orderpriority"),
        F.when(F.col("n1") == 0, zero)
        .otherwise(_truncdiv(M * F.col("e1"), F.col("n1")))
        .alias("mae_naive_micro"),
        F.when(F.col("n7") == 0, zero)
        .otherwise(_truncdiv(M * F.col("e7"), F.col("n7")))
        .alias("mae_seasonal_micro"),
        F.when(F.coalesce(F.col("e1"), F.lit(0)) * F.col("n7") == 0, zero)
        .otherwise(
            _truncdiv(M * F.col("e7") * F.col("n1"), F.col("e1") * F.col("n7"))
        )
        .alias("mase_micro"),
    ).orderBy("o_orderpriority")


# --------------------- 159. Gini-impurity feature ranking

@q(
    "q280_gini_feature_gain",
    """
    WITH feat AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               f.feature, f.v
        FROM lineitem,
             LATERAL (VALUES
                 ('discount', CAST(round(l_discount * 100) AS INTEGER)),
                 ('tax', CAST(round(l_tax * 100) AS INTEGER)),
                 ('qty_bucket', CAST(floor(l_quantity / 10) AS INTEGER))
             ) AS f(feature, v)),
    cells AS (
        SELECT feature, v, count(*) AS n, sum(y) AS pos
        FROM feat GROUP BY 1, 2),
    per_cell AS (
        SELECT feature, v, n,
               1000000 - (1000000 * (pos * pos + (n - pos) * (n - pos)))
                   // (n * n) AS g
        FROM cells),
    parent AS (
        SELECT feature, sum(n) AS n, sum(n * g) AS wg
        FROM per_cell GROUP BY 1),
    root AS (
        SELECT count(*) AS n, sum(CASE WHEN l_returnflag = 'R'
                                       THEN 1 ELSE 0 END) AS pos
        FROM lineitem),
    rootg AS (
        SELECT 1000000 - (1000000 * (pos * pos + (n - pos) * (n - pos)))
                   // (n * n) AS g0
        FROM root)
    SELECT p.feature,
           CAST((SELECT count(*) FROM per_cell c
                 WHERE c.feature = p.feature) AS BIGINT) AS n_values,
           CAST(r.g0 AS BIGINT) AS parent_gini_micro,
           CAST(r.g0 - p.wg // p.n AS BIGINT) AS gain_micro
    FROM parent p CROSS JOIN rootg r ORDER BY gain_micro DESC, p.feature
    """,
)
def q280_gini_feature_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature ranking by EXACT Gini-impurity gain — the split
    criterion decision trees use and the ln-free alternative to
    information gain (entropy needs libm log whose last ULP differs
    across engines; Gini is pure rational arithmetic): for each
    candidate feature, gain = G(root) − Σ_v (n_v/n)·G(v) with
    G = 1 − Σ p_c², every term held in micro units via truncating
    division (per-cell G truncates once, the weighted child sum
    divides once — the SAME staged formula in both engines). The
    three features unpivot IN-ROW (one scan, an explode to 3 rows)
    and everything downstream is a groupBy over feature CELLS
    (≤ ~70 rows). The winner tells a corpus curator which metadata
    field most predicts the positive class."""
    li = _t(spark, sf_dir, "lineitem")
    feat = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("discount").alias("feature"),
                    F.round(F.col("l_discount") * 100).cast("int").alias("v"),
                ),
                F.struct(
                    F.lit("tax").alias("feature"),
                    F.round(F.col("l_tax") * 100).cast("int").alias("v"),
                ),
                F.struct(
                    F.lit("qty_bucket").alias("feature"),
                    F.floor(F.col("l_quantity") / 10).cast("int").alias("v"),
                ),
            )
        ).alias("f"),
    ).select("y", "f.feature", "f.v")
    M = F.lit(1000000).cast(_DEC)

    def gini(pos, n):
        return M - _truncdiv(
            M * (pos * pos + (n - pos) * (n - pos)), n * n
        ).cast(_DEC)

    cells = feat.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("y").cast(_DEC).alias("pos"),
    )
    per_cell = cells.select(
        "feature", "n", gini(F.col("pos"), F.col("n")).alias("g")
    )
    parent = per_cell.groupBy("feature").agg(
        F.sum("n").alias("n"),
        F.sum(F.col("n") * F.col("g")).alias("wg"),
        F.count(F.lit(1)).alias("n_values"),
    )
    root = li.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).cast(_DEC).alias("pos"),
    ).select(gini(F.col("pos"), F.col("n")).alias("g0"))
    out = parent.crossJoin(F.broadcast(root)).select(
        "feature",
        F.col("n_values").cast("long").alias("n_values"),
        F.col("g0").cast("long").alias("parent_gini_micro"),
        (F.col("g0") - _truncdiv(F.col("wg"), F.col("n")))
        .cast("long")
        .alias("gain_micro"),
    )
    return out.orderBy(F.desc("gain_micro"), "feature")


# --------------------- 160. jackknife standard error of a ratio

@q(
    "q281_jackknife_ratio_var",
    """
    WITH base AS (
        SELECT o_orderpriority AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderstatus = 'F' THEN
                    CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END AS fcents
        FROM orders),
    tot AS (
        SELECT prio, count(*) AS n, sum(cents) AS yy, sum(fcents) AS xx
        FROM base GROUP BY 1),
    pseudo AS (
        SELECT b.prio, t.n,
               (1000000 * (t.xx - b.fcents)) // (t.yy - b.cents) AS r
        FROM base b JOIN tot t ON b.prio = t.prio),
    mom AS (
        SELECT prio, any_value(n) AS n, sum(r) AS sr, sum(r * r) AS srr
        FROM pseudo GROUP BY 1)
    SELECT prio AS o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           CAST((SELECT (1000000 * xx) // yy FROM tot
                 WHERE tot.prio = mom.prio) AS BIGINT) AS ratio_micro,
           CAST(((n - 1) * (n * srr - sr * sr)) // (n * n) AS BIGINT)
               AS jk_var_micro2
    FROM mom ORDER BY 1
    """,
)
def q281_jackknife_ratio_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one JACKKNIFE variance of a ratio estimator (Quenouille/
    Tukey — the resampling-free way to put an uncertainty on a ratio,
    where the naive per-row variance is wrong because numerator and
    denominator are correlated): for each order, the leave-one-out
    ratio R_i = (X−x_i)/(Y−y_i) truncates to exact integer micro;
    jackknife variance = (n−1)/n · Σ(R_i − R̄)², computed from the
    (ΣR, ΣR²) moments as ((n−1)·(n·ΣR² − (ΣR)²))//n² — one pass, all
    integers. Here: per priority, the share of revenue in 'F'-status
    orders. Scale shape: the 5-row totals broadcast back onto the
    fact table (AQE), R_i is a per-row expression, and the moment agg
    map-side combines — the jackknife costs ONE extra scan, not n
    re-estimates, which is the entire point at 100 TB."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        F.col("o_orderpriority").alias("prio"),
        cents.alias("cents"),
        F.when(F.col("o_orderstatus") == "F", cents)
        .otherwise(0)
        .alias("fcents"),
    )
    tot = base.groupBy("prio").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("yy"),
        F.sum("fcents").cast(_DEC).alias("xx"),
    )
    M = F.lit(1000000).cast(_DEC)
    pseudo = base.join(F.broadcast(tot), "prio").select(
        "prio",
        "n",
        _truncdiv(
            M * (F.col("xx") - F.col("fcents")),
            F.col("yy") - F.col("cents"),
        ).cast(_DEC).alias("r"),
    )
    mom = pseudo.groupBy("prio").agg(
        F.first("n").alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    ratio = tot.select(
        "prio", _truncdiv(M * F.col("xx"), F.col("yy")).alias("ratio_micro")
    )
    out = mom.join(F.broadcast(ratio), "prio").select(
        F.col("prio").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("ratio_micro"),
        _truncdiv(
            (F.col("n") - 1)
            * (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")),
            F.col("n") * F.col("n"),
        ).alias("jk_var_micro2"),
    )
    return out.orderBy("o_orderpriority")


# --------------------- 161. sample-ratio-mismatch (SRM) screen

@q(
    "q293_srm_check",
    """
    WITH arms AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END) AS n1
        FROM orders GROUP BY 1)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST((1000000 * (n0 - n1) * (n0 - n1)) // (n0 + n1) AS BIGINT)
               AS chi2_micro
    FROM arms
    WHERE (1000000 * (n0 - n1) * (n0 - n1)) // (n0 + n1) > 3841459
    ORDER BY day
    """,
)
def q293_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch screen — the FIRST validity check any A/B
    readout must pass (Fabijan et al. 2019: most "significant"
    experiment results with an SRM are bugs, not effects): under a
    50/50 split the daily arm-arrival chi-square is
    (n0−n1)²/(n0+n1), compared against the 1-dof 95% critical value
    3.841459. Both sides of the comparison are exact integers (micro
    units, truncating division) so the flag set is engine-identical —
    no p-value, no incomplete-gamma approximation to reconcile; with
    a healthy random split ~5% of days flag by chance, and a
    systematically lopsided assignment floods the list. Uses the same
    deterministic custkey-parity arms as the CUPED readout (q271) so
    the two checks describe one experiment. Scale shape: one
    conditional-count agg at daily grain; the filter is scan-side
    arithmetic on the aggregate."""
    orders = _t(spark, sf_dir, "orders")
    arms = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(F.pmod(F.col("o_custkey"), F.lit(2)) == 0, 1).otherwise(0)
        ).alias("n0"),
        F.sum(
            F.when(F.pmod(F.col("o_custkey"), F.lit(2)) == 1, 1).otherwise(0)
        ).alias("n1"),
    )
    chi2 = F.expr("(1000000 * (n0 - n1) * (n0 - n1)) div (n0 + n1)")
    return (
        arms.withColumn("chi2_micro", chi2.cast("long"))
        .filter(F.col("chi2_micro") > 3841459)
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("n0").cast("long"),
            F.col("n1").cast("long"),
            "chi2_micro",
        )
        .orderBy("day")
    )


# ------ 166. dedup -> versioned publish -> mix -> drift (pipeline E2E)

# Shared by q300 (batch) and q301 (streaming twin, registry/streaming.py):
# both run the SAME dedup→publish→mix→drift pipeline over the same two
# planted ingest batches, so one DuckDB recomputation oracles both — the
# streaming run must be batching-invariant down to the value hash.
_PIPELINE_E2E_SQL = r"""
    WITH dn AS (SELECT doc_id, lang, source,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                           AS fp
                FROM documents),
    b1 AS (SELECT doc_id, lang, source, fp FROM dn WHERE doc_id < 250),
    b2 AS (SELECT doc_id, lang, source, fp FROM dn WHERE doc_id >= 250
           UNION ALL
           SELECT doc_id + 50000, lang, source, fp FROM dn WHERE doc_id < 60),
    s1 AS (SELECT fp, min(doc_id) AS doc_id FROM b1 GROUP BY fp),
    surv1 AS (SELECT b.doc_id, b.lang, b.source
              FROM b1 b JOIN s1 ON b.doc_id = s1.doc_id),
    seen AS (SELECT DISTINCT fp FROM b1),
    s2 AS (SELECT fp, min(doc_id) AS doc_id FROM b2
           WHERE fp NOT IN (SELECT fp FROM seen) GROUP BY fp),
    surv2 AS (SELECT b.doc_id, b.lang, b.source
              FROM b2 b JOIN s2 ON b.doc_id = s2.doc_id),
    corpus AS (SELECT * FROM surv1 UNION ALL SELECT * FROM surv2),
    rc AS (SELECT lang, source, count(*) AS n_raw
           FROM (SELECT lang, source FROM b1
                 UNION ALL SELECT lang, source FROM b2)
           GROUP BY 1, 2),
    dc AS (SELECT lang, source, count(*) AS n_dedup
           FROM corpus GROUP BY 1, 2),
    cells AS (SELECT coalesce(rc.lang, dc.lang) AS lang,
                     coalesce(rc.source, dc.source) AS source,
                     coalesce(rc.n_raw, 0)::HUGEINT AS n_raw,
                     coalesce(dc.n_dedup, 0)::HUGEINT AS n_dedup
              FROM rc FULL JOIN dc
                ON rc.lang = dc.lang AND rc.source = dc.source),
    w AS (SELECT *,
                 pow(n_dedup / sum(n_dedup) OVER (), 0.5) AS wr,
                 sum(n_raw) OVER () AS tot_r,
                 sum(n_dedup) OVER () AS tot_d
          FROM cells)
    SELECT lang, source,
           CAST(n_raw AS BIGINT) AS n_raw,
           CAST(n_dedup AS BIGINT) AS n_dedup,
           CAST(round(wr / sum(wr) OVER (), 6) AS DOUBLE) AS mix_weight,
           CAST((1000000 * abs(n_dedup * tot_r - n_raw * tot_d))
                // (tot_d * tot_r) AS BIGINT) AS drift_micro
    FROM w ORDER BY lang, source
    """


@q("q300_dedup_mix_eval_pipeline", _PIPELINE_E2E_SQL)
def q300_dedup_mix_eval_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The blueprint's training-data pipeline run END TO END through
    the engine's own components, oracled as ONE query: two ingest
    batches (the second with planted cross-batch duplicates) dedup
    through the VERSIONED fingerprint store (q133's lifecycle —
    batch 2's plan reads only 16-byte fingerprints, never batch 1's
    text), the surviving corpus is PUBLISHED through the
    atomic-commit versioned table and read BACK from its bytes, and
    the mix/eval stage computes q98's temperature-scaled mixture
    weights (alpha=0.5) plus a per-cell drift profile of the deduped
    mix against the raw ingest mix — exact integer micro units via
    cross-multiplied truncating division (q287's idiom), so the
    whole chain (dedup set algebra -> publish -> share shift) is
    value-hash-checked against DuckDB recomputing it from raw text.
    A fingerprint lost in the store, a survivor dropped at publish,
    or a share drifted by one document all hash-fail. In-line
    lifecycle assertions pin the store at versions [1, 2] and the
    publish at version 1. Scale shape: per-ingest cost is
    |batch| + |fp store|; the mix/drift stage runs on the (lang x
    source) cell table — config-bounded cardinality — so its
    unpartitioned windows are over dozens of rows at any corpus
    size, and the cell products route through decimal(38,0) ahead
    of the BIGINT range."""
    from ingestao_dados_poli_spark.operators import dedup as DD
    from ingestao_dados_poli_spark.sources import versioned as V

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    did = F.col("doc_id")
    b1 = docs.filter(did < 250)
    b2 = docs.filter(did >= 250).unionByName(
        docs.filter(did < 60).select(
            (did + 50000).alias("doc_id"), "text", "lang", "source"
        )
    )
    # fresh mkdtemp dirs (never pid-suffixed fixed paths): pid recycling
    # or a shared /tmp across concurrent drivers could cross-wire the
    # fingerprint store and fail the versions==[1,2] lifecycle assertion
    store = _scratch("q300_fp_")
    pub = _scratch("q300_pub_")
    s1, _ = DD.dedup_ingest_batch(spark, b1, store, "text", "doc_id")
    s2, _ = DD.dedup_ingest_batch(spark, b2, store, "text", "doc_id")
    corpus = s1.unionByName(s2).select("doc_id", "lang", "source")
    pub_version = V.publish(spark, corpus, pub)
    got = V.committed_versions(spark, store)
    if got != [1, 2] or pub_version != 1:
        raise AssertionError(
            f"pipeline lifecycle drifted: store {got}, publish {pub_version}"
        )
    published = V.read_version(spark, pub, pub_version)

    raw_cells = (
        b1.select("lang", "source")
        .unionByName(b2.select("lang", "source"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    ded_cells = published.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_dedup")
    )
    return _mix_drift_profile(raw_cells, ded_cells)


def _mix_drift_profile(
    raw_cells: DataFrame, ded_cells: DataFrame
) -> DataFrame:
    """Shared final stage of the pipeline queries (q300 batch, q301
    streaming twin): full-outer cell join → temperature-scaled mixture
    weights (alpha=0.5, q98's recipe) → per-cell drift of the deduped
    mix vs the raw ingest mix in exact integer micro units
    (cross-multiplied truncating division, q287's idiom). Inputs are
    (lang, source, n_raw) and (lang, source, n_dedup) cell tables —
    config-bounded cardinality, so the unpartitioned windows are over
    dozens of rows at any corpus size."""
    cells = (
        raw_cells.join(ded_cells, ["lang", "source"], "full_outer")
        .select(
            "lang",
            "source",
            F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
            F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
        )
    )
    w_all = Window.partitionBy()
    nd = F.col("n_dedup").cast(_DEC)
    nr = F.col("n_raw").cast(_DEC)
    tot_d = F.sum(nd).over(w_all)
    tot_r = F.sum(nr).over(w_all)
    wr = F.pow(F.col("n_dedup") / F.sum("n_dedup").over(w_all), 0.5)
    scored = cells.select(
        "lang",
        "source",
        F.col("n_raw").cast("long").alias("n_raw"),
        F.col("n_dedup").cast("long").alias("n_dedup"),
        wr.alias("_wr"),
        _truncdiv(
            F.lit(1000000).cast(_DEC) * F.abs(nd * tot_r - nr * tot_d),
            tot_d * tot_r,
        ).alias("drift_micro"),
    )
    return scored.select(
        "lang",
        "source",
        "n_raw",
        "n_dedup",
        F.round(F.col("_wr") / F.sum("_wr").over(w_all), 6).alias(
            "mix_weight"
        ),
        "drift_micro",
    ).orderBy("lang", "source")
