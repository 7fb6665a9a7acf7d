"""Relational registry (SQL-surface slice): lateral/recursive SQL,
incremental join MVs, spatial/skew joins, pagination, SCD2, allocation
and lot-attribution suites (q196+).

Split out of registry/relational.py in round 6 to hold every registry
module under the round-4 2,500-line bound — every block is verbatim.
Registration happens via the shared `q` decorator from `._base`, so
importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403

# --------------------- 134. correlated LATERAL subquery (SQL surface)

_Q196_SQL = """
    SELECT r_name, t.n_name, t.bal_cents
    FROM {region} r, LATERAL (
        SELECT n_name,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal_cents
        FROM {nation} n JOIN {customer} c ON c_nationkey = n_nationkey
        WHERE n_regionkey = r.r_regionkey
        GROUP BY n_name
        ORDER BY bal_cents DESC, n_name LIMIT 2) t
"""


@q(
    "q196_lateral_topk",
    _Q196_SQL.format(region="region", nation="nation", customer="customer"),
)
def q196_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per-region
    top-2 nations by total customer balance, expressed as the SQL-
    standard lateral join (the form analysts port from warehouses)
    rather than the window-rank idiom (q12). The IDENTICAL SQL text
    runs on both engines (q74's parity discipline); Catalyst
    decorrelates the lateral into a join + per-group limit, DuckDB
    runs its own lateral plan — two independent decorrelation paths,
    one value-hash. Balances summed in integer CENTS so the top-2 cut
    never rides a float ulp."""
    _t(spark, sf_dir, "region").createOrReplaceTempView("q196_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q196_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q196_customer")
    return spark.sql(
        _Q196_SQL.format(
            region="q196_region", nation="q196_nation", customer="q196_customer"
        )
    )


# --------------- 139. incremental join-view maintenance (delta rule)

@q(
    "q202_incremental_join_mv",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def q202_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view by the delta rule
    (``relational.incremental_join_delta``): both fact streams are
    split at a cut date into old/delta (late-arriving rows on BOTH
    sides), the view's aggregate state is folded as
    agg(old JOIN old) ++ agg(delta-rule rows) — never re-joining the
    two full snapshots. Because old/delta partition each input
    completely, the four join terms tile the full join exactly, so the
    plain full-join rollup is the oracle: the hash check proves the
    delta rule loses and double-counts NOTHING (the bug class IVM
    implementations actually have). At 100 TB the payoff is the cross
    terms: each streams one DELTA (broadcastable) against one
    snapshot, so a daily refresh costs |delta| x fanout, not
    |snapshot|^2-ish re-joins. Aggregate fold works because sum/count
    are abelian — the same reason the streaming MV (q154) can fold
    micro-batches."""
    cut = "1997-06-01"
    a = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    b = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_shipdate",
    )
    a_old = a.filter(F.col("o_orderdate") < cut)
    a_new = a.filter(F.col("o_orderdate") >= cut)
    b_old = b.filter(F.col("l_shipdate") < cut)
    b_new = b.filter(F.col("l_shipdate") >= cut)

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )

    state_old = _agg(a_old.join(b_old, "o_orderkey"))
    state_delta = _agg(
        R.incremental_join_delta(a_old, a_new, b_old, b_new, "o_orderkey")
    )
    return (
        state_old.unionByName(state_delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


# ----------------- 140. spatial radius join via grid bucketing

@q(
    "q203_grid_radius_join",
    """
    WITH pts AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) % 10000 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#y'),
                                    1, 15)) AS BIGINT) % 10000 AS y
        FROM customer),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a JOIN pts b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS id_checksum,
           CAST(sum(d2) AS BIGINT) AS d2_sum
    FROM pairs
    """,
)
def q203_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join WITHOUT a spatial engine: points (synthetic
    integer coordinates hashed from the key — exact cross-engine) are
    bucketed into radius-sized grid cells; side A explodes into its
    3x3 cell neighborhood, the join is EQUI on the cell key, and the
    exact integer distance check runs as a post-join filter. Every
    true pair matches in exactly ONE (offset, cell) combination —
    cells are radius-sized, so within-radius points differ by at most
    one cell per axis — giving 9x row fan-out on one side in exchange
    for turning an inequality join (quadratic nested loop at 100 TB)
    into a shuffled hash join bounded by cell density. The oracle IS
    the naive quadratic formulation — same result through opposite
    plans, which is the whole point. All-integer arithmetic: the
    radius boundary can't float-flip."""
    radius = 50
    cust = _t(spark, sf_dir, "customer")

    def _h(expr):
        return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")

    key_s = F.col("c_custkey").cast("string")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (_h(key_s) % 10000).alias("x"),
        (_h(F.concat(key_s, F.lit("#y"))) % 10000).alias("y"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.expr(f"xa div {radius}") + F.col("o.dx")).alias("cx"),
        (F.expr(f"ya div {radius}") + F.col("o.dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {radius}").alias("cx"),
        F.expr(f"y div {radius}").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= radius * radius))
        .select("id_a", "id_b", d2.alias("d2"))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_checksum"),
        F.sum("d2").cast("long").alias("d2_sum"),
    )


# ---------- 141. join-cardinality estimation / differential skew join

@q(
    "q207_join_cardinality_estimate",
    """
    WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
    exact AS (SELECT sum(c * c) AS exact_pairs FROM c),
    s AS (SELECT l_partkey FROM lineitem
          WHERE substr(md5(CAST(l_orderkey * 100000 + l_partkey AS VARCHAR)),
                       1, 8) < '1999999a'),
    ch AS (SELECT l_partkey, count(*) AS ch FROM s GROUP BY 1),
    est AS (SELECT sum(100 * ch * ch - 90 * ch) AS est_pairs FROM ch)
    SELECT CAST(exact_pairs AS BIGINT) AS exact_pairs,
           CAST(est_pairs AS BIGINT) AS est_pairs,
           CAST(round(1000.0 * (est_pairs - exact_pairs) / exact_pairs)
                AS BIGINT) AS err_permille
    FROM exact CROSS JOIN est
    """,
)
def q207_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate a self-join's output size BEFORE running it — the
    planner question behind every "will this blow up?" check:
    |A join A on k| = sum_k c(k)^2, estimated from a DETERMINISTIC 10%
    Bernoulli sample (md5-prefix membership on the row key — same
    hash, same rows, in both engines) with the UNBIASED integer
    estimator 100*ch^2 - 90*ch per key (E[ch^2] = f^2 c^2 + f(1-f)c
    under Bernoulli(f=0.1), so the correction term kills the
    small-count bias that naive 1/f^2 scaling inflates). Everything is
    exact integer arithmetic except the final error ratio (one
    division). Scale shape: two map-side-combined aggs on the join
    key — the estimate costs a sample scan, never the join; that
    asymmetry is the entire reason query planners sample."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    exact = c.agg(F.sum(F.col("c") * F.col("c")).alias("exact_pairs"))
    row_key = (F.col("l_orderkey") * 100000 + F.col("l_partkey")).cast("string")
    s = li.filter(F.substring(F.md5(row_key), 1, 8) < "1999999a")
    ch = s.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ch"))
    est = ch.agg(
        F.sum(
            F.lit(100) * F.col("ch") * F.col("ch") - F.lit(90) * F.col("ch")
        ).alias("est_pairs")
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            F.col("exact_pairs").cast("long").alias("exact_pairs"),
            F.col("est_pairs").cast("long").alias("est_pairs"),
            F.round(
                F.lit(1000.0)
                * (F.col("est_pairs") - F.col("exact_pairs"))
                / F.col("exact_pairs")
            )
            .cast("long")
            .alias("err_permille"),
        )
    )


@q(
    "q208_differential_skew_join",
    """
    SELECT s_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1
    """,
)
def q208_differential_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-path skew join through ``relational.differential_skew_join``:
    suppliers whose fact-side frequency exceeds the threshold take a
    broadcast path (their matching dim rows ship to the mappers), the
    cold tail takes the normal shuffle join, and the union feeds one
    rollup. The oracle is the PLAIN single-path join — the hash passes
    only if the routing loses and duplicates nothing, i.e. the two
    legs partition the key space exactly. Threshold is set so both
    paths are non-empty on the testdata (~600 rows/supplier mean);
    complements q60 (salting — for when even the hot slice of the dim
    can't broadcast)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    n_li = li.count()
    n_sup = sup.count()
    # ~mean frequency: routes the above-average half hot, the rest cold
    joined = R.differential_skew_join(li, sup, "s_suppkey", n_li // max(n_sup, 1))
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ------------------ 142. pandas-on-Spark API parity

@q(
    "q210_pandas_api_parity",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY 1
    """,
)
def q210_pandas_api_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas front door: the identical rollup expressed through
    pyspark.pandas (read_parquet → assign → groupby.agg →
    reset_index → to_spark) — the surface a pandas-fluent analyst
    actually types — value-hashed against plain SQL. Everything
    compiles to the SAME Catalyst plans as the DataFrame API (the
    assign/round/astype chain is column expressions, the groupby one
    map-side-combined shuffle), so the parity check proves the
    convenience layer costs no correctness; integer cents keep the
    sums exact. Distributed-index caveats don't bite: no positional
    ops, the group key is the only index used and it's reset before
    handing back a DataFrame."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    psdf = psdf.assign(
        cents=(psdf.o_totalprice * 100).round().astype("int64")
    )
    out = (
        psdf.groupby("o_orderpriority")
        .agg(n_orders=("o_orderkey", "count"), total_cents=("cents", "sum"))
        .reset_index()
    )
    return out.to_spark()


@q(
    "q219_recursive_hierarchy",
    """
    WITH RECURSIVE chain AS (
      SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth,
             CAST(round(s_acctbal * 100) AS BIGINT) AS cents
      FROM supplier WHERE s_suppkey < 10
      UNION ALL
      SELECT s.s_suppkey, c.root, c.depth + 1,
             CAST(round(s.s_acctbal * 100) AS BIGINT)
      FROM supplier s JOIN chain c ON s.s_suppkey // 10 = c.node
      WHERE s.s_suppkey >= 10
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
           CAST(sum(cents) AS BIGINT) AS acctbal_cents
    FROM chain GROUP BY depth ORDER BY depth
    """,
)
def q219_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE) — the
    hierarchy-walk the engine previously expressed as a driver loop
    (q194's bounded_reachability) now runs entirely inside Catalyst:
    suppliers form a decimal-radix forest (parent = suppkey DIV 10,
    suppkeys < 10 are roots), and the recursion carries (root, depth)
    down every chain. Depth is log10(n) — each recursion step is one
    equi-join against the base table, so a 100 TB dimension resolves
    in ~8 rounds with Catalyst free to broadcast the shrinking
    frontier. The oracle is the character-identical recursive CTE in
    DuckDB (// is its integer DIV); per-depth node counts, distinct
    roots, and acctbal cents value-hash across engines."""
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
    )
    import os as _os

    view = f"q219_sup_{_os.getpid()}"
    sup.createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE chain AS (
          SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth, cents
          FROM {view} WHERE s_suppkey < 10
          UNION ALL
          SELECT s.s_suppkey, c.root, c.depth + 1, s.cents
          FROM {view} s JOIN chain c ON s.s_suppkey DIV 10 = c.node
          WHERE s.s_suppkey >= 10
        )
        SELECT CAST(depth AS INT) AS depth,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
               CAST(sum(cents) AS BIGINT) AS acctbal_cents
        FROM chain GROUP BY depth ORDER BY depth
    """)


@q(
    "q220_xml_roundtrip",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(sum(o_orderkey % 97) AS BIGINT) AS id_pmod_sum
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q220_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a first-class semi-structured format (Spark 4 built-in
    to_xml/from_xml — the spark-xml package folded into core): every
    order serializes to an XML doc (attribute `_id` + nested element
    fields), parses back through a typed schema, and rolls up per
    (status, priority). Both directions are JVM expressions inside
    whole-stage codegen — no UDF, no extra pass — so the XML hop adds
    zero shuffles to the plan. The value-hash against the oracle
    (which never sees XML) proves the roundtrip is LOSSLESS for ids
    (pmod fingerprint), enum fields, and integer cents. The same plan
    shape ingests real XML feeds at scale: schema-typed from_xml over
    a text scan, then ordinary relational ops."""
    od = _t(spark, sf_dir, "orders")
    xml = od.select(
        F.to_xml(
            F.struct(
                F.col("o_orderkey").alias("_id"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
                F.col("o_orderpriority").alias("priority"),
            ),
            {"rowTag": "order"},
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            "doc",
            "_id BIGINT, status STRING, cents BIGINT, priority STRING",
            {"rowTag": "order"},
        ).alias("o")
    ).select("o.*")
    return (
        parsed.groupBy(
            F.col("status").alias("o_orderstatus"),
            F.col("priority").alias("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum(F.pmod("_id", F.lit(97))).cast("long").alias("id_pmod_sum"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@q(
    "q226_merge_three_branch",
    """
    WITH b AS (
      SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer
    ), u AS (
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal + 100, 2) AS DOUBLE) AS c_acctbal,
             c_nationkey, 'U' AS op
      FROM b WHERE c_custkey % 7 = 0 AND c_custkey % 10 <> 0
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal, c_nationkey, 'D'
      FROM b WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000,
             'NEW ' || CAST(c_custkey AS VARCHAR),
             CAST(0.0 AS DOUBLE), c_nationkey, 'I'
      FROM b WHERE c_custkey % 13 = 0
    ), merged AS (
      SELECT b.c_custkey, b.c_name, b.c_acctbal, b.c_nationkey
      FROM b LEFT JOIN u ON b.c_custkey = u.c_custkey
      WHERE u.c_custkey IS NULL
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal, c_nationkey
      FROM u WHERE op <> 'D'
    ), cents AS (
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM merged
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(bal_cents) AS BIGINT) AS balance_cents,
           bit_xor(CAST(('0x' || substr(md5(
               CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
               || CAST(bal_cents AS VARCHAR)), 1, 15)) AS BIGINT))
               AS fingerprint
    FROM cents
    """,
)
def q226_merge_three_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full three-branch MERGE INTO (`relational.merge_into`): one
    update batch carries UPDATE rows (repriced balances), DELETE
    sentinels, and INSERT rows for brand-new keys; the merge applies
    WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE /
    WHEN NOT MATCHED THEN INSERT in ONE full-outer shuffle join plus
    in-row branch selection — the table-format-free Delta/Iceberg
    MERGE surface (extends q67's SCD-1 upsert with the delete branch).
    The oracle never sees the operator: it rebuilds the merged table
    relationally, and the bit_xor md5 fingerprint over
    (key, name, cents) value-hashes the exact surviving row set, not
    just its aggregate."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    upd = (
        cust.where((F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 10 != 0))
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
            "c_nationkey",
            F.lit("U").alias("op"),
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 10 == 0).select(
                "c_custkey", "c_name", "c_acctbal", "c_nationkey",
                F.lit("D").alias("op"),
            )
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.concat(
                    F.lit("NEW "), F.col("c_custkey").cast("string")
                ).alias("c_name"),
                F.lit(0.0).alias("c_acctbal"),
                "c_nationkey",
                F.lit("I").alias("op"),
            )
        )
    )
    merged = R.merge_into(
        cust,
        upd,
        ["c_custkey"],
        update_cols=["c_name", "c_acctbal", "c_nationkey"],
        delete_condition=F.col("u.op") == "D",
    )
    cents = merged.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    return cents.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("bal_cents").cast("long").alias("balance_cents"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(concat("
            "cast(c_custkey as string), '|', c_name, '|',"
            " cast(bal_cents as string))), 1, 15), 16, 10) as bigint))"
        ).alias("fingerprint"),
    )


@q(
    "q227_point_in_time_features",
    """
    WITH clk AS (
      SELECT user_id, date_trunc('day', ts) AS day, count(*) AS cnt
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), f_clk AS (
      SELECT user_id, day + INTERVAL 1 DAY AS eff_ts,
             sum(cnt) OVER (PARTITION BY user_id ORDER BY day) AS clicks_cum
      FROM clk
    ), val AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ), f_val AS (
      SELECT user_id, day + INTERVAL 1 DAY AS eff_ts,
             sum(cents) OVER (PARTITION BY user_id ORDER BY day) AS cents_cum
      FROM val
    ), spine AS (
      SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'
    ), pit1 AS (
      SELECT s.event_id, s.ts, s.user_id, f.clicks_cum
      FROM spine s ASOF LEFT JOIN f_clk f
        ON s.user_id = f.user_id AND s.ts >= f.eff_ts
    ), pit AS (
      SELECT p.event_id, p.ts, p.user_id, p.clicks_cum, f.cents_cum
      FROM pit1 p ASOF LEFT JOIN f_val f
        ON p.user_id = f.user_id AND p.ts >= f.eff_ts
    )
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_labels,
           CAST(sum(coalesce(clicks_cum, 0)) AS BIGINT) AS clicks_feature_sum,
           CAST(sum(coalesce(cents_cum, 0)) AS BIGINT) AS cents_feature_sum,
           bit_xor(CAST(('0x' || substr(md5(
               CAST(event_id AS VARCHAR) || '|'
               || CAST(coalesce(clicks_cum, -1) AS VARCHAR) || '|'
               || CAST(coalesce(cents_cum, -1) AS VARCHAR)), 1, 15))
               AS BIGINT)) AS fingerprint
    FROM pit GROUP BY 1 ORDER BY day
    """,
)
def q227_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time enrichment
    (`relational.point_in_time_join`): every 'error' event (the
    training label) is joined to the NEWEST daily feature snapshot
    with effective-ts <= label-ts for TWO feature tables (cumulative
    clicks, cumulative value cents; snapshots become effective at the
    NEXT day's midnight, so same-day activity is invisible — the
    leakage-free construction). Oracled against DuckDB's native ASOF
    LEFT JOIN, chained twice. Plan: each feature join is the
    union+window as-of (slim probe points only), never a
    point-in-interval candidate explosion; the per-event fingerprint
    value-hashes every (label, feature, feature) triple, so one
    leaked same-day click flips the hash."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    clk = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", day.alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("user_id").orderBy("day")
    f_clk = clk.select(
        "user_id",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("eff_ts"),
        F.sum("cnt").over(wcum).alias("clicks_cum"),
    )
    val = ev.groupBy("user_id", day.alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    f_val = val.select(
        "user_id",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("eff_ts"),
        F.sum("cents").over(wcum).alias("cents_cum"),
    )
    spine = ev.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    pit = R.point_in_time_join(
        spine,
        [
            ("clk_", f_clk, "eff_ts", ["clicks_cum"]),
            ("val_", f_val, "eff_ts", ["cents_cum"]),
        ],
        key="user_id",
        spine_ts="ts",
    )
    return (
        pit.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.sum(F.coalesce(F.col("clk_clicks_cum"), F.lit(0)))
            .cast("long")
            .alias("clicks_feature_sum"),
            F.sum(F.coalesce(F.col("val_cents_cum"), F.lit(0)))
            .cast("long")
            .alias("cents_feature_sum"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat("
                "cast(event_id as string), '|',"
                " cast(coalesce(clk_clicks_cum, -1) as string), '|',"
                " cast(coalesce(val_cents_cum, -1) as string)"
                ")), 1, 15), 16, 10) as bigint))"
            ).alias("fingerprint"),
        )
        .orderBy("day")
    )


@q(
    "q234_keyset_pagination",
    """
    WITH ordered AS (
      SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
             o_totalprice
      FROM orders
    )
    SELECT o_orderkey, o_orderdate,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
    FROM ordered ORDER BY o_orderdate, o_orderkey LIMIT 20 OFFSET 40
    """,
)
def q234_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: page 3 of orders under a total
    (o_orderdate, o_orderkey) order, fetched with a TUPLE-GREATER
    predicate from page 2's last key instead of OFFSET — the oracle
    runs the OFFSET formulation, proving both select the identical
    page. Why it matters at 100 TB: OFFSET n scans-and-discards n rows
    on every page (O(pages²) total) and cannot push down; the keyset
    predicate is sargable — it prunes at the parquet scan via min/max
    stats, each page costs one top-k (TakeOrderedAndProject), and
    pagination state is one (date, key) tuple, not a row count. The
    boundary is derived in-query (1-row agg of page <= 2's max key,
    broadcast crossJoin — allowlisted 1-row BNLJ shape)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        "o_totalprice",
    )
    boundary = (
        orders.orderBy("o_orderdate", "o_orderkey")
        .limit(40)
        .agg(
            F.max(F.struct("o_orderdate", "o_orderkey")).alias("b")
        )
        .select(
            F.col("b.o_orderdate").alias("bd"),
            F.col("b.o_orderkey").alias("bk"),
        )
    )
    page = (
        orders.crossJoin(F.broadcast(boundary))
        .where(
            (F.col("o_orderdate") > F.col("bd"))
            | (
                (F.col("o_orderdate") == F.col("bd"))
                & (F.col("o_orderkey") > F.col("bk"))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )
    return page.select(
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@q(
    "q235_parameterized_sql",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q235_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (`spark.sql(query, args=...)`,
    Spark 3.4+): the filter literals arrive as BOUND PARAMETERS, never
    string-interpolated — the injection-safe front door a multi-tenant
    query service needs. Catalyst folds the bound constants before
    optimization, so parameter binding costs nothing: the same pushed
    parquet filters as hand-written literals (the oracle runs the
    literal form)."""
    import os

    ordv = f"q235_orders_{os.getpid()}"
    _t(spark, sf_dir, "orders").createOrReplaceTempView(ordv)
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_price
        FROM {ordv}
        WHERE o_orderstatus = :status AND o_totalprice > :min_price
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"status": "F", "min_price": 50000},
    )



# ----------------------------------- 118. SCD Type 2 dimension build

@q(
    "q243_scd2_history",
    """
    WITH e AS (
        SELECT user_id, event_type, ts, event_id
        FROM events WHERE user_id < 10),
    r AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM e),
    c AS (
        SELECT user_id, event_type, ts, event_id FROM r
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
    v AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS version_no,
               epoch_us(ts) AS from_us,
               epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS to_us
        FROM c)
    SELECT user_id, CAST(version_no AS BIGINT) AS version_no, event_type,
           CAST(from_us AS BIGINT) AS from_us,
           CAST(to_us AS BIGINT) AS to_us,
           CAST(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_current
    FROM v ORDER BY user_id, version_no
    """,
)
def q243_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build
    (relational.scd2_from_changes): each user's event_type stream
    collapses into validity-interval version rows — consecutive
    repeats are NOT new versions, every run of equal values opens one
    half-open [effective_from, effective_to) interval, the open
    interval carries is_current. Type 1 (merge_upsert, q226's MERGE)
    keeps only the latest value; Type 2 is what the point-in-time
    join (q227) consumes on the dimension side.
    Timestamps surface as epoch MICROSECOND integers (the q119
    unix_micros/epoch_us pattern) so interval endpoints hash
    bit-identically cross-engine.
    Scale shape: both window passes share one user_id-partitioned
    sorted exchange; per-task state is one user's stream."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", "event_type", "ts", "event_id")
    )
    hist = R.scd2_from_changes(
        ev, "user_id", "event_type", "ts", order_cols=("event_id",)
    )
    return hist.select(
        "user_id",
        F.col("version_no").cast("long").alias("version_no"),
        "event_type",
        F.unix_micros("effective_from").alias("from_us"),
        F.unix_micros("effective_to").alias("to_us"),
        F.col("is_current").cast("int").alias("is_current"),
    ).orderBy("user_id", "version_no")



# ----------------------------- 119. largest-remainder proration

@q(
    "q244_largest_remainder_alloc",
    """
    WITH li AS (
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem),
    o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders),
    j AS (
        SELECT l_orderkey, l_linenumber, qty, o_orderpriority, total_cents,
               sum(qty) OVER (PARTITION BY l_orderkey) AS wsum
        FROM li JOIN o ON l_orderkey = o_orderkey),
    b AS (
        SELECT *, (total_cents * qty) // wsum AS base,
               (total_cents * qty) % wsum AS rem
        FROM j),
    s AS (
        SELECT *,
               total_cents - sum(base) OVER (PARTITION BY l_orderkey)
                   AS short,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY rem DESC, l_linenumber) AS rk
        FROM b),
    a AS (
        SELECT l_orderkey, l_linenumber, o_orderpriority, total_cents,
               CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM s),
    per_order AS (
        SELECT l_orderkey, any_value(o_orderpriority) AS prio,
               any_value(total_cents) AS total_cents,
               sum(alloc) AS alloc_sum, count(*) AS n_lines,
               bit_xor(('0x' || substr(md5(
                   l_orderkey || ':' || l_linenumber || ':' || alloc),
                   1, 15))::BIGINT) AS fp
        FROM a GROUP BY 1)
    SELECT prio AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lineitems,
           CAST(sum(alloc_sum) AS BIGINT) AS alloc_cents,
           CAST(sum(total_cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN alloc_sum != total_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatch,
           CAST(bit_xor(fp) AS BIGINT) AS alloc_fp
    FROM per_order GROUP BY 1 ORDER BY 1
    """,
)
def q244_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) proration
    (relational.allocate_largest_remainder): every order's total
    (integer cents) is split across its lineitems proportionally to
    quantity, floor + one extra cent to the largest remainders, ties
    pinned by linenumber — sum(alloc) == total EXACTLY per order, in
    pure integer arithmetic. The output proves it cross-engine at two
    granularities: n_mismatch (must be 0) certifies the invariant for
    EVERY order, and the bit_xor fingerprint over
    md5(order:line:alloc) pins every row-level allocation without
    emitting lineitem rows. Scale shape: one shuffle on l_orderkey
    (the lineitem table's natural key — bucketed layouts make it
    free) feeding sum/row_number windows over the same exchange;
    per-task state is one order's lines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("total_cents"),
    )
    j = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).drop("o_orderkey")
    allocd = R.allocate_largest_remainder(
        j, "l_orderkey", "total_cents", "qty", "l_linenumber"
    )
    row_fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("alloc").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    per_order = allocd.groupBy("l_orderkey").agg(
        F.first("o_orderpriority").alias("prio"),
        F.first("total_cents").alias("total_cents"),
        F.sum("alloc").alias("alloc_sum"),
        F.count(F.lit(1)).alias("n_lines"),
        F.bit_xor(row_fp).alias("fp"),
    )
    mismatch = F.when(
        F.col("alloc_sum") != F.col("total_cents"), 1
    ).otherwise(0)
    return (
        per_order.groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lineitems"),
            F.sum("alloc_sum").cast("long").alias("alloc_cents"),
            F.sum("total_cents").cast("long").alias("total_cents"),
            F.sum(mismatch).cast("long").alias("n_mismatch"),
            F.bit_xor("fp").cast("long").alias("alloc_fp"),
        )
        .orderBy("o_orderpriority")
    )



# ----------------------------- 120. FIFO lot attribution

@q(
    "q258_fifo_lot_attribution",
    """
    WITH li AS (SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS qty,
                       l_shipdate, l_orderkey, l_linenumber
                FROM lineitem WHERE l_suppkey < 20),
    c AS (SELECT *, sum(qty) OVER (
              PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
          FROM li),
    r AS (SELECT l_suppkey, qty, hi, hi - qty AS lo FROM c),
    x AS (SELECT l_suppkey, lo, hi, CAST(t.lot AS BIGINT) AS lot
          FROM r, unnest(range(CAST(lo // 100 AS BIGINT),
                         CAST((hi - 1) // 100 + 1 AS BIGINT))) AS t(lot)),
    lq AS (SELECT l_suppkey, lot,
                  sum(least(hi, (lot + 1) * 100)
                      - greatest(lo, lot * 100)) AS lot_qty,
                  count(*) AS n_lines
           FROM x GROUP BY 1, 2),
    per AS (SELECT l_suppkey, count(*) AS n_lots,
                   sum(lot_qty) AS allocated_qty,
                   bit_xor(('0x' || substr(md5(
                       l_suppkey || ':' || lot || ':' || lot_qty),
                       1, 15))::BIGINT) AS lots_fp
            FROM lq GROUP BY 1),
    tot AS (SELECT l_suppkey, sum(qty) AS total_qty FROM li GROUP BY 1)
    SELECT p.l_suppkey, CAST(n_lots AS BIGINT) AS n_lots,
           CAST(total_qty AS BIGINT) AS total_qty,
           CAST(allocated_qty AS BIGINT) AS allocated_qty,
           CAST(CASE WHEN total_qty != allocated_qty THEN 1 ELSE 0 END
                AS BIGINT) AS n_mismatch,
           CAST(lots_fp AS BIGINT) AS lots_fp
    FROM per p JOIN tot USING (l_suppkey) ORDER BY 1
    """,
)
def q258_fifo_lot_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot attribution: each supplier's shipments consume
    sequential fixed-size production lots (100 units), and a shipment
    straddling a lot boundary SPLITS its quantity exactly across the
    lots it overlaps — the FIFO cost-matching shape (buys-to-sells,
    inventory layers) that plain windows can't express but CUMULATIVE
    INTERVALS + a bounded explode can: cum-quantity gives each row a
    [lo, hi) range, the row fans out only to the ceil(qty/lot)+1 lots
    its range touches, and the per-lot overlap length is exact
    integer min/max arithmetic. Conservation is proven per supplier
    (allocated == shipped, n_mismatch 0) and the bit_xor fingerprint
    pins every (lot, qty) cell. Scale shape: one supplier-partitioned
    cumulative window; fan-out bounded by quantity/lot_size,
    independent of corpus size."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 20).select(
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = (
        li.withColumn("hi", F.sum("qty").over(w))
        .withColumn("lo", F.col("hi") - F.col("qty"))
    )
    x = r.select(
        "l_suppkey",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr("lo div 100"), F.expr("(hi - 1) div 100")
            )
        ).alias("lot"),
    )
    lot_qty = F.least(F.col("hi"), (F.col("lot") + 1) * 100) - F.greatest(
        F.col("lo"), F.col("lot") * 100
    )
    lq = x.groupBy("l_suppkey", "lot").agg(
        F.sum(lot_qty).alias("lot_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    cell_fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_suppkey").cast("string"),
                    F.col("lot").cast("string"),
                    F.col("lot_qty").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    per = lq.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lots"),
        F.sum("lot_qty").cast("long").alias("allocated_qty"),
        F.bit_xor(cell_fp).cast("long").alias("lots_fp"),
    )
    tot = li.groupBy("l_suppkey").agg(
        F.sum("qty").cast("long").alias("total_qty")
    )
    return (
        per.join(tot, "l_suppkey")
        .select(
            "l_suppkey",
            "n_lots",
            "total_qty",
            "allocated_qty",
            F.when(F.col("total_qty") != F.col("allocated_qty"), 1)
            .otherwise(0)
            .cast("long")
            .alias("n_mismatch"),
            "lots_fp",
        )
        .orderBy("l_suppkey")
    )
