"""Similarity registry (graph/ER slice): bounded reachability, golden
records, label propagation, clustering, PCA, dup-source matrices and
kNN eval suites (q194+).

Split out of registry/similarity.py in round 6 to hold every registry
module under the round-4 2,500-line bound — every block is verbatim.
Registration happens via the shared `q` decorator from `._base`, so
importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403

# ---------------- 133. bounded transitive closure (iterative BFS)

@q(
    "q194_bounded_reachability",
    """
    WITH RECURSIVE e AS (
        SELECT c_custkey AS s, c_custkey // 2 AS d
        FROM customer WHERE c_custkey >= 2),
    r AS (
        SELECT s AS src, d AS dst, 1 AS depth FROM e
        UNION ALL
        SELECT r.src, e.d, r.depth + 1
        FROM r JOIN e ON r.dst = e.s WHERE r.depth < 4)
    SELECT CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(src) AS BIGINT) AS sum_src,
           CAST(sum(dst) AS BIGINT) AS sum_dst
    FROM r GROUP BY 1
    """,
)
def q194_bounded_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded transitive closure (4-hop ancestry rollup) over a
    derived referral tree — parent(k) = k div 2 over customer keys, the
    org-chart/BOM-explosion query shape — via ``graph.
    bounded_reachability``'s iterative frontier BFS (join + anti-join +
    dropDuplicates per round, localCheckpoint lineage cuts, empty-
    frontier early exit). The oracle is DuckDB's recursive CTE: on this
    out-degree-≤1 function graph every (src, ancestor) pair has exactly
    ONE path, so path enumeration (CTE) and min-depth BFS (engine)
    provably coincide — giving an ITERATIVE distributed algorithm a
    full value-hash check. Per-depth counts plus integer key-sum
    checksums make the comparison exact with no float anywhere."""
    customer = _t(spark, sf_dir, "customer")
    edges = customer.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("src"),
        F.expr("c_custkey div 2").alias("dst"),
    )
    reach = G.bounded_reachability(edges, max_depth=4)
    return reach.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("src").cast("long").alias("sum_src"),
        F.sum("dst").cast("long").alias("sum_dst"),
    )


# -------------------- 137. golden-record survivorship (ER end-to-end)

@q(
    "q200_golden_record",
    """
    WITH RECURSIVE
    edges AS (
        SELECT a.p_partkey AS src, b.p_partkey AS dst
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
         AND abs(length(a.p_name) - length(b.p_name)) <= 12
        WHERE levenshtein(a.p_name, b.p_name) <= 12
    ),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    cc(node, label) AS (
        SELECT p_partkey AS node, p_partkey AS label FROM part
        UNION
        SELECT s.dst AS node, cc.label
        FROM cc JOIN sym s ON cc.node = s.src
    ),
    comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
    members AS (
        SELECT comp.component, p.p_partkey, p.p_name,
               CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
        FROM comp JOIN part p ON comp.node = p.p_partkey),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY component
                   ORDER BY price_cents DESC, p_partkey ASC) AS rn
        FROM members),
    rolled AS (
        SELECT component,
               count(*) AS n_members,
               sum(price_cents) AS total_price_cents
        FROM members GROUP BY component)
    SELECT r.component,
           k.p_partkey AS canonical_partkey,
           k.p_name AS canonical_name,
           CAST(r.n_members AS BIGINT) AS n_members,
           CAST(r.total_price_cents AS BIGINT) AS total_price_cents
    FROM rolled r JOIN ranked k ON r.component = k.component AND k.rn = 1
    WHERE r.n_members >= 3
    """,
)
def q200_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END — the full golden-record pipeline a
    master-data/dedup system runs, composed from the engine's own
    operators: (1) blocked fuzzy matching (``fuzzy.fuzzy_pairs``,
    length-banded levenshtein within (brand, size) blocks — q65's edge
    set), (2) transitive closure into entity clusters
    (``graph.connected_components``), (3) SURVIVORSHIP: one canonical
    record per cluster by highest retail price (part id tiebreak) via
    a per-component window rank, plus merged rollup attributes
    (member count, total price in integer cents). Clusters under 3
    members filtered out to keep the report to real multi-record
    entities. Scale shape: pairs are block-bounded, the closure is
    q65's flooding (diameter-2 dedup graphs), and survivorship is one
    window over components — no step materializes a cross product.
    Oracle: recursive-CTE closure + the same window, value-hashed."""
    part = _t(spark, sf_dir, "part")
    edges = FZ.fuzzy_pairs(
        part.withColumn(
            "_blk", F.concat_ws("|", "p_brand", F.col("p_size").cast("string"))
        ),
        key_col="p_partkey",
        text_col="p_name",
        block_col="_blk",
        max_dist=12,
    )
    comps = G.connected_components(
        edges,
        src="key_a",
        dst="key_b",
        nodes=part.select(F.col("p_partkey").alias("node")),
    )
    members = comps.join(
        part, comps["node"] == part["p_partkey"]
    ).select(
        "component",
        "p_partkey",
        "p_name",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    # ONE aggregation computes survivorship AND the rollup (r08): the
    # canonical record is argmin by (price DESC, partkey ASC), i.e.
    # min(struct(-price_cents, p_partkey, p_name)) — struct ordering is
    # field-by-field and p_partkey is unique, so the name field never
    # decides and the pick is exactly the old row_number()==1 window
    # row. Replaces: the per-component sort window, a second shuffle
    # subtree over members, and the rolled⋈canonical join-back — the
    # members join is now computed once and feeds one hash agg.
    golden = members.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("price_cents").cast("long").alias("total_price_cents"),
        F.min(
            F.struct(
                (-F.col("price_cents")).alias("_np"),
                F.col("p_partkey").alias("_k"),
                F.col("p_name").alias("_n"),
            )
        ).alias("_c"),
    )
    return golden.filter(F.col("n_members") >= 3).select(
        "component",
        F.col("_c._k").alias("canonical_partkey"),
        F.col("_c._n").alias("canonical_name"),
        "n_members",
        "total_price_cents",
    )


# ------------- 141. minhash dedup END-TO-END (pairs -> CC -> survivors)

@q(
    "q204_minhash_dedup_e2e",
    """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         u AS (SELECT doc_id, text FROM base
               UNION ALL
               SELECT doc_id + 100000 AS doc_id, text FROM base
               WHERE doc_id < 100),
         g AS (SELECT doc_id,
                      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                          AS key
               FROM u),
         k AS (SELECT key, min(doc_id) AS canon, count(*) AS sz,
                      sum(doc_id) AS id_sum
               FROM g GROUP BY key)
    SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_survivors,
           CAST(sum(sz) - count(*) AS BIGINT) AS n_removed,
           CAST(sum(id_sum) - sum(canon) AS BIGINT) AS removed_id_checksum
    FROM k
    """,
)
def q204_minhash_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup END-TO-END through the production composition:
    MinHash banded candidates (q27's full kernel) → identical-
    fingerprint filter (the provable subset — recall 1.0 by
    pigeonhole) → connected components → lowest-id survivor per
    cluster → corpus survival report. What q27 proves for the PAIR
    stage this proves for the whole pipeline: a wiring bug in the
    closure (lost singleton, merged clusters) or in survivorship
    (wrong canonical) moves n_survivors or the removed-id checksum and
    fails the hash. The oracle collapses to exact-dup groups because
    the provable-subset filter keeps exactly the identical-text edges;
    the ENGINE still runs the full probabilistic machinery to find
    them. Components uses flooding (dedup graphs are diameter-≤2
    cliques here); singletons come from the explicit node set."""
    from ingestao_dados_poli_spark.functions.text import fingerprint

    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select(
        "doc_id", "text"
    )
    copies = base.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    u = base.unionByName(copies)
    fp = u.select(F.col("doc_id"), fingerprint("text").alias("_fp"))
    pairs = DD.minhash_candidate_pairs(
        u, "text", "doc_id", num_hashes=32, num_bands=8, k=5
    )
    edges = (
        pairs.join(
            fp.select(F.col("doc_id").alias("id_a"), F.col("_fp").alias("_fa")),
            "id_a",
        )
        .join(
            fp.select(F.col("doc_id").alias("id_b"), F.col("_fp").alias("_fb")),
            "id_b",
        )
        .filter(F.col("_fa") == F.col("_fb"))
        .select("id_a", "id_b")
    )
    comps = G.connected_components(
        edges,
        src="id_a",
        dst="id_b",
        nodes=u.select(F.col("doc_id").alias("node")),
    )
    # component label IS the min member id — the survivor
    return comps.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("node") == F.col("component")).cast("long"))
        .cast("long")
        .alias("n_survivors"),
        F.sum((F.col("node") != F.col("component")).cast("long"))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when(F.col("node") != F.col("component"), F.col("node")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("removed_id_checksum"),
    )


# --------------- 143. label-propagation communities (sync, oracled)

@q(
    "q211_label_propagation",
    """
    WITH edges AS (
        SELECT a.p_partkey AS src, b.p_partkey AS dst
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
         AND abs(length(a.p_name) - length(b.p_name)) <= 12
        WHERE levenshtein(a.p_name, b.p_name) <= 12),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    l0 AS (SELECT p_partkey AS node, p_partkey AS label FROM part),
    r1c AS (SELECT s.src AS node, l.label, count(*) AS c
            FROM sym s JOIN l0 l ON s.dst = l.node GROUP BY 1, 2),
    r1 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY c DESC, label ASC) rn
             FROM r1c) WHERE rn = 1),
    l1 AS (SELECT l0.node, coalesce(r1.label, l0.label) AS label
           FROM l0 LEFT JOIN r1 ON l0.node = r1.node),
    r2c AS (SELECT s.src AS node, l.label, count(*) AS c
            FROM sym s JOIN l1 l ON s.dst = l.node GROUP BY 1, 2),
    r2 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY c DESC, label ASC) rn
             FROM r2c) WHERE rn = 1),
    l2 AS (SELECT l1.node, coalesce(r2.label, l1.label) AS label
           FROM l1 LEFT JOIN r2 ON l1.node = r2.node)
    SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_communities,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(label) AS BIGINT) AS label_checksum
    FROM l2
    """,
)
def q211_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection one notch finer than connected components:
    2 rounds of SYNCHRONOUS label propagation (most-frequent neighbor
    label, ties to the smallest) over q65's fuzzy-match graph — the
    variant of LPA that is a pure function of the graph, so an
    ITERATIVE community algorithm gets a full value-hash: the oracle
    unrolls the same two rounds as chained CTEs (q131's discipline).
    Classic randomized LPA could never be oracled — determinism here
    is an algorithm choice, not a test convenience. Engine side is
    ``graph.label_propagation``: per round one edge-label join, one
    map-side-combined (node,label) count, one per-node window, one
    carry-join for isolated nodes."""
    part = _t(spark, sf_dir, "part")
    edges = FZ.fuzzy_pairs(
        part.withColumn(
            "_blk", F.concat_ws("|", "p_brand", F.col("p_size").cast("string"))
        ),
        key_col="p_partkey",
        text_col="p_name",
        block_col="_blk",
        max_dist=12,
    )
    labels = G.label_propagation(
        edges,
        src="key_a",
        dst="key_b",
        nodes=part.select(F.col("p_partkey").alias("node")),
        rounds=2,
    )
    return labels.agg(
        F.countDistinct("label").cast("long").alias("n_communities"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("label").cast("long").alias("label_checksum"),
    )


@q(
    "q223_kmeans_lloyd",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 1000)
                                      AS BIGINT)) AS qv
      FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 4
    ), a1 AS (
      SELECT vec_id, qv, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM (
        SELECT q.vec_id, q.qv, c.cid,
               list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                   AS dist
        FROM q CROSS JOIN c0 c)
    ), c1e AS (
      SELECT cid, unnest(generate_series(1, len(qv))) AS d, qv
      FROM a1 WHERE rn = 1
    ), c1 AS (
      SELECT cid, list(v ORDER BY d) AS cv FROM (
        SELECT cid, d, sum(qv[d]) // count(*) AS v
        FROM c1e GROUP BY cid, d) GROUP BY cid
    ), a2 AS (
      SELECT vec_id, qv, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM (
        SELECT q.vec_id, q.qv, c.cid,
               list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                   AS dist
        FROM q CROSS JOIN c1 c)
    ), c2e AS (
      SELECT cid, unnest(generate_series(1, len(qv))) AS d, qv
      FROM a2 WHERE rn = 1
    ), c2 AS (
      SELECT cid, list(v ORDER BY d) AS cv FROM (
        SELECT cid, d, sum(qv[d]) // count(*) AS v
        FROM c2e GROUP BY cid, d) GROUP BY cid
    ), fin AS (
      SELECT vec_id, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn,
             cid
      FROM (
        SELECT q.vec_id, q.qv, c.cid,
               list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                   AS dist
        FROM q CROSS JOIN c2 c)
    )
    SELECT CAST(cid AS INT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(dist) AS BIGINT) AS inertia
    FROM fin WHERE rn = 1 GROUP BY cid ORDER BY cluster
    """,
)
def q223_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (`similarity.lloyd_quantized`, k=4, two
    Lloyd rounds) — iterative ML clustering value-hashed against an
    unrolled recursive-free SQL oracle, possible ONLY because every
    distance and centroid mean is exact bigint arithmetic on the
    integer-quantized grid (floor((x+1)*1000); truncating div ==
    floor on the non-negative lattice; argmin ties break on centroid
    id). Per round: k-row broadcast of centroids, in-row zip_with
    distance fold, row_number argmin, one map-side-combined
    (cluster, dim) agg for the update — no driver collect, no shuffle
    wider than k rows per vector, which is the 1000-executor plan
    shape for topic-balancing a 100 TB corpus. Output: cluster sizes
    + exact integer inertia."""
    emb = _t(spark, sf_dir, "embeddings")
    final = SIM.lloyd_quantized(
        emb, k=4, id_col="vec_id", vec_col="embedding", iters=2
    )
    return (
        final.groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("dist").cast("long").alias("inertia"),
        )
        .orderBy("cluster")
    )


@q(
    "q228_negative_sampling",
    """
    WITH pool AS (
      SELECT label AS pl, vec_id AS pid,
             row_number() OVER (
                 PARTITION BY label
                 ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                1, 15)) AS BIGINT), vec_id) AS rn
      FROM embeddings
    ), p AS (
      SELECT pl, pid FROM pool WHERE rn <= 8
    ), cand AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label, p.pid, p.pl,
             CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) || '|'
                 || CAST(p.pid AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM embeddings a JOIN p ON p.pl <> a.label
    ), ranked AS (
      SELECT *, row_number() OVER (
                 PARTITION BY anchor_id ORDER BY h, pid, pl) AS slot
      FROM cand
    )
    SELECT CAST(anchor_label AS INT) AS anchor_label,
           CAST(pl AS INT) AS neg_label,
           CAST(count(*) AS BIGINT) AS n_pairs,
           bit_xor(CAST(('0x' || substr(md5(
               CAST(anchor_id AS VARCHAR) || '|' || CAST(slot AS VARCHAR)
               || '|' || CAST(pid AS VARCHAR)), 1, 15)) AS BIGINT))
               AS fingerprint
    FROM ranked WHERE slot <= 3
    GROUP BY anchor_label, pl ORDER BY anchor_label, neg_label
    """,
)
def q228_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified negative sampling for contrastive
    training (`similarity.negative_samples`): each embedding draws 3
    negatives from an 8-per-class md5-ranked pool, never from its own
    class, reproducible bit-for-bit (no RNG state to shard). Spark
    filters/ranks the broadcast ONE-ROW pool array entirely in-row
    (allowlisted 1-row BNLJ shape; anchors never shuffle) while the
    oracle proves the identical draw RELATIONALLY — two different
    formulations, one value-hash. Per (anchor-class, negative-class)
    cell: pair count + md5 fingerprint of every (anchor, slot,
    negative) triple."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = SIM.negative_samples(emb, k=3, per_label=8)
    return (
        pairs.groupBy(
            F.col("anchor_label").cast("int").alias("anchor_label"),
            F.col("neg_label").cast("int").alias("neg_label"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat("
                "cast(anchor_id as string), '|', cast(slot as string),"
                " '|', cast(neg_id as string))), 1, 15), 16, 10) as bigint))"
            ).alias("fingerprint"),
        )
        .orderBy("anchor_label", "neg_label")
    )


@q(
    "q229_srp_reduction_recall",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 1000)
                           AS BIGINT)) AS qv
      FROM embeddings
    ), mat AS (
      SELECT j, list_transform(generate_series(1, 64),
                 i -> CASE WHEN CAST(('0x' || substr(md5(
                          CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                          1, 15)) AS BIGINT) % 2 = 0
                      THEN 1 ELSE -1 END) AS srow
      FROM generate_series(1, 16) t(j)
    ), red AS (
      SELECT vec_id, list(s ORDER BY j) AS rv FROM (
        SELECT q.vec_id, m.j,
               list_sum(list_transform(generate_series(1, 64),
                   i -> m.srow[i] * q.qv[i])) AS s
        FROM q CROSS JOIN mat m) GROUP BY vec_id
    ), qq AS (SELECT qv FROM q WHERE vec_id = 0),
    qr AS (SELECT rv FROM red WHERE vec_id = 0),
    ex AS (
      SELECT q.vec_id,
             list_sum(list_transform(generate_series(1, 64),
                 i -> (q.qv[i] - qq.qv[i]) * (q.qv[i] - qq.qv[i]))) AS dist
      FROM q, qq WHERE q.vec_id <> 0 ORDER BY dist, q.vec_id LIMIT 10
    ), rd AS (
      SELECT red.vec_id,
             list_sum(list_transform(generate_series(1, 16),
                 i -> (red.rv[i] - qr.rv[i]) * (red.rv[i] - qr.rv[i])))
                 AS dist
      FROM red, qr WHERE red.vec_id <> 0 ORDER BY dist, red.vec_id LIMIT 10
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ex JOIN rd USING (vec_id))
               AS recall_at_10,
           (SELECT CAST(sum(dist) AS BIGINT) FROM ex) AS exact_dist_sum,
           (SELECT CAST(sum(dist) AS BIGINT) FROM rd) AS reduced_dist_sum,
           (SELECT bit_xor(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                1, 15)) AS BIGINT)) FROM ex) AS exact_ids_fp,
           (SELECT bit_xor(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                1, 15)) AS BIGINT)) FROM rd) AS reduced_ids_fp
    """,
)
def q229_srp_reduction_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection dimensionality reduction
    (`similarity.srp_reduce`, 64 -> 16 dims) with a measured
    recall@10: exact integer-L2 top-10 for one query vs top-10 in the
    reduced space, plus id-set fingerprints — the cheap first pass of
    a two-stage ANN, value-hashed END-TO-END because the +-1 matrix is
    md5-derived (both engines re-derive the identical matrix) and all
    arithmetic is bigint on the quantized grid. Spark's matrix is a
    plan literal (reduction at scan speed, no shuffle); the 1-row
    query/top-10 agg crossJoins are the allowlisted BNLJ shape."""
    emb = _t(spark, sf_dir, "embeddings")
    qt = emb.select(
        "vec_id", SIM.quantize_embedding("embedding", 1000).alias("qv")
    )
    red = SIM.srp_reduce(emb, out_dims=16, in_dim=64)
    qq = qt.where(F.col("vec_id") == 0).select(F.col("qv").alias("qqv"))
    qr = red.where(F.col("vec_id") == 0).select(F.col("rv").alias("qrv"))
    dist64 = (
        "aggregate(zip_with(qv, qqv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    dist16 = (
        "aggregate(zip_with(rv, qrv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    fp = (
        "bit_xor(cast(conv(substring(md5(cast(vec_id as string)),"
        " 1, 15), 16, 10) as bigint))"
    )
    ex = (
        qt.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .withColumn("dist", F.expr(dist64))
        .orderBy("dist", "vec_id")
        .limit(10)
        .agg(
            F.sort_array(F.collect_list("vec_id")).alias("ex_ids"),
            F.sum("dist").cast("long").alias("exact_dist_sum"),
            F.expr(fp).alias("exact_ids_fp"),
        )
    )
    rd = (
        red.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qr))
        .withColumn("dist", F.expr(dist16))
        .orderBy("dist", "vec_id")
        .limit(10)
        .agg(
            F.sort_array(F.collect_list("vec_id")).alias("rd_ids"),
            F.sum("dist").cast("long").alias("reduced_dist_sum"),
            F.expr(fp).alias("reduced_ids_fp"),
        )
    )
    return ex.crossJoin(F.broadcast(rd)).select(
        F.size(F.array_intersect("ex_ids", "rd_ids"))
        .cast("long")
        .alias("recall_at_10"),
        "exact_dist_sum",
        "reduced_dist_sum",
        "exact_ids_fp",
        "reduced_ids_fp",
    )



# --------------------- 136. prefix-filtered exact set-similarity join

@q(
    "q241_prefix_filter_join",
    """
    WITH u AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
    """
    + _SHINGLE5_SQL
    + """,
    ex AS (SELECT doc_id, len(ss) AS n, unnest(ss) AS tk FROM sh),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     any_value(a.n) AS na, any_value(b.n) AS nb,
                     count(*) AS i
              FROM ex a JOIN ex b ON a.tk = b.tk AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST((1000 * i) // (na + nb - i) AS BIGINT) AS jac_permille
    FROM inter
    WHERE (1000 * i) // (na + nb - i) >= 500
    ORDER BY id_a, id_b
    """,
)
def q241_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard join via PREFIX FILTERING
    (dedup.prefix_filtered_jaccard, PPJoin family): docs pair only if
    they share a shingle among their RAREST ``m - ceil(t*m) + 1``
    shingles (global-frequency order), then survivors length-filter
    and verify exactly in-row. The inverted-index join (q29) pairs
    docs on ANY shared shingle — boilerplate shingles dominate its
    pair blow-up; the prefix variant never emits a candidate from
    shingles outside the prefix (a ~(1-t) posting fraction) while
    remaining provably lossless. The oracle is the BRUTE-FORCE
    all-shared-shingles join, so the value hash certifies ZERO recall
    loss from the filtering — the property that makes the technique
    safe to ship at 100 TB. Shingle sets (functions.text.shingles,
    word 5-grams) rather than word sets because this corpus's 31-word
    vocabulary makes word SETS degenerate (every doc ~75% similar to
    every other); sequences discriminate. Integer permille similarity
    ((1000*i) div (union)) keeps the threshold decision bit-identical
    cross-engine."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = DD.prefix_filtered_jaccard(
        docs, "text", "doc_id", 0.5, tokens=TX.shingles("text", 5)
    )
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.col("jac_permille")
    ).orderBy("id_a", "id_b")



# --------------------- 137. source-centroid embedding drift

@q(
    "q252_source_centroid_drift",
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                          AS q
               FROM embeddings),
    j AS (SELECT d.source, e.q
          FROM e JOIN documents d ON e.vec_id = d.doc_id),
    u AS (SELECT source, i, CAST(sum(q[i]) AS BIGINT) AS s
          FROM j, unnest(range(1, 65)) AS t(i) GROUP BY 1, 2),
    c AS (SELECT source, list(s ORDER BY i) AS sv FROM u GROUP BY 1),
    p AS (SELECT a.source AS source_a, b.source AS source_b,
                 list_inner_product(a.sv, b.sv) AS ab,
                 list_inner_product(a.sv, a.sv) AS aa,
                 list_inner_product(b.sv, b.sv) AS bb
          FROM c a JOIN c b ON a.source < b.source)
    SELECT source_a, source_b,
           CAST(round(ab / (sqrt(aa) * sqrt(bb)), 6) AS DOUBLE) AS cos_sim
    FROM p ORDER BY source_a, source_b
    """,
)
def q252_source_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift between sources: the full pairwise cosine
    matrix of per-source centroid DIRECTIONS — the monitoring query
    that catches a crawl source shifting semantically between dumps
    (its centroid rotates away from the fleet). Components quantize
    to integers (q142's floor half-up), per-source vectors SUM
    exactly (the 1/n of the mean cancels in the cosine, so no
    division ever happens on the distributed path), and only the
    20-source centroid table self-joins — 190 pairs, broadcast. The
    sums/inner products are exact integers below 2^53, so both
    engines' doubles agree bit-for-bit before the one final rounded
    division. Scale shape: one (source, dim)-keyed map-side-combined
    groupBy over the posexploded vectors; everything after operates
    on |sources| x 64 cells."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    j = emb.join(docs, emb.vec_id == docs.doc_id)
    cells = (
        j.select("source", F.posexplode("q").alias("i", "x"))
        .groupBy("source", "i")
        .agg(F.sum("x").alias("s"))
    )
    cent = cells.groupBy("source").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("s")))
            ),
            lambda st: st.getField("s"),
        ).alias("sv")
    )
    def ip(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    a = cent.select(
        F.col("source").alias("source_a"), F.col("sv").alias("sva")
    )
    b = cent.select(
        F.col("source").alias("source_b"), F.col("sv").alias("svb")
    )
    pairs = a.join(
        F.broadcast(b), F.col("source_a") < F.col("source_b")
    )
    ab = ip(F.col("sva"), F.col("svb")).cast("double")
    aa = ip(F.col("sva"), F.col("sva")).cast("double")
    bb = ip(F.col("svb"), F.col("svb")).cast("double")
    return pairs.select(
        "source_a",
        "source_b",
        F.round(ab / (F.sqrt(aa) * F.sqrt(bb)), 6).alias("cos_sim"),
    ).orderBy("source_a", "source_b")



# --------------------- 138. distributed exact Gram matrix

@q(
    "q254_gram_matrix",
    """
    WITH e AS (SELECT list_transform(embedding::DOUBLE[],
                   x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS q
               FROM embeddings),
    pr AS (SELECT a.i AS i, b.j AS j
           FROM (SELECT unnest(range(1, 65)) AS i) a,
                (SELECT unnest(range(1, 65)) AS j) b
           WHERE b.j >= a.i),
    g AS (SELECT p.i, p.j,
                 CAST(sum(e.q[p.i] * e.q[p.j]) AS BIGINT) AS gram
          FROM e, pr p GROUP BY 1, 2)
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, gram
    FROM g ORDER BY i, j
    """,
)
def q254_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 64x64 Gram matrix X^T X of the embedding corpus
    (similarity.gram_matrix_int) — the covariance-structure primitive
    under PCA/whitening/low-rank drift probes. Each Arrow batch
    contributes a partial Gram via ONE vectorized int64 matmul
    (numpy — the d² per-row work never runs in Python loops), and
    partials reduce with a map-side-combined groupBy on the cell key:
    the shuffle carries d(d+1)/2 cells per task, NOT the vectors.
    Integer quantization (q142's floor half-up) makes every partial
    exact, so reduction order cannot change a bit — the property that
    lets the DuckDB twin (a brute-force 1M-row expansion) hash-match
    a mapInPandas pipeline. At 100 TB this is the only sane Gram
    shape: O(d²) state per task, one tiny reduce."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    g = SIM.gram_matrix_int(emb, "embedding", 1_000_000)
    return g.orderBy("i", "j")



# -------------------- 139. bounded weighted shortest path (min-plus)

@q(
    "q259_weighted_shortest_path",
    """
    WITH n AS (SELECT c_custkey AS k FROM customer WHERE c_custkey <= 200),
    e AS (
        SELECT k AS s, ((k + 7) % 200) + 1 AS d, k % 13 + 1 AS w FROM n
        UNION ALL
        SELECT k, ((k + 31) % 200) + 1, k % 17 + 3 FROM n),
    e2 AS (SELECT a.s, b.d, min(a.w + b.w) AS w
           FROM e a JOIN e b ON a.d = b.s GROUP BY 1, 2),
    e3 AS (SELECT a.s, b.d, min(a.w + b.w) AS w
           FROM e2 a JOIN e b ON a.d = b.s GROUP BY 1, 2),
    allp AS (SELECT s, d, w FROM e UNION ALL
             SELECT s, d, w FROM e2 UNION ALL
             SELECT s, d, w FROM e3),
    m AS (SELECT s, d, min(w) AS dist FROM allp GROUP BY 1, 2)
    SELECT CAST(s % 10 AS BIGINT) AS src_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           CAST(min(dist) AS BIGINT) AS min_dist,
           CAST(max(dist) AS BIGINT) AS max_dist
    FROM m GROUP BY 1 ORDER BY 1
    """,
)
def q259_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths (graph.
    bounded_shortest_path): cheapest <=3-hop route cost between all
    reachable pairs of a deterministic 200-node multigraph (two
    congruence edge rules per node, integer weights) — min-plus
    Bellman-Ford prefix, where each round keeps ONE row per (src,
    dst) (semiring state), never enumerating paths. The oracle
    expands hop-1/2/3 paths explicitly and min-aggregates — on a
    3-hop bound the two provably coincide, giving the ITERATIVE
    relaxation a full value-hash check with pure integer weights.
    Scale shape: per round one equi-join + one map-side-combined min
    groupBy, lineage cut per round; dense graphs cannot blow up
    path-exponentially because the state is pairs, not paths."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    k = F.col("c_custkey")
    ea = cust.select(
        k.alias("src"),
        ((k + 7) % 200 + 1).alias("dst"),
        (k % 13 + 1).alias("w"),
    )
    eb = cust.select(
        k.alias("src"),
        ((k + 31) % 200 + 1).alias("dst"),
        (k % 17 + 3).alias("w"),
    )
    best = G.bounded_shortest_path(
        ea.unionByName(eb), max_hops=3
    )
    return (
        best.groupBy((F.col("src") % 10).cast("long").alias("src_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.min("dist").cast("long").alias("min_dist"),
            F.max("dist").cast("long").alias("max_dist"),
        )
        .orderBy("src_bucket")
    )



# -------------------- 140. sorted-neighborhood ER blocking

@q(
    "q260_sorted_neighborhood",
    """
    WITH p AS (SELECT p_partkey, p_name,
                      string_split(p_name, ' ')[1] AS block
               FROM part),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY block ORDER BY p_name, p_partkey) AS rk
          FROM p),
    cand AS (
        SELECT a.block, a.p_name AS name_a, b.p_name AS name_b
        FROM r a JOIN r b
          ON a.block = b.block AND b.rk = a.rk + 1
        UNION ALL
        SELECT a.block, a.p_name, b.p_name
        FROM r a JOIN r b
          ON a.block = b.block AND b.rk = a.rk + 2),
    sc AS (SELECT block,
                  CASE WHEN levenshtein(name_a, name_b) <= 12
                       THEN 1 ELSE 0 END AS m
           FROM cand)
    SELECT block, CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(m) AS BIGINT) AS n_matches
    FROM sc GROUP BY 1 ORDER BY 1
    """,
)
def q260_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernandez &
    Stolfo 1995): within each block (first name word), sort records
    and compare each to its next w=2 neighbors ONLY — candidate count
    is exactly w*n instead of the quadratic all-pairs, the classic
    alternative to LSH blocking (q27) and attribute blocking (q55).
    The rank-offset neighbor join is expressed as w EQUI-joins on
    (block, rank+offset) — no inequality join, no window array state
    — then thresholded Levenshtein verifies. Scale shape: one window
    per block for ranks (bounded by block size), co-partitioned
    equi-joins, |blocks| output rows. A production run would sweep
    multiple sort keys (multi-pass SNM); one pass keeps the oracle
    1:1."""
    parts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.get(F.split(F.col("p_name"), " "), 0).alias("block"),
    )
    w = Window.partitionBy("block").orderBy("p_name", "p_partkey")
    r = parts.withColumn("rk", F.row_number().over(w))
    cands = None
    for off in (1, 2):
        a = r.select(
            "block", F.col("p_name").alias("name_a"), F.col("rk").alias("ra")
        )
        b = r.select(
            "block",
            F.col("p_name").alias("name_b"),
            (F.col("rk") - off).alias("ra"),
        )
        c = a.join(b, ["block", "ra"]).select("block", "name_a", "name_b")
        cands = c if cands is None else cands.unionByName(c)
    m = F.when(
        F.levenshtein("name_a", "name_b") <= 12, 1
    ).otherwise(0)
    return (
        cands.groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(m).cast("long").alias("n_matches"),
        )
        .orderBy("block")
    )



# -------------------- 141. grid-density clustering (DBSCAN-lite)

@q(
    "q266_grid_density_clusters",
    """
    WITH RECURSIVE
    e AS (SELECT list_transform(embedding::DOUBLE[],
              x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS q
          FROM embeddings),
    p AS (SELECT
              list_sum(list_transform(range(1, 65),
                  j -> q[j] * (((j * 17) % 7) - 3))) // 3000000 AS gx,
              list_sum(list_transform(range(1, 65),
                  j -> q[j] * (((j * 29) % 11) - 5))) // 3000000 AS gy
          FROM e),
    cells AS (SELECT gx, gy, count(*) AS n FROM p GROUP BY 1, 2),
    dense AS (SELECT (gx + 100) * 1000 + (gy + 100) AS cid, gx, gy, n
              FROM cells WHERE n >= 15),
    sym AS (
        SELECT a.cid AS src, b.cid AS dst
        FROM dense a JOIN dense b
          ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
         AND a.cid <> b.cid),
    cc(node, label) AS (
        SELECT cid AS node, cid AS label FROM dense
        UNION
        SELECT s.dst AS node, cc.label
        FROM cc JOIN sym s ON cc.node = s.src
    ),
    comp AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
    clusters AS (
        SELECT CAST(comp.cluster AS BIGINT) AS cluster,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(dense.n) AS BIGINT) AS n_points
        FROM comp JOIN dense ON comp.node = dense.cid
        GROUP BY 1),
    noise AS (
        SELECT CAST(-1 AS BIGINT) AS cluster,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(coalesce(sum(n), 0) AS BIGINT) AS n_points
        FROM cells WHERE n < 15)
    SELECT * FROM clusters UNION ALL SELECT * FROM noise ORDER BY cluster
    """,
)
def q266_grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (DBSCAN-lite): embeddings project onto
    two DETERMINISTIC integer hyperplanes (literal congruence
    coefficients — no RNG, identical in any engine), land in integer
    grid cells, cells with >= 15 points are "core", and touching core
    cells (8-neighborhood) merge into clusters via connected
    components — the density-based alternative to centroid k-means
    (q223) that finds arbitrary-shaped blobs and leaves sparse noise
    unclustered. Everything before the CC runs on exact integers
    (quantized components, integer dot products, truncating grid
    division — identical in both engines); the CC reuses
    graph.connected_components against the oracle's recursive-CTE
    closure (q65's proof pattern). Scale shape: projections are
    scan-side; the grid aggregate bounds all downstream work by
    OCCUPIED-CELL count, and cell adjacency is a 9-offset equi-join,
    never a point-level pair join. This corpus's projected density
    is unimodal (one core blob + the noise row, cluster -1);
    separated blobs split into distinct clusters — proven on
    synthetic two-blob data in test_round5_ops."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.grid_density_clusters(
        emb, "embedding", width=3000000, min_pts=15
    ).orderBy("cluster")



# --------------------- 151. directed n-gram containment (quote detection)

@q(
    "q268_containment_pairs",
    """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         tokd AS (SELECT doc_id,
                         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                  FROM base),
         derived AS (SELECT doc_id + 100000 AS doc_id,
                            array_to_string(toks[1:greatest(len(toks) // 2, 1)], ' ') AS text
                     FROM tokd),
         u AS (SELECT doc_id, text FROM base
               UNION ALL SELECT doc_id, text FROM derived),
    """
    + _SHINGLE5_SQL
    + """,
         ex AS (SELECT doc_id, len(ss) AS n, unnest(ss) AS s FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          any_value(a.n) AS na, any_value(b.n) AS nb,
                          count(*) AS i
                   FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST((1000 * i) // na AS BIGINT) AS cont_ab,
           CAST((1000 * i) // nb AS BIGINT) AS cont_ba
    FROM inter
    WHERE greatest((1000 * i) // na, (1000 * i) // nb) >= 900
    ORDER BY 1, 2
    """,
)
def q268_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram CONTAINMENT dedup (Broder 1997's asymmetric
    resemblance): C(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
    — the measure that catches quote/excerpt duplicates a Jaccard
    threshold misses (a short doc embedded in a long one has tiny
    Jaccard but containment ≈ 1). The corpus is seeded with provable
    subset-duplicates: each of the first 300 docs gets a companion
    holding its first ⌈n/2⌉ normalized tokens, whose every 5-shingle
    is by construction a shingle of its parent — so the ≥900‰ filter
    MUST recover those parent↔prefix pairs (plus any organic ones,
    computed identically by both engines). Scores are exact integer
    permille (`(1000·i) div n`, truncating in both engines) — no
    float boundary to reconcile. Engine side runs the inverted
    hashed-shingle index (`containment_pairs`, 8-byte postings, one
    shuffle, capped buckets); the DuckDB twin brute-force joins string
    shingle sets, so the value hash certifies the whole pipeline
    including the hash-vs-string shingle identity."""
    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id", "text"
    )
    toks = F.split(TX.normalize_text(F.col("text")), " ")
    half = F.greatest((F.size(toks) / 2).cast("int"), F.lit(1))
    derived = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(toks, F.lit(1), half), " ").alias("text"),
    )
    u = base.unionByName(derived)
    pairs = DD.containment_pairs(
        u, "text", "doc_id", k=5, min_permille=900, max_posting_len=700
    )
    return pairs.orderBy("id_a", "id_b")


# --------------------- 152. exact PCA top component (power iteration)

def _q279_oracle() -> str:
    """Unrolled 8-step integer power iteration over the exact Gram
    matrix, as DuckDB SQL. Generated by a loop (the steps are
    mechanical); every step renormalizes with the SAME truncating
    division the engine's driver-side big-int iteration uses, so the
    whole trajectory — not just the fixed point — is bit-identical."""
    gram = """
    gcells AS MATERIALIZED (
        WITH e AS (SELECT list_transform(embedding::DOUBLE[],
                       x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS q
                   FROM embeddings),
        pr AS (SELECT a.i AS i, b.j AS j
               FROM (SELECT unnest(range(1, 65)) AS i) a,
                    (SELECT unnest(range(1, 65)) AS j) b
               WHERE b.j >= a.i)
        SELECT p.i, p.j, CAST(sum(e.q[p.i] * e.q[p.j]) AS BIGINT) AS gram
        FROM e, pr p GROUP BY 1, 2),
    gfull AS MATERIALIZED (SELECT i, j, gram FROM gcells
              UNION ALL
              SELECT j AS i, i AS j, gram FROM gcells WHERE i <> j),
    v0 AS (SELECT unnest(range(1, 65)) AS i, CAST(1000000 AS HUGEINT) AS x)
    """
    steps = []
    for k in range(1, 9):
        steps.append(f"""
    w{k} AS MATERIALIZED (
        SELECT g.i AS i, sum(CAST(g.gram AS HUGEINT) * v.x) AS y
        FROM gfull g JOIN v{k - 1} v ON g.j = v.i GROUP BY 1),
    v{k} AS MATERIALIZED (
        SELECT i, (1000000 * y) // (SELECT max(abs(y)) FROM w{k}) AS x
        FROM w{k})""")
    return (
        "WITH "
        + gram
        + ","
        + ",".join(steps)
        + """,
    w9 AS MATERIALIZED (
        SELECT g.i AS i, sum(CAST(g.gram AS HUGEINT) * v.x) AS y
        FROM gfull g JOIN v8 v ON g.j = v.i GROUP BY 1),
    ray AS (SELECT sum(v.x * w.y) AS num, sum(v.x * v.x) AS den
            FROM v8 v JOIN w9 w USING (i)),
    tr AS (SELECT CAST(sum(gram) AS HUGEINT) AS trace
           FROM gcells WHERE i = j),
    lam AS (SELECT num // (den * 1000000) AS lam_div6 FROM ray),
    evr AS (SELECT (1000000 * l.lam_div6) // (t.trace // 1000000)
                AS evr_micro
            FROM lam l, tr t)
    SELECT CAST(i AS INTEGER) AS dim, CAST(x AS BIGINT) AS val FROM v8
    UNION ALL SELECT 0, CAST(lam_div6 AS BIGINT) FROM lam
    UNION ALL SELECT -1, CAST(evr_micro AS BIGINT) FROM evr
    ORDER BY dim
    """
    )


def _tdiv_int(a: int, b: int) -> int:
    """Python // floors toward -inf; DuckDB `//` and Spark `div`
    truncate toward zero. Emulate trunc so the driver-side iteration
    replays the SQL trajectory bit-for-bit on negatives."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@q("q279_pca_power_iteration", _q279_oracle())
def q279_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PCA top component at 100 TB shape: the heavy O(N·d²)
    Gram reduction runs distributed (q254's `gram_matrix_int` — one
    vectorized int64 matmul per Arrow batch, d(d+1)/2 cells per task
    on the shuffle), then the O(d²) power iteration runs driver-side
    on the 2,080-cell Gram — arbitrary-precision Python ints, EIGHT
    fixed steps, renormalizing each step to 1e6 max-abs with
    TRUNCATING division. Exactness does not depend on convergence:
    both engines replay the identical integer trajectory, so the
    loadings, the Rayleigh quotient (λ in 1e6-reduced units, dim=0
    row) and the explained-variance ratio (micro, dim=-1 row) all
    hash-match against an UNROLLED-SQL twin. This is the decomposition
    a whitening / drift / low-rank-projection stage needs, expressed
    the only way that scales: distribute the data pass, centralize
    only the d² summary (driver traffic: 2,080 longs)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    cells = SIM.gram_matrix_int(emb, "embedding", 1_000_000).collect()
    A: dict[tuple[int, int], int] = {}
    for r in cells:
        A[(r.i, r.j)] = r.gram
        A[(r.j, r.i)] = r.gram
    d = 64
    x = [10**6] * d
    for _ in range(8):
        y = [sum(A[(i, j)] * x[j - 1] for j in range(1, d + 1))
             for i in range(1, d + 1)]
        mx = max(abs(v) for v in y)
        x = [_tdiv_int(10**6 * v, mx) for v in y]
    y9 = [sum(A[(i, j)] * x[j - 1] for j in range(1, d + 1))
          for i in range(1, d + 1)]
    num = sum(a * b for a, b in zip(x, y9))
    den = sum(a * a for a in x)
    lam_div6 = _tdiv_int(num, den * 10**6)
    trace = sum(A[(i, i)] for i in range(1, d + 1))
    evr_micro = _tdiv_int(10**6 * lam_div6, _tdiv_int(trace, 10**6))
    rows = (
        [(i, x[i - 1]) for i in range(1, d + 1)]
        + [(0, lam_div6), (-1, evr_micro)]
    )
    return _lit_df(spark, "dim int, val long", rows).orderBy("dim")


# --------------------- 153. duplication source matrix (curation view)

@q(
    "q288_dup_source_matrix",
    """
    WITH u AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
    """
    + _SHINGLE5_SQL
    + """,
         ex AS (SELECT doc_id, len(ss) AS n, unnest(ss) AS s FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          any_value(a.n) AS na, any_value(b.n) AS nb,
                          count(*) AS i
                   FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (
             SELECT id_a, id_b FROM inter
             WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.3),
         lab AS (
             SELECT least(da.source, db.source) AS source_a,
                    greatest(da.source, db.source) AS source_b,
                    count(*) AS n_pairs
             FROM pairs p
             JOIN documents da ON p.id_a = da.doc_id
             JOIN documents db ON p.id_b = db.doc_id
             GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs,
           CASE WHEN source_a = source_b THEN 'intra' ELSE 'cross' END
               AS kind
    FROM lab ORDER BY source_a, source_b
    """,
)
def q288_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard OVER the dedup output: near-duplicate
    pairs (q29's exact n-gram Jaccard at the same operating point)
    joined back to document metadata and cross-tabbed by CANONICAL
    source pair — intra-source duplication means a crawler re-fetch
    or boilerplate problem inside one feed; cross-source duplication
    means syndication between feeds, and tells the curator which
    source to drop as redundant. The (least, greatest) canonical
    ordering makes the matrix independent of pair orientation in
    both engines. Scale shape: the pair table (sparse) joins to the
    doc→source map — broadcastable at any realistic source-map size
    after projection — then one tiny count agg; the heavy lifting is
    the dedup join itself, already bounded by q29's posting cap."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = DD.jaccard_pairs(
        docs, "text", "doc_id", k=5, threshold=0.29, max_posting_len=600
    ).filter(F.round("jaccard", 6) >= 0.3)
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return lab.select(
        "source_a",
        "source_b",
        "n_pairs",
        F.when(F.col("source_a") == F.col("source_b"), "intra")
        .otherwise("cross")
        .alias("kind"),
    ).orderBy("source_a", "source_b")


# --------------------- 154. kNN classification eval on embeddings

@q(
    "q296_knn_eval",
    """
    WITH q AS (SELECT vec_id AS query_id, vec_id % 4 AS label_true,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 50),
    corpus AS (SELECT vec_id, vec_id % 4 AS label,
                      embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 50),
    scored AS (
        SELECT q.query_id, q.label_true, c.label,
               round(list_cosine_similarity(c.cv, q.qv), 6) AS s, c.vec_id
        FROM corpus c CROSS JOIN q),
    topk AS (
        SELECT query_id, label_true, label
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY s DESC, vec_id ASC) AS rn
              FROM scored)
        WHERE rn <= 5),
    votes AS (
        SELECT query_id, label_true, label, count(*) AS v
        FROM topk GROUP BY 1, 2, 3),
    pred AS (
        SELECT query_id, label_true,
               min(label) FILTER (WHERE rnk = 1) AS label_pred
        FROM (SELECT *, rank() OVER (PARTITION BY query_id
                        ORDER BY v DESC) AS rnk
              FROM votes)
        GROUP BY 1, 2)
    SELECT CAST(label_true AS BIGINT) AS label_true,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN label_pred = label_true THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY 1 ORDER BY 1
    """,
)
def q296_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier holdout evaluation over the embedding corpus —
    the sanity check embedding pipelines run to prove vectors carry
    signal: 50 held-out queries, 5-nearest-neighbor majority vote
    (labels are the deterministic vec_id % 4 so both engines agree on
    ground truth), per-class accuracy counts. Neighbor ranking uses
    the 6-dp-rounded cosine with a vec_id tie-break (q26's
    float-order-stability trick) and vote ties resolve to the
    SMALLEST label — every ordering decision pinned, so the
    prediction set is engine-identical. Scale shape: the query block
    broadcasts against the corpus scan (corpus never shuffles);
    per-query state downstream is k rows, and the accuracy rollup is
    a label-cardinality agg. The same harness evaluates any ANN
    index by swapping the scorer (q76's IVF, q30's LSH)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.pmod(F.col("vec_id"), F.lit(4)).alias("label_true"),
        F.col("embedding").alias("qv"),
    )
    # fan_out: the 64-dim cosine fold per (corpus x query) pair is the
    # dominant cost; without it the whole cross join runs on the single
    # under-split embeddings scan task (§2.5).
    corpus = fan_out(
        emb.filter(F.col("vec_id") >= 50).select(
            "vec_id",
            F.pmod(F.col("vec_id"), F.lit(4)).alias("label"),
            F.col("embedding").alias("cv"),
        )
    )
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "label_true",
        "label",
        F.round(cosine("cv", "qv"), 6).alias("s"),
        "vec_id",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id").asc()
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "label_true", "label")
    )
    votes = topk.groupBy("query_id", "label_true", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("v").desc())
    pred = (
        votes.withColumn("rnk", F.rank().over(wv))
        .filter(F.col("rnk") == 1)
        .groupBy("query_id", "label_true")
        .agg(F.min("label").alias("label_pred"))
    )
    return (
        pred.groupBy(F.col("label_true").cast("long").alias("label_true"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                F.when(F.col("label_pred") == F.col("label_true"), 1)
                .otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .orderBy("label_true")
    )


# --------------------- 155. similarity-transitivity audit

@q(
    "q294_transitivity_audit",
    """
    WITH u AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
    """
    + _SHINGLE5_SQL
    + """,
         ex AS (SELECT doc_id, len(ss) AS n, unnest(ss) AS s FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          any_value(a.n) AS na, any_value(b.n) AS nb,
                          count(*) AS i
                   FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         e AS (SELECT id_a, id_b FROM inter
               WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.3),
         adj AS (SELECT id_a AS ctr, id_b AS leaf FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         wedge AS (
             SELECT x.leaf AS a, x.ctr AS b, y.leaf AS c
             FROM adj x JOIN adj y
               ON x.ctr = y.ctr AND x.leaf < y.leaf),
         closed AS (
             SELECT count(*) AS nc FROM wedge w
             WHERE EXISTS (SELECT 1 FROM e
                           WHERE e.id_a = w.a AND e.id_b = w.c))
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM wedge) AS BIGINT) AS n_wedges,
           CAST(closed.nc AS BIGINT) AS n_closed,
           CAST(CASE WHEN (SELECT count(*) FROM wedge) = 0 THEN 0
                ELSE (1000 * closed.nc) // (SELECT count(*) FROM wedge)
                END AS BIGINT) AS closure_permille
    FROM closed
    """,
)
def q294_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the near-dup relation — the diagnostic
    that tells you whether connected-components clustering (q65) is
    SAFE: similarity is not transitive, and every OPEN wedge
    (A~B~C with A≁C) is a place where CC glues two non-duplicates
    into one cluster via a chain. The closure rate (closed wedges /
    all wedges, exact permille) quantifies that risk on the real
    pair graph at the q29 operating point; a curator reading a low
    rate switches from CC to star/medoid clustering before dropping
    docs. Scale shape: wedges enumerate by joining the adjacency
    list with itself on the CENTER vertex — bounded by Σ deg², the
    same oriented-degree bound q163's triangle count relies on —
    and close with one semi-join back to the (canonically ordered)
    edge set; no doc text is touched after the pair join."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    e = DD.jaccard_pairs(
        docs, "text", "doc_id", k=5, threshold=0.29, max_posting_len=600
    ).filter(F.round("jaccard", 6) >= 0.3).select("id_a", "id_b")
    e = e.localCheckpoint()
    adj = e.select(
        F.col("id_a").alias("ctr"), F.col("id_b").alias("leaf")
    ).unionByName(
        e.select(F.col("id_b").alias("ctr"), F.col("id_a").alias("leaf"))
    )
    x = adj.select(F.col("ctr"), F.col("leaf").alias("a"))
    y = adj.select(F.col("ctr"), F.col("leaf").alias("c"))
    wedge = x.join(y, "ctr").filter(F.col("a") < F.col("c")).select("a", "c")
    n_edges = e.count()
    n_wedges = wedge.count()
    n_closed = wedge.join(
        e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c")),
        ["a", "c"],
        "left_semi",
    ).count()
    permille = (1000 * n_closed) // n_wedges if n_wedges else 0
    return _lit_df(
        spark,
        "n_edges long, n_wedges long, n_closed long, closure_permille long",
        [(n_edges, n_wedges, n_closed, permille)],
    )
