"""Similarity/dedup registry: MinHash/SimHash/Jaccard LSH, embedding
ANN and IVF index lifecycle, fuzzy matching, dedup clustering and
graph analytics.

Split out of the former monolithic queries.py (round 5) — every
block is verbatim; registration happens via the shared `q` decorator
from `._base`, so importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403



@q(
    "q23_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q23_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content fingerprint (dedup key) — md5 agrees
    byte-for-byte between Spark and DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))



@q(
    "q24_dedup_exact",
    """
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    """,
)
def q24_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.dedup_exact(docs, "text", "doc_id").select("doc_id")



# ------------------------------------------------- 12. embeddings / ANN

@q(
    "q26_embedding_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS cos_sim
           FROM embeddings c CROSS JOIN q)
    SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def q26_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact ANN baseline). Ranks by the
    6-dp-ROUNDED similarity so float noise can't flip ranks vs DuckDB."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    scored = emb.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.round(cosine("embedding", "query_vec"), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")



@q(
    "q27_minhash_pairs",
    """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         u AS (SELECT doc_id, text FROM base
               UNION ALL
               SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id < 100),
         g AS (SELECT doc_id,
                      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS key
               FROM u)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(1.0 AS DOUBLE) AS est_jaccard
    FROM g a JOIN g b ON a.key = b.key AND a.doc_id < b.doc_id
    """,
)
def q27_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH through the FULL production banded pipeline (fused
    token-hash → rolling-shingle → permutation-min kernel, band
    explode, (band, bucket) shuffle, in-row pair expansion,
    positional-agreement estimator), value-checked on its PROVABLE
    subset: identical-normalized-text pairs MUST appear among the
    candidates (identical text ⟹ identical signature ⟹ collision in
    every band — recall 1.0 by pigeonhole, no probability involved)
    with est_jaccard exactly 1.0 (all 32 minima agree). The query
    unions a shifted copy of the first 100 docs to make that subset
    non-empty, then keeps candidate pairs whose md5 fingerprints
    match; the DuckDB twin is the brute-force md5 self-join. A dropped
    identical pair (bucketing bug) fails on rows, a wrong estimator
    (kernel bug) fails on values. The probabilistic near-dup
    candidates this filter discards are recall-tested in
    `tests/test_text_dedup.py` (an est==1.0 oracle is NOT sound here:
    the corpus has J≈0.989 non-identical pairs, which tie all 32
    minima with P≈0.7)."""
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
    return (
        pairs.join(
            fp.select(F.col("doc_id").alias("id_a"), F.col("_fp").alias("_fa")),
            "id_a",
        )
        .join(
            fp.select(F.col("doc_id").alias("id_b"), F.col("_fp").alias("_fb")),
            "id_b",
        )
        .filter(F.col("_fa") == F.col("_fb"))
        .select("id_a", "id_b", "est_jaccard")
    )



@q(
    "q28_simhash_pairs",
    """
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         u AS (SELECT doc_id, text FROM base
               UNION ALL
               SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id < 100),
         g AS (SELECT doc_id,
                      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS key
               FROM u)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(0 AS INT) AS hamming
    FROM g a JOIN g b ON a.key = b.key AND a.doc_id < b.doc_id
    """,
)
def q28_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash through the full Manku chunk-bucket pipeline at its
    production operating point (max_hamming=3, 4 pigeonhole chunks),
    value-checked on its PROVABLE subset: identical-normalized-text
    pairs MUST be found (identical text ⟹ identical 63-bit signature
    ⟹ hamming 0 ⟹ every chunk collides) with hamming exactly 0.
    Shifted copies of the first 100 docs make that subset non-empty;
    candidates are filtered to md5-equal pairs; the DuckDB twin is the
    brute-force md5 self-join. A dropped pair (chunk-bucket bug) fails
    on rows, a wrong signature kernel fails the hamming value. The
    probabilistic hamming-1..3 near-dup pairs the filter discards are
    recall-tested in `tests/test_text_dedup.py` (an identical-multiset
    oracle at max_hamming=0 is NOT sound: the corpus has near-dup
    pairs whose 63 bit-balances all keep their sign)."""
    from ingestao_dados_poli_spark.functions.text import fingerprint

    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select(
        "doc_id", "text"
    )
    copies = base.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    u = base.unionByName(copies)
    fp = u.select(F.col("doc_id"), fingerprint("text").alias("_fp"))
    pairs = DD.simhash_pairs(u, "text", "doc_id", max_hamming=3)
    return (
        pairs.join(
            fp.select(F.col("doc_id").alias("id_a"), F.col("_fp").alias("_fa")),
            "id_a",
        )
        .join(
            fp.select(F.col("doc_id").alias("id_b"), F.col("_fp").alias("_fb")),
            "id_b",
        )
        .filter(F.col("_fa") == F.col("_fb"))
        .select("id_a", "id_b", "hamming")
    )



@q(
    "q29_jaccard_pairs",
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
                   GROUP BY 1, 2)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
             CAST(round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS DOUBLE) AS jaccard
      FROM inter)
    WHERE jaccard >= 0.3
    """,
)
def q29_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard via the inverted shingle index — unlike the
    probabilistic LSH queries this algorithm is exact by nature, so the
    oracle needs no degenerate trick: it only needs the posting cap to
    be lossless, guaranteed by bounding the slice to 500 docs with
    ``max_posting_len=600`` (a posting can never exceed the doc count;
    the corpus's real max posting is 3). The DuckDB twin builds string
    5-shingle sets and brute-force joins them; the engine side works
    on xxhash64'd shingles (8-byte postings instead of ~40-byte
    strings — the 100 TB shuffle argument), so the value hash also
    certifies hash-vs-string shingle identity on this corpus. Jaccard
    rounded to 6 dp on both engines."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    # inner threshold slightly below the advertised one so the 6-dp
    # ROUNDED filter decides the boundary identically on both engines
    pairs = DD.jaccard_pairs(
        docs, "text", "doc_id", k=5, threshold=0.29, max_posting_len=600
    )
    return pairs.withColumn("jaccard", F.round("jaccard", 6)).filter(
        F.col("jaccard") >= 0.3
    )


@q(
    "q47_centroid_assign",
    f"""
    WITH scored AS (
        SELECT vec_id, [{_CENTROID_SQL}] AS cs FROM embeddings)
    SELECT CASE WHEN cs[1] >= cs[2] AND cs[1] >= cs[3] AND cs[1] >= cs[4] THEN 0
                WHEN cs[2] >= cs[3] AND cs[2] >= cs[4] THEN 1
                WHEN cs[3] >= cs[4] THEN 2
                ELSE 3 END AS centroid_id,
           count(*) AS n_vectors
    FROM scored GROUP BY 1
    """,
)
def q47_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: population of each centroid's partition.
    Scores are rounded to 6 dp on BOTH engines so the argmax (lowest
    index wins ties) is float-order independent."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    assigned = SIM.nearest_centroid(emb, _CENTROIDS, score_round=6)
    return assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_vectors"))



# ------------------------- 24. rows-only LSH / media (non-SQL-expressible)

@q(
    "q39_embedding_sim_pairs",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 500)
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(round(list_cosine_similarity(a.v, b.v), 6) AS DOUBLE) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    WHERE cos_sim >= 0.3
    """,
)
def q39_embedding_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup pairs through the FULL LSH machinery
    (signature UDF → bucket groupBy → in-row pair expansion → cosine
    verify) in its degenerate-exact configuration: ``num_planes=0,
    num_tables=1`` puts every vector in one bucket, so recall is 1.0
    by construction and the result is value-hash-checkable against a
    DuckDB brute-force pair join (list_cosine_similarity). Bounded to
    vec_id < 500 because this mode IS the quadratic all-pairs plan;
    the production (probabilistic-recall, bucketed) configuration of
    the same operator is exercised by `tests/test_similarity_multimodal.py`.
    Cosine rounded to 6 dp on both engines so the threshold boundary
    can't flip on float noise. The corpus has no true near-dups (max
    pairwise cosine ≈0.46), so threshold 0.3 keeps the verify path
    non-empty."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    return SIM.embedding_near_dup_pairs(
        emb,
        threshold=0.3,
        num_planes=0,
        num_tables=1,
        dim=64,
        max_bucket_size=600,
        score_round=6,
    )



@q(
    "q30_embedding_lsh_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS cos_sim
           FROM embeddings c CROSS JOIN q)
    SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def q30_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k through the FULL scale-path machinery
    (signatures → broadcast semi-join → capped bucket groupBy →
    re-rank) in its degenerate-exact configuration: ``num_planes=0,
    num_tables=1`` collides everything, so the candidate set is the
    whole corpus and the result provably equals brute force — the same
    nprobe=nlist trick that oracles IVF in q76. The DuckDB twin is the
    q26 brute-force top-k; the two queries agreeing on the same hash
    is the point (different physical plans, one answer). Probabilistic
    configs of the same operator are recall-tested in
    `tests/test_similarity_multimodal.py`."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.topk_lsh(
        emb,
        queries,
        k=5,
        num_planes=0,
        num_tables=1,
        dim=64,
        max_bucket_size=1_000_000,
        score_round=6,
    )



# ------------------------------- 25. fuzzy match / histogram / stats / ntile

@q(
    "q55_fuzzy_match",
    """
    SELECT a.p_brand,
           count(*) AS n_close_pairs,
           CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    GROUP BY 1
    """,
)
def q55_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: the reference's conform-entity-key join
    (etl/3:62-78, etl/4:36-57) generalized to edit distance, via
    operators/fuzzy.fuzzy_pairs. The blocking key is the COMPOSITE
    (p_brand, length band) — the length banding is lossless for the
    threshold (|len diff| > 12 ⇒ dist > 12), so the oracle — which is
    blocking-agnostic — stays exact while each block shrinks by the
    length spread. fuzzy_pairs also takes max_block_size to hard-cap
    block sizes at real scale (unused here: exactness is the oracle's
    contract and TPC-H blocks are bounded)."""
    part = _t(spark, sf_dir, "part")
    pairs = FZ.fuzzy_pairs(
        part, key_col="p_partkey", text_col="p_name", block_col="p_brand", max_dist=12
    )
    return pairs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_close_pairs"),
        F.min("dist").cast("long").alias("min_dist"),
    )



# ------------------------------------------ 27. dedup clustering (graph)

@q(
    "q65_dedup_components",
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
    sizes AS (
        SELECT component, count(*) AS component_size FROM comp GROUP BY component
    )
    SELECT CAST(component_size AS BIGINT) AS component_size,
           count(*) AS n_components
    FROM sizes GROUP BY component_size
    """,
)
def q65_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate CLUSTERS: transitive closure of the
    fuzzy-match pair graph via distributed min-label flooding
    (operators/graph.connected_components), then the cluster-size
    histogram. This is the step that turns any pair generator (MinHash,
    SimHash, embedding LSH, fuzzy) into keep/drop decisions — one
    canonical doc (min id) per component. The DuckDB oracle computes
    the same closure with a recursive CTE, so the distributed algorithm
    is hash-checked against a declarative reference.

    Edges are blocked on the composite (p_brand, p_size) — brand alone
    makes near-cliques of whole brands (~8M edges at sf0.1, dense
    flooding for no extra information); the composite keeps the graph
    dedup-shaped (~150k edges, 2-iteration convergence)."""
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
        nodes=part.select("p_partkey"),
        node_col="p_partkey",
    )
    return G.component_sizes(comps).select(
        F.col("component_size").cast("long").alias("component_size"),
        F.col("n_components").cast("long").alias("n_components"),
    )



@q(
    "q76_ivf_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN (10, 20, 30)),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6)
                      AS cos_sim
           FROM embeddings c CROSS JOIN q)
    SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 8
    """,
)
def q76_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search with nprobe == nlist, which degrades exactly to
    brute force — so the full IVF machinery (coarse assign, probe list,
    per-partition scoring, top-k merge) is hash-checked against the
    exact-cosine oracle. Pruning behavior (nprobe < nlist scores only
    the probed partitions) is asserted in tests/test_similarity_ivf.py.
    """
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id").isin(10, 20, 30)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.ivf_topk(
        emb,
        queries,
        _CENTROIDS,
        k=8,
        nprobe=len(_CENTROIDS),
        score_round=6,
    )



@q(
    "q79_contamination",
    """
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(ws) - 2),
                   i -> array_to_string(ws[i:i+3], ' ')))) AS g
        FROM w WHERE len(ws) >= 4),
    bench AS (SELECT doc_id AS bench_id, g FROM sh WHERE doc_id % 20 = 0),
    hits AS (
        SELECT s.doc_id, count(DISTINCT s.g) AS n_shared
        FROM sh s JOIN bench b ON s.g = b.g AND s.doc_id <> b.bench_id
        GROUP BY 1)
    SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared FROM hits
    """,
)
def q79_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection (GPT-3 appendix-C style): flag
    training documents sharing any 4-gram with a held-out benchmark set
    (here: every 20th doc). Grams are built all-JVM (posexplode + 4
    lead() calls over one per-doc window — no interpreted HOF in the
    hot path) and deduped per doc; the benchmark side is tiny by
    construction, so the overlap join broadcasts it. At 100 TB hash
    grams to int64 (xxhash64) before the join to shrink shuffle/build
    width — string grams kept here for oracle comparability."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    words = docs.select("doc_id", F.posexplode(ws).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("word", i).over(w) for i in range(1, 4)]
    grams = (
        words.select(
            "doc_id",
            F.concat_ws(" ", F.col("word"), *leads).alias("g"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "g")
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"), F.col("g").alias("bg")
    )
    return (
        grams.join(
            F.broadcast(bench),
            (F.col("g") == F.col("bg")) & (F.col("doc_id") != F.col("bench_id")),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("long").alias("n_shared"))
    )



@q(
    "q81_semantic_dedup",
    f"""
    WITH scored AS (
        SELECT vec_id, embedding, [{_CENTROID_SQL}] AS cs FROM embeddings),
    a AS (
        SELECT vec_id, embedding,
               CASE WHEN cs[1] >= cs[2] AND cs[1] >= cs[3] AND cs[1] >= cs[4] THEN 0
                    WHEN cs[2] >= cs[3] AND cs[2] >= cs[4] THEN 1
                    WHEN cs[3] >= cs[4] THEN 2 ELSE 3 END AS centroid_id
        FROM scored),
    edges AS (
        SELECT x.vec_id AS ia, y.vec_id AS ib
        FROM a x JOIN a y
          ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
        WHERE round(list_cosine_similarity(x.embedding::DOUBLE[],
                                           y.embedding::DOUBLE[]), 6) >= 0.40),
    sym AS (SELECT ia a, ib b FROM edges UNION ALL SELECT ib, ia FROM edges),
    comp AS (
        WITH RECURSIVE walk(node, label) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sym)
            UNION
            SELECT s.b, w.label FROM walk w JOIN sym s ON w.node = s.a
            WHERE w.label < s.b),
        reach AS (SELECT node, min(label) AS component FROM walk GROUP BY 1)
        SELECT av.vec_id AS node,
               coalesce(r.component, av.vec_id) AS component,
               av.centroid_id
        FROM a av LEFT JOIN reach r ON av.vec_id = r.node)
    SELECT centroid_id, count(*) AS n_vectors,
           CAST(sum(CASE WHEN node = component THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM comp GROUP BY centroid_id
    """,
)
def q81_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (semantic near-dup removal, arXiv:2303.09540): coarse
    k-means partition → exact within-cluster cosine pairs (capped
    in-row expansion) → transitive closure → keep the min-id canonical
    per duplicate group. Reported per centroid as kept/total. The
    DuckDB oracle recomputes the closure with a recursive CTE, so the
    distributed flooding + capped pair generation is hash-checked
    end-to-end. Threshold 0.40 chosen because the synthetic embeddings
    are random (max within-cluster cosine ~0.51) — real corpora use
    0.95+."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = SIM.semantic_dedup(
        emb, _CENTROIDS, threshold=0.40, score_round=6
    )
    return out.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
    )



# --------------------------- 76. incremental ingest dedup (delta vs corpus)

@q(
    "q123_incremental_dedup",
    """
    WITH existing AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
    delta AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
    intra AS (
        SELECT d.* FROM delta d
        WHERE d.doc_id = (SELECT min(d2.doc_id) FROM delta d2
                          WHERE md5(trim(regexp_replace(lower(d2.text), '\\s+', ' ', 'g')))
                              = md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))))
    )
    SELECT CAST(count(*) AS BIGINT) AS n_survivors,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM intra i
    WHERE NOT EXISTS (SELECT 1 FROM existing e
                      WHERE md5(trim(regexp_replace(lower(e.text), '\\s+', ' ', 'g')))
                        = md5(trim(regexp_replace(lower(i.text), '\\s+', ' ', 'g'))))
    """,
)
def q123_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a delta batch (doc_id % 4 = 0) lands
    against the already-ingested corpus (the rest); survivors are delta
    docs that are neither exact dups of the corpus nor intra-batch dups
    (keep lowest id). This is the EVERY-BATCH operation of a growing
    100 TB corpus — `dedup.dedup_incremental_exact` reduces both sides
    to md5 fingerprints scan-side and anti-joins 16-byte hash-uniform
    keys; at scale the corpus fingerprint set is maintained as its own
    compact table (existing_is_fingerprints=True) so ingest cost is
    |delta| + |fp set|, independent of corpus text bytes."""
    docs = _t(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    existing = docs.filter(F.col("doc_id") % 4 != 0)
    survivors = DD.dedup_incremental_exact(delta, existing, "text", "doc_id")
    return survivors.agg(
        F.count(F.lit(1)).cast("long").alias("n_survivors"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )



# ----------------------- 77. delta-vs-corpus near-dup candidates (LSH join)

@q(
    "q124_minhash_between",
    """
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         delta AS (SELECT doc_id + 100000 AS doc_id, text FROM corpus
                   WHERE doc_id < 100),
         ck AS (SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS key
                FROM corpus),
         dk AS (SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS key
                FROM delta)
    SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
           CAST(1.0 AS DOUBLE) AS est_jaccard
    FROM dk d JOIN ck c ON d.key = c.key
    """,
)
def q124_minhash_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates BETWEEN a delta batch and the corpus via the
    cross-corpus banded-LSH join (`dedup.minhash_pairs_between`) —
    the approximate companion to q123's exact path: one shuffle on
    (band, bucket), signatures in-row, cross-side pairs only, capped
    buckets. Value-checked on the PROVABLE subset (same construction
    as q27): the delta is an id-shifted copy of the first 100 corpus
    docs, so every delta doc has exactly one identical-text partner in
    the corpus, each such pair MUST collide in every band (identical
    signature — recall 1.0 by pigeonhole) with est_jaccard exactly
    1.0, and candidates are filtered to fingerprint-equal pairs. The
    DuckDB twin is the brute-force cross-side md5 join. Probabilistic
    near-dup recall is unit-tested in test_text_dedup against
    brute-force Jaccard."""
    from ingestao_dados_poli_spark.functions.text import fingerprint

    corpus = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select(
        "doc_id", "text"
    )
    delta = corpus.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    pairs = DD.minhash_pairs_between(
        delta, corpus, "text", "doc_id", num_hashes=64, num_bands=16
    )
    dfp = delta.select(F.col("doc_id").alias("left_id"), fingerprint("text").alias("_fa"))
    cfp = corpus.select(F.col("doc_id").alias("right_id"), fingerprint("text").alias("_fb"))
    return (
        pairs.join(dfp, "left_id")
        .join(cfp, "right_id")
        .filter(F.col("_fa") == F.col("_fb"))
        .select(
            F.col("left_id").alias("delta_id"),
            F.col("right_id").alias("corpus_id"),
            F.col("est_jaccard"),
        )
    )



# ------------- 84. iterative PageRank, exactly oracled (integer mass)

@q(
    "q131_pagerank",
    """
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        UNION
        SELECT DISTINCT o_custkey + 1000000 AS src, l_suppkey AS dst
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
    g1 AS (SELECT r.node, r.mass, coalesce(d.deg, 0) AS deg,
                  CASE WHEN d.deg IS NOT NULL
                       THEN (r.mass * 17) // (20 * d.deg) ELSE 0 END AS give
           FROM r0 r LEFT JOIN deg d USING (node)),
    c1 AS (SELECT e.dst AS node, sum(g.give) AS cin
           FROM edges e JOIN g1 g ON g.node = e.src GROUP BY 1),
    p1 AS (SELECT sum(mass - give * deg) AS pool FROM g1),
    r1 AS (SELECT nd.node, CAST(coalesce(c.cin, 0) + pool // n AS BIGINT) AS mass
           FROM nodes nd LEFT JOIN c1 c USING (node) CROSS JOIN p1 CROSS JOIN nn),
    g2 AS (SELECT r.node, r.mass, coalesce(d.deg, 0) AS deg,
                  CASE WHEN d.deg IS NOT NULL
                       THEN (r.mass * 17) // (20 * d.deg) ELSE 0 END AS give
           FROM r1 r LEFT JOIN deg d USING (node)),
    c2 AS (SELECT e.dst AS node, sum(g.give) AS cin
           FROM edges e JOIN g2 g ON g.node = e.src GROUP BY 1),
    p2 AS (SELECT sum(mass - give * deg) AS pool FROM g2),
    r2 AS (SELECT nd.node, CAST(coalesce(c.cin, 0) + pool // n AS BIGINT) AS mass
           FROM nodes nd LEFT JOIN c2 c USING (node) CROSS JOIN p2 CROSS JOIN nn),
    g3 AS (SELECT r.node, r.mass, coalesce(d.deg, 0) AS deg,
                  CASE WHEN d.deg IS NOT NULL
                       THEN (r.mass * 17) // (20 * d.deg) ELSE 0 END AS give
           FROM r2 r LEFT JOIN deg d USING (node)),
    c3 AS (SELECT e.dst AS node, sum(g.give) AS cin
           FROM edges e JOIN g3 g ON g.node = e.src GROUP BY 1),
    p3 AS (SELECT sum(mass - give * deg) AS pool FROM g3),
    r3 AS (SELECT nd.node, CAST(coalesce(c.cin, 0) + pool // n AS BIGINT) AS mass
           FROM nodes nd LEFT JOIN c3 c USING (node) CROSS JOIN p3 CROSS JOIN nn)
    SELECT CAST(node AS BIGINT) AS node, mass
    FROM r3 ORDER BY mass DESC, node LIMIT 20
    """,
)
def q131_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the supplier↔customer shipment graph
    (bipartite, both directions), 3 rounds of
    ``graph.pagerank_integer`` — the INTEGER mass-passing formulation
    whose floor-division arithmetic is bit-identical across engines,
    so an ITERATIVE algorithm (the category usually stuck with
    rows-only checks, like q65's closure) gets a full value-hash
    oracle: the DuckDB twin unrolls the same three rounds as chained
    CTEs. Top-20 most-central nodes by final mass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("o_custkey") + 1000000).cast("long").alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ranks = G.pagerank_integer(edges, iterations=3)
    return ranks.orderBy(F.col("mass").desc(), F.col("node")).limit(20)



# ------- 86. multi-batch incremental dedup via the versioned fp store

@q(
    "q133_fp_store_lifecycle",
    """
    WITH dn AS (SELECT doc_id, text,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                FROM documents),
    b1 AS (SELECT doc_id, fp FROM dn WHERE doc_id < 150),
    b2 AS (SELECT doc_id, fp FROM dn WHERE doc_id >= 150 AND doc_id < 300
           UNION ALL
           SELECT doc_id + 10000 AS doc_id, fp FROM dn WHERE doc_id < 40),
    b3 AS (SELECT doc_id, fp FROM dn WHERE doc_id >= 300 AND doc_id < 450
           UNION ALL
           SELECT doc_id + 20000 AS doc_id, fp FROM dn
           WHERE doc_id >= 50 AND doc_id < 90
           UNION ALL
           SELECT doc_id + 30000 AS doc_id, fp FROM dn
           WHERE doc_id >= 200 AND doc_id < 240),
    seen AS (SELECT fp FROM b1 UNION SELECT fp FROM b2),
    s3 AS (SELECT fp, min(doc_id) AS doc_id FROM b3 GROUP BY fp)
    SELECT s3.doc_id, s3.fp
    FROM s3 WHERE s3.fp NOT IN (SELECT fp FROM seen)
    """,
)
def q133_fp_store_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ingest batches deduped through the VERSIONED fingerprint
    store (`operators/dedup.py` `dedup_ingest_batch` /
    `fingerprint_store_compact`): batch 1 seeds the store, batch 2
    (with planted cross-batch dups of batch 1) appends a delta, the
    store is compacted to one snapshot, and batch 3 (with planted dups
    of batches 1 AND 2) dedups against ONLY the compacted+delta
    fingerprints — its plan never touches batch-1/2 text bytes, which
    is the property that makes per-ingest cost |batch| + |fp set| at
    100 TB. The oracle recomputes the same set algebra from raw text
    in DuckDB, so a store that lost a fingerprint (survivor leaks
    through) or invented one (survivor wrongly dropped) hash-fails.
    Version lifecycle is asserted in-line: ingest, ingest, compact
    (vacuum to 1), ingest must leave exactly committed versions
    [3, 4]."""
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.operators.dedup import fingerprint_exact
    from ingestao_dados_poli_spark.sources import versioned as V

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    b1 = docs.filter(did < 150)
    b2 = docs.filter((did >= 150) & (did < 300)).unionByName(
        docs.filter(did < 40).select((did + 10000).alias("doc_id"), "text")
    )
    b3 = (
        docs.filter((did >= 300) & (did < 450))
        .unionByName(
            docs.filter((did >= 50) & (did < 90)).select(
                (did + 20000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter((did >= 200) & (did < 240)).select(
                (did + 30000).alias("doc_id"), "text"
            )
        )
    )
    store = f"/tmp/q133_fp_{_os.getpid()}"
    _shutil.rmtree(store, ignore_errors=True)
    DD.dedup_ingest_batch(spark, b1, store, "text", "doc_id")
    DD.dedup_ingest_batch(spark, b2, store, "text", "doc_id")
    DD.fingerprint_store_compact(spark, store, keep=1)
    survivors, _ = DD.dedup_ingest_batch(spark, b3, store, "text", "doc_id")
    got = V.committed_versions(spark, store)
    if got != [3, 4]:
        raise AssertionError(f"fp store lifecycle drifted: versions {got}")
    return survivors.select("doc_id", fingerprint_exact("text").alias("fp"))



# ------------------- 79. span-level exact dedup with document reassembly

@q(
    "q137_span_dedup",
    """
    WITH nsp AS (
        SELECT doc_id,
               CAST(ceil(len(string_split(text, ' ')) / 3.0) AS BIGINT)
                   AS n_spans,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    spans AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
               array_to_string(
                   list_slice(toks, (i - 1) * 3 + 1, (i - 1) * 3 + 3), ' '
               ) AS span
        FROM nsp, unnest(generate_series(1, n_spans)) AS g(i)
    ),
    dup AS (
        SELECT span FROM spans GROUP BY span
        HAVING count(DISTINCT doc_id) > 1
    ),
    kept AS (
        SELECT s.doc_id, s.idx, s.span
        FROM spans s ANTI JOIN dup d ON s.span = d.span
    ),
    re AS (
        SELECT doc_id, string_agg(span, ' ' ORDER BY idx) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT n.doc_id, coalesce(re.clean_text, '') AS clean_text,
           n.n_spans,
           CAST(n.n_spans - coalesce(re.n_kept, 0) AS BIGINT) AS n_removed
    FROM nsp n LEFT JOIN re ON n.doc_id = re.doc_id
    """,
)
def q137_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at span granularity
    (`operators/corpus.py:dedup_spans`): every 3-word span occurring in
    >1 document is deleted from ALL documents and the survivors are
    stitched back in order — the passage-level cousin of whole-doc
    dedup that strips shared boilerplate while keeping each doc's
    unique remainder. 3 map-side-combined shuffles, duplicated-span set
    anti-joined (AQE broadcasts it when small), reassembly via in-row
    array_sort — no windows, no global sort, text never collected.
    Fully value-oracled per document including the reassembled text."""
    docs = _t(spark, sf_dir, "documents")
    return CO.dedup_spans(docs, span_words=3, max_doc_freq=1)



# ---------------- 84. int8-quantized embedding top-k (compressed ANN)

@q(
    "q142_quantized_topk",
    """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         qz AS (
           SELECT vec_id,
                  list_transform(
                    v,
                    x -> CASE
                           WHEN list_max(list_transform(v, y -> abs(y))) = 0
                           THEN 0
                           ELSE CAST(floor(
                             x / (list_max(list_transform(v, y -> abs(y)))
                                  / 127.0) + 0.5) AS BIGINT)
                         END) AS q
           FROM base),
         qs AS (SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id < 3),
         scored AS (
           SELECT qs.query_id, c.vec_id,
                  round(
                    list_inner_product(c.q, qs.qq)
                    / (sqrt(list_inner_product(c.q, c.q))
                       * sqrt(list_inner_product(qs.qq, qs.qq))), 6
                  ) AS qcos_sim
           FROM qz c CROSS JOIN qs)
    SELECT query_id, vec_id, CAST(qcos_sim AS DOUBLE) AS qcos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY qcos_sim DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def q142_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain ANN (`functions/vectors.py:quantize_int8`):
    symmetric per-vector int8 codes (4x smaller than float32 — 4x less
    scan/shuffle/broadcast at 100 TB), cosine computed DIRECTLY on the
    codes with exact long accumulation (the per-vector scale cancels in
    the ratio, so no dequantization pass exists at all). Same
    plan shape as the exact baseline q26: quantized queries broadcast,
    corpus never shuffles, rank by 6-dp-rounded score + id tie-break.
    Fully value-oracled — quantization uses floor-based round-half-up,
    which DuckDB reproduces bit-for-bit; recall vs the exact baseline
    is measured in test_similarity_multimodal."""
    from ingestao_dados_poli_spark.functions.vectors import (
        int8_cosine,
        quantize_int8,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        quantize_int8(F.col("embedding").cast("array<double>")).alias("q"),
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = emb.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.round(int8_cosine("q", "qq"), 6).alias("qcos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )



# --------------- 86. order-insensitive table fingerprint (anti-entropy)

@q(
    "q143_table_fingerprint",
    """
    WITH h AS (
      SELECT o_orderpriority,
             CAST(('0x' || substr(md5(concat_ws(chr(31),
                 coalesce(CAST(o_orderkey AS VARCHAR),
                          chr(0) || 'null' || chr(0)),
                 coalesce(o_orderpriority, chr(0) || 'null' || chr(0)),
                 coalesce(CAST(o_orderdate AS VARCHAR),
                          chr(0) || 'null' || chr(0)),
                 coalesce(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))
                               AS VARCHAR),
                          chr(0) || 'null' || chr(0))
             )), 1, 15)) AS BIGINT) AS hh
      FROM orders)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(hh) AS xor_fp,
           CAST(sum(CAST(hh AS HUGEINT)) % 1152921504606846976 AS BIGINT)
               AS sum_fp
    FROM h GROUP BY o_orderpriority
    """,
)
def q143_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy digest (`operators/audit.py`): per-priority
    (count, bit_xor, modular-sum) fingerprints of orders — the
    replica-verification exchange that compares 100 TB copies by
    sending O(groups) hashes instead of rows, with xor catching any
    single-row drift and the modular sum catching the duplicate-pair
    cancellation xor misses. THE cross-engine subtlety is row
    canonicalization: doubles are rounded + cast to DECIMAL before
    hashing because double→string formatting is engine-specific —
    exactly the discipline a real cross-system migration check needs,
    and the oracle proves DuckDB derives the IDENTICAL 60-bit hashes
    from the same canonical strings."""
    from ingestao_dados_poli_spark.operators import audit as AU

    orders = _t(spark, sf_dir, "orders")
    cols = [
        F.col("o_orderkey"),
        F.col("o_orderpriority"),
        F.col("o_orderdate"),
        F.round("o_totalprice", 2).cast("decimal(18,2)"),
    ]
    return AU.table_fingerprint(orders, cols, group_by=["o_orderpriority"])



# ------------- 90. persisted IVF index lifecycle (ingest -> search)

@q(
    "q148_ivf_index_lifecycle",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN (7, 42)),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6)
                      AS cos_sim
           FROM embeddings c CROSS JOIN q)
    SELECT query_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 6
    """,
)
def q148_ivf_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index maintenance (`operators/similarity.py:
    ivf_index_ingest/read/search`): the corpus arrives in TWO batches,
    each assigned to the FIXED codebook scan-side and published as an
    atomic delta snapshot hive-partitioned by centroid_id — per-ingest
    cost is |batch|, no re-clustering, no index rewrite (the codebook
    is the index's stable contract). Search unions the committed
    deltas and probes partitions; run here with nprobe == nlist so the
    whole lifecycle — two ingests, delta union, probe join, top-k
    merge — degrades exactly to brute force and value-checks against
    the exact-cosine oracle. Batching-invariance (index built in 2
    batches == built in 1) is pinned in test_similarity_ivf."""
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark.operators.similarity import (
        ivf_index_ingest,
        ivf_index_search,
    )

    idx = f"/tmp/q148_ivf_{_os.getpid()}/index"
    _shutil.rmtree(f"/tmp/q148_ivf_{_os.getpid()}", ignore_errors=True)
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    ivf_index_ingest(
        spark, emb.filter(F.col("vec_id") < 250), _CENTROIDS, idx,
        score_round=6,
    )
    ivf_index_ingest(
        spark, emb.filter(F.col("vec_id") >= 250), _CENTROIDS, idx,
        score_round=6,
    )
    queries = emb.filter(F.col("vec_id").isin(7, 42)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_index_search(
        spark, idx, queries, _CENTROIDS,
        k=6, nprobe=len(_CENTROIDS), score_round=6,
    )



# ------------- 95. keep-best-duplicate dedup (quality-ranked survivor)

@q(
    "q153_dedup_keep_best",
    """
    WITH fp AS (
        SELECT doc_id, source, n_chars,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
        FROM documents),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY f ORDER BY source ASC, doc_id ASC) AS rn
        FROM fp)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rn = 1 GROUP BY source
    """,
)
def q153_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked dedup survivor selection: exact-duplicate groups
    (normalized-text md5) keep the copy from the PREFERRED source
    (lowest source id here; in production, a source-priority ranking —
    the RefinedWeb 'keep the highest-quality duplicate' policy) rather
    than an arbitrary or min-id row. One shuffle on the fingerprint
    (`relational.dedup_keep_first` with an explicit priority order);
    per-source survivor counts are the mixing-relevant output."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.withColumn(
        "f",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ),
    )
    kept = R.dedup_keep_first(
        fp, ["f"], [F.col("source").asc(), F.col("doc_id").asc()]
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )



# ------------- 105. triangle counting (co-supply graph)

@q(
    "q163_triangle_count",
    """
    WITH pairs AS (
        SELECT least(a.l_suppkey, b.l_suppkey) AS lo,
               greatest(a.l_suppkey, b.l_suppkey) AS hi
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey < b.l_suppkey
        GROUP BY lo, hi HAVING count(*) >= 5),
    tri AS (
        SELECT 1
        FROM pairs ab
        JOIN pairs bc ON ab.hi = bc.lo
        JOIN pairs ac ON ac.lo = ab.lo AND ac.hi = bc.hi)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri
    """,
)
def q163_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics #3 (after components and PageRank): triangles
    in the FREQUENT-co-supply graph (supplier pairs sharing >= 5
    orders), via `operators/graph.py:triangle_count` — canonical a<b<c
    orientation so each triangle matches exactly once and wedge
    fan-out is bounded by ORIENTED degrees (the Suri-Vassilvitskii
    trick that stops hub vertices exploding the intermediate at
    scale). The weight threshold is the OTHER density lever: raw
    co-occurrence on this data is a near-complete graph (453k edges
    over 1k suppliers at sf0.1 — 160M wedges, measured 26s), while
    strong ties keep ~50k edges and ~2M wedges; thresholding before
    triangle enumeration is exactly what production co-occurrence
    analyses (market-basket, co-citation) do, because triangles in a
    near-clique carry no signal anyway. Value-oracled against DuckDB's
    three-way join formulation."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
    )
    return G.triangle_count(edges)



# ------------- 119. rank vs row_number tie semantics

@q(
    "q177_rank_tie_semantics",
    """
    WITH r AS (
        SELECT c_mktsegment, c_custkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY floor(c_acctbal / 1000) DESC,
                                           c_custkey ASC) AS rn
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY floor(c_acctbal / 1000) DESC))
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS topk_with_ties,
           CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS topk_exact,
           CAST(max(drnk) AS BIGINT) AS n_distinct_bands
    FROM r GROUP BY c_mktsegment
    """,
)
def q177_rank_tie_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number disambiguated on REAL ties
    (banded balances): 'top 3 WITH ties' (rank — returns more than 3
    when band boundaries tie), 'exactly 3' (row_number with an
    explicit tie-break — the only deterministic choice), and distinct
    tie-group count (dense_rank's max). Choosing the wrong one is the
    classic leaderboard bug; all three share ONE window shuffle. The
    deliberately tie-heavy ordering makes the engines' agreement on
    every count the proof that tie semantics match exactly."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    w_ties = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal_band").desc()
    )
    w_exact = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal_band").desc(), F.col("c_custkey").asc()
    )
    r = cust.select(
        "c_mktsegment",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.row_number().over(w_exact).alias("rn"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("rnk") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("topk_with_ties"),
        F.sum(F.when(F.col("rn") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("topk_exact"),
        F.max("drnk").cast("long").alias("n_distinct_bands"),
    )


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
    w = Window.partitionBy("component").orderBy(
        F.col("price_cents").desc(), F.col("p_partkey").asc()
    )
    canonical = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("p_partkey").alias("canonical_partkey"),
            F.col("p_name").alias("canonical_name"),
        )
    )
    rolled = members.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("price_cents").cast("long").alias("total_price_cents"),
    )
    return (
        rolled.join(canonical, "component")
        .filter(F.col("n_members") >= 3)
        .select(
            "component",
            "canonical_partkey",
            "canonical_name",
            "n_members",
            "total_price_cents",
        )
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
    return spark.createDataFrame(rows, "dim int, val long").orderBy("dim")


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
    corpus = emb.filter(F.col("vec_id") >= 50).select(
        "vec_id",
        F.pmod(F.col("vec_id"), F.lit(4)).alias("label"),
        F.col("embedding").alias("cv"),
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
    return spark.createDataFrame(
        [(n_edges, n_wedges, n_closed, permille)],
        "n_edges long, n_wedges long, n_closed long, closure_permille long",
    )
