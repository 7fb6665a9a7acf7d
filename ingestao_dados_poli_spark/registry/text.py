"""Text/corpus registry: tokenization, language/quality scoring, PII,
chunking/packing/sampling, boilerplate and span dedup, multimodal
decode, validation checkpoints.

Split out of the former monolithic queries.py (round 5) — every
block is verbatim; registration happens via the shared `q` decorator
from `._base`, so importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403



# -------------------------------------------------------- 8. quality suite

@q(
    "q17_null_counts",
    """
    SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_nulls,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey_nulls,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_nulls,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls
    FROM orders
    """,
)
def q17_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality primitive Q3: ALL null-checks in ONE aggregation pass
    (vs Great Expectations' job-per-expectation)."""
    orders = _t(spark, sf_dir, "orders")
    return null_counts(orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"])



@q(
    "q25_quality_score",
    """
    SELECT source,
           CAST(round(avg(
             (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.4 END)
           * (CASE WHEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                        / greatest(length(text), 1) <= 0.15 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                        / greatest(length(text), 1) <= 0.30 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) >= 10
                   THEN 1.0 ELSE 0.3 END)), 4) AS DOUBLE) AS avg_quality,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q25_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality scoring, aggregated by source."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.round(F.avg(TX.quality_score("text")), 4).alias("avg_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@q(
    "q34_lang_id",
    f"""
    WITH scored AS (
        SELECT lang AS lang_true,
               len(regexp_extract_all(lower(text), '{_LANG_RE["en"]}')) AS en_hits,
               len(regexp_extract_all(lower(text), '{_LANG_RE["es"]}')) AS es_hits,
               len(regexp_extract_all(lower(text), '{_LANG_RE["pt"]}')) AS pt_hits
        FROM documents)
    SELECT lang_true,
           CASE WHEN greatest(en_hits, es_hits, pt_hits) = 0 THEN 'und'
                WHEN pt_hits >= es_hits AND pt_hits >= en_hits THEN 'pt'
                WHEN es_hits >= en_hits THEN 'es'
                ELSE 'en' END AS lang_pred,
           count(*) AS n
    FROM scored GROUP BY lang_true, lang_pred
    """,
)
def q34_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-marker language ID confusion matrix against the documents
    table's ground-truth lang column. Ties break toward the
    lexicographically-largest language code (greatest over structs)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("lang").alias("lang_true"), TX.lang_id("text").alias("lang_pred")
    ).groupBy("lang_true", "lang_pred").agg(F.count(F.lit(1)).alias("n"))



@q(
    "q35_token_counts",
    f"""
    SELECT source,
           CAST(sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text,
                '{TX.TOKEN_PATTERN}'))) AS BIGINT) AS bpe_tokens
    FROM documents GROUP BY source
    """,
)
def q35_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting per source (the cost model any
    training-data pipeline runs before tokenizing for real)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(TX.n_tokens_ws("text")).cast("long").alias("ws_tokens"),
        F.sum(TX.n_tokens_bpe("text")).cast("long").alias("bpe_tokens"),
    )



# ------------------------------------------------- 17. quality suite run

@q(
    "q38_quality_suite",
    """
    SELECT 'not_null o_orderkey' AS rule,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unexpected
    FROM orders
    UNION ALL
    SELECT 'between o_totalprice [0.0, 1000000.0]' AS rule,
           CAST(sum(CASE WHEN o_totalprice IS NULL
                         OR o_totalprice NOT BETWEEN 0 AND 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS unexpected
    FROM orders
    UNION ALL
    SELECT 'values_in_set o_orderstatus in [''O'', ''F'', ''P'']' AS rule,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         AND o_orderstatus IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS unexpected
    FROM orders
    """,
)
def q38_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A whole expectation suite (reference Q3/Q5 + values_in_set) in ONE
    aggregation job; the report rows come back as a DataFrame."""
    orders = _t(spark, sf_dir, "orders")
    suite = Q.Suite(
        "validacao_orders",
        [
            Q.not_null("o_orderkey"),
            Q.between("o_totalprice", 0.0, 1_000_000.0),
            Q.values_in_set("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    report = Q.validate(orders, suite)
    rows = [
        (r["rule"], int(r.get("unexpected_count", 0))) for r in report["results"]
    ]
    return spark.createDataFrame(rows, "rule string, unexpected long")



@q("q49_stratified_sample")
def q49_stratified_sample(
    spark: SparkSession, sf_dir: str, fractions: dict | None = None
) -> DataFrame:
    """Per-source stratified sampling via Spark's native ``sampleBy``
    (rows-only: sampling RNG is engine-specific, so no cross-engine
    oracle): keep all of one source, thin the rest — the data-mixing
    primitive. ``fractions`` is an explicit config dict; the
    plan-building path has NO driver collect. The REPRODUCIBLE variant
    — membership by md5 hash threshold, identical across engines and
    fully value-oracled — is q134_deterministic_mix.

    Self-asserting (q129 pattern — the sampling itself can't be
    value-oracled, so the query carries its own proof): (a) the
    fraction-1.0 stratum must come back COMPLETE, (b) every sampled
    stratum count must lie within 6-sigma binomial bounds of
    fraction·n (a wrong-fraction or wrong-stratum regression lands
    far outside), (c) re-running the sample with the same seed must
    reproduce the per-stratum counts exactly (seeded determinism —
    the property that makes a sampled training mix re-buildable).
    The probes are tiny aggregates (one row per stratum)."""
    import math

    docs = _t(spark, sf_dir, "documents")
    fr = fractions or Q49_MIX_FRACTIONS
    sampled = R.stratified_sample(docs, "source", fr)
    out = sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))

    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r.source: r.n_sampled for r in out.collect()}
    rerun = {
        r.source: r.n_sampled
        for r in R.stratified_sample(docs, "source", fr)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .collect()
    }
    if got != rerun:
        raise AssertionError(f"seeded sample not deterministic: {got} != {rerun}")
    for src, n in totals.items():
        f = fr.get(src, 0.0)
        k = got.get(src, 0)
        if f >= 1.0 and k != n:
            raise AssertionError(f"fraction-1.0 stratum {src} incomplete: {k}/{n}")
        sigma = math.sqrt(n * f * (1 - f))
        if abs(k - n * f) > 6 * sigma + 1:
            raise AssertionError(
                f"stratum {src}: sampled {k} of {n} at f={f} "
                f"(expected {n * f:.1f} ± {6 * sigma:.1f})"
            )
    return out



# ------------------------------------------------- 23. PII / repetition

@q(
    "q53_pii_scrub",
    """
    WITH seeded AS (
        SELECT doc_id, source,
               text || CASE WHEN doc_id % 10 = 0
                            THEN ' contact: user' || doc_id || '@example.com or +1 (555) 010-' || doc_id
                            ELSE '' END AS text
        FROM documents),
    scrubbed AS (
        SELECT doc_id, source,
               len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]')) AS n_pii,
               length(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
                   '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '[REDACTED]', 'g')) AS len_after
        FROM seeded)
    SELECT source,
           CAST(sum(n_pii) AS BIGINT) AS total_pii,
           count(CASE WHEN n_pii > 0 THEN 1 END) AS docs_with_pii,
           CAST(sum(len_after) AS BIGINT) AS total_len_after
    FROM scrubbed GROUP BY source
    """,
)
def q53_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene pass: seed every 10th doc with an email+phone (the
    corpus has none), count PII spans, and measure post-redaction
    length. Scan-side regex only — no shuffle beyond the final agg."""
    docs = _t(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" contact: user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1 (555) 010-"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    stats = seeded.select(
        "source",
        TX.pii_count("text").alias("n_pii"),
        F.length(TX.scrub_pii("text")).alias("len_after"),
    )
    return stats.groupBy("source").agg(
        F.sum("n_pii").cast("long").alias("total_pii"),
        F.count(F.when(F.col("n_pii") > 0, 1)).alias("docs_with_pii"),
        F.sum("len_after").cast("long").alias("total_len_after"),
    )



@q("q40_media_features")
def q40_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (rows-only): Arrow-batched mapInPandas feature
    extraction over a deterministic synthetic media table.

    Self-asserting (q129 pattern — rows-only queries must carry their
    own proof): one sampled row's feature is recomputed DRIVER-SIDE
    from first principles — sha256 of the seed+id string (the payload
    construction) fed through the same digest featurizer — and the
    query fails loudly if the distributed Arrow path disagrees, so a
    plumbing regression can't return plausible-but-wrong rows."""
    import hashlib

    media = MM.synthetic_media(spark, n=256)
    feats = MM.extract_image_features(media, dim=8)
    out = feats.select(
        "media_id", "width", "height", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )
    probe = out.filter(F.col("media_id") == 7).collect()  # 1-row scalar probe
    # payload = sha2(concat('42', id)) hex string cast to binary = the
    # hex text's utf-8 bytes (synthetic_media's construction, seed 42)
    payload = hashlib.sha256(b"427").hexdigest().encode()
    expected = round(MM._fake_features(payload, 8)[0], 6)
    if len(probe) != 1 or abs(probe[0].f0 - expected) > 1e-9 or probe[0].n_bytes != len(payload):
        raise AssertionError(
            f"media feature self-check failed: got {probe}, expected f0={expected}"
        )
    return out



@q(
    "q68_column_profile",
    """
    SELECT 'c_custkey' AS column, sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_value,
           CAST(max(c_custkey) AS VARCHAR) AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END),
           CAST(count(DISTINCT c_mktsegment) AS BIGINT),
           CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END),
           CAST(count(DISTINCT c_nationkey) AS BIGINT),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
    FROM customer
    """,
)
def q68_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality.profile_columns: one-scan/one-shuffle column profiling
    (nulls, distincts, min/max) across heterogeneous column types —
    the reconnaissance step before writing expectation suites. The
    oracle computes each column's stats as separate scans; the engine
    does them all in ONE aggregation (distinct-agg Expand) and unpivots
    the single wide row with stack()."""
    customer = _t(spark, sf_dir, "customer")
    return Q.profile_columns(customer, ["c_custkey", "c_mktsegment", "c_nationkey"])



# -------------------- 30. corpus vocabulary / quality-filter / anomaly

@q(
    "q71_bigram_vocab",
    """
    WITH w AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    b AS (
        SELECT unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM w WHERE len(ws) >= 2)
    SELECT bigram, count(*) AS n_occurrences
    FROM b GROUP BY 1
    ORDER BY n_occurrences DESC, bigram ASC
    LIMIT 20
    """,
)
def q71_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram vocabulary (top-20): posexplode words, lead() over
    (doc, pos) to form bigrams, count. All-JVM (no interpreted HOF in
    the hot path — the per-doc window beats a transform() lambda at
    corpus scale); the only shuffles are the per-doc window and the
    final count. LIMIT ties broken by bigram text so the cut is
    deterministic across engines."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    words = docs.select("doc_id", F.posexplode(ws).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = words.select(
        F.concat_ws(" ", "word", F.lead("word").over(w)).alias("bigram"),
        F.lead("word").over(w).alias("_w2"),
    ).filter(F.col("_w2").isNotNull())
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
        .limit(20)
    )


@q(
    "q72_gopher_quality",
    f"""
    WITH feat AS (
        SELECT source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws,
               length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS n_word_chars
        FROM documents),
    flags AS (
        SELECT source,
               CASE WHEN len(ws) >= 5 AND len(ws) <= 50000
                     AND n_word_chars::DOUBLE / greatest(len(ws), 1) BETWEEN 2 AND 12
                     AND len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::DOUBLE
                         / greatest(len(ws), 1) >= 0.6
                     AND list_has_any(ws, {_STOPWORDS!r})
               THEN 1 ELSE 0 END AS passes
        FROM feat)
    SELECT source, count(*) AS n_docs,
           CAST(sum(passes) AS BIGINT) AS n_pass,
           CAST(round(sum(passes)::DOUBLE / count(*), 4) AS DOUBLE) AS pass_rate
    FROM flags GROUP BY source
    """,
)
def q72_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style document quality-filter chain: word count bounds,
    mean word length, alphabetic-word ratio, stopword presence — the
    standard pretraining-corpus gate — evaluated scan-side in one pass
    and aggregated per source. Ratios divide identical integers in both
    engines, so the boolean cut is float-order independent."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    feat = docs.select(
        "source",
        ws.alias("ws"),
        F.length(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
        ).alias("n_word_chars"),
    )
    n_words = F.size("ws")
    alpha_words = F.size(F.filter(F.col("ws"), lambda x: x.rlike("[a-z]")))
    # greatest(n, 1): ANSI Spark throws on /0 and boolean AND does not
    # guarantee short-circuit; n_words==0 already fails between(5, ...).
    safe_n = F.greatest(n_words, F.lit(1))
    passes = (
        n_words.between(5, 50000)
        & (F.col("n_word_chars").cast("double") / safe_n).between(2, 12)
        & (alpha_words.cast("double") / safe_n >= 0.6)
        & F.arrays_overlap("ws", F.array(*[F.lit(s) for s in _STOPWORDS]))
    )
    flags = feat.select("source", F.when(passes, 1).otherwise(0).alias("passes"))
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("passes").cast("long").alias("n_pass"),
        F.round(
            F.sum("passes").cast("double") / F.count(F.lit(1)), 4
        ).alias("pass_rate"),
    )


@q(
    "q80_psi_drift",
    f"""
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / {_PSI_WIDTH}) AS BIGINT),
                     {_PSI_BINS - 1}) AS bin,
               o_orderpriority AS prio
        FROM orders
        WHERE o_orderpriority IN ('{_PSI_PRIO_A}', '{_PSI_PRIO_B}')),
    spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin),
    counts AS (
        SELECT s.bin,
               CAST(sum(CASE WHEN b.prio = '{_PSI_PRIO_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN b.prio = '{_PSI_PRIO_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM spine s LEFT JOIN binned b ON s.bin = b.bin GROUP BY 1),
    tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM counts),
    terms AS (
        SELECT ((ca + 0.5) / (ta + 0.5 * {_PSI_BINS})
              - (cb + 0.5) / (tb + 0.5 * {_PSI_BINS}))
             * ln(((ca + 0.5) / (ta + 0.5 * {_PSI_BINS}))
                / ((cb + 0.5) / (tb + 0.5 * {_PSI_BINS}))) AS term
        FROM counts, tot)
    SELECT CAST({_PSI_BINS} AS BIGINT) AS n_bins,
           CAST(round(sum(term), 6) AS DOUBLE) AS psi
    FROM terms
    """,
)
def q80_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift metric between two slices
    (order-price distribution of URGENT vs LOW priority orders) over a
    fixed bin grid: one scan builds both binned histograms via
    conditional aggregation, a literal bin spine guarantees every bin
    exists, Laplace smoothing (+0.5) keeps empty bins finite. PSI is
    THE production drift gate for feature pipelines; everything here is
    scan-side + one tiny agg, so it costs one pass at any scale."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_PSI_PRIO_A, _PSI_PRIO_B)
    )
    binned = orders.select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("long"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        F.col("o_orderpriority").alias("prio"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    # aggregate the fact FIRST (map-side-combined, <= n_bins rows), then
    # join the tiny histogram to the spine — never shuffle the fact on a
    # 10-key (skewed) bin column.
    hist = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("prio") == _PSI_PRIO_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("prio") == _PSI_PRIO_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    counts = spine.join(hist, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    sm = 0.5 * _PSI_BINS
    pa = (F.col("ca") + 0.5) / (F.col("ta") + sm)
    pb = (F.col("cb") + 0.5) / (F.col("tb") + sm)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        ((pa - pb) * F.log(pa / pb)).alias("term")
    )
    return terms.agg(
        F.lit(_PSI_BINS).cast("long").alias("n_bins"),
        F.round(F.sum("term"), 6).alias("psi"),
    )



# ------------------------------------------- 35. corpus prep: chunking

@q(
    "q82_doc_chunking",
    """
    WITH starts AS (
        SELECT doc_id, source,
               unnest(generate_series(1, greatest(length(text), 1), 150))
                   AS chunk_start,
               text
        FROM documents)
    SELECT doc_id, source,
           CAST((chunk_start - 1) // 150 AS INTEGER) AS chunk_id,
           CAST(chunk_start AS INTEGER) AS chunk_start,
           substr(text, chunk_start, 200) AS chunk_text
    FROM starts
    """,
)
def q82_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunking (200-char windows, 50-char
    overlap → stride 150): sequence+explode+substring, all scan-side
    codegen, zero shuffles — the context-window prep stage before
    embedding/tokenization. Oracle recomputes with generate_series +
    substr (both engines define substring as 1-based length-capped)."""
    docs = _t(spark, sf_dir, "documents")
    return CO.chunk_documents(
        docs, chunk_size=200, overlap=50
    ).select(
        "doc_id",
        "source",
        "chunk_id",
        F.col("chunk_start").cast("int").alias("chunk_start"),
        "chunk_text",
    )



# ------------------------------------- 37. corpus prep: sequence packing

@q(
    "q84_sequence_packing",
    """
    SELECT doc_id, source,
           CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING)
                - n_chars AS BIGINT) AS token_offset,
           CAST((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)
                 - n_chars) // 2000 AS BIGINT) AS pack_id
    FROM documents
    """,
)
def q84_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (GPT-style): documents laid
    end-to-end per source shard in doc_id order; pack_id =
    floor(start_offset / 2000). ONE shuffle (on source) then a linear
    windowed cumsum per shard — never a global order, so shards pack
    in parallel at any scale. Weight column is n_chars (the packing
    math is weight-agnostic)."""
    docs = _t(spark, sf_dir, "documents")
    return CO.pack_sequences(
        docs,
        partition_cols=["source"],
        order_col="doc_id",
        token_col="n_chars",
        budget=2000,
    ).select("doc_id", "source", "token_offset", "pack_id")



# --------------------------------------- 38. corpus prep: token entropy

@q(
    "q85_token_entropy",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS tok
        FROM documents),
    counts AS (
        SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS DOUBLE)
               AS entropy_bits
    FROM counts GROUP BY doc_id
    """,
)
def q85_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    low-entropy tail is boilerplate/spam (complements Gopher rules,
    q72). Two map-side-combined shuffles on doc-prefixed keys; the
    H = log2(T) − Σn·log2 n / T identity avoids per-token division.
    Oracle recomputes token counts via unnest."""
    docs = _t(spark, sf_dir, "documents")
    return CO.token_entropy(docs)



# ------------------------------------ 39. corpus prep: token blacklist

@q(
    "q86_token_filter",
    """
    WITH kept AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '),
                           t -> length(t) >= 3
                                AND NOT list_contains(['the', 'a'], t))
                   AS toks
        FROM documents)
    SELECT doc_id,
           CAST(length(toks) AS BIGINT) AS n_kept_tokens,
           array_to_string(toks, ' ') AS clean_text
    FROM kept
    """,
)
def q86_token_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style in-document cleanup re-expressed at token granularity
    (this corpus is one line per doc): drop blacklisted/too-short
    tokens, reassemble. The filter() higher-order function with a
    literal lambda stays in whole-stage codegen — no explode, no
    shuffle, no UDF."""
    docs = _t(spark, sf_dir, "documents")
    return CO.token_filter(
        docs, blacklist=["the", "a"], min_len=3
    ).select("doc_id", "n_kept_tokens", "clean_text")



# ------------------------------- 40. corpus prep: per-group sampling

@q(
    "q87_group_sample",
    """
    SELECT doc_id, source, lang
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
    """,
)
def q87_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sample of exactly 20 docs: rank by
    md5(id) inside each group — reservoir-sampling semantics with no
    RNG state, identical rows on rerun/backfill (what a data-mixing
    stage needs). One shuffle on the group key; oracle is the same
    rank in DuckDB, so the sampled SET is hash-checked, not just its
    size."""
    docs = _t(spark, sf_dir, "documents")
    return CO.group_sample(
        docs, group_cols=["source"], id_col="doc_id", n=20
    ).select("doc_id", "source", "lang")



# ----------------------- 47. boilerplate n-gram detection (corpus-wide)

@q(
    "q94_boilerplate_ngrams",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS ngram
        FROM toks, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
    ),
    freq AS (SELECT ngram, count(*) AS doc_freq FROM grams GROUP BY ngram)
    SELECT ngram, CAST(doc_freq AS BIGINT) AS doc_freq
    FROM freq
    ORDER BY doc_freq DESC, ngram
    LIMIT 20
    """,
)
def q94_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate detection: 5-grams ranked by the number
    of DISTINCT documents containing them — the pre-pass an LLM data
    pipeline runs to find repeated headers/footers/licenses worth
    stripping. Routed through ``corpus.boilerplate_ngrams`` (string
    key — the measured-better default: one scan, one map-side-combined
    shuffle; see the operator docstring for the scale_smoke numbers
    that demoted the hash-keyed variant to opt-in). Exact
    lexicographic tie-break at equal doc_freq is what DuckDB computes.
    The two variants are equivalence-tested in test_corpus.py and
    timed + shuffle-byte-measured side-by-side in
    tools/scale_smoke.py."""
    from ingestao_dados_poli_spark.operators.corpus import boilerplate_ngrams

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_ngrams(docs, n=5, top_k=20, hash_key=False)



# --------------------- 50. real media decode (dependency-free codecs)

@q("q97_media_decode")
def q97_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL multimodal decode with no codec libs (rows-only:
    byte parsing isn't SQL-expressible): payloads are actual encoded
    P6 netpbm images, decoded pixel-for-pixel with numpy inside the
    same Arrow-batched mapInPandas plumbing the sha256 fake stands in
    for elsewhere — byte gen, decode, and strip-mean featurization all
    run distributed, zero driver involvement. The value contract
    (decode(encode(x)) == x, exact strip means) is pytest-verified in
    test_similarity_multimodal/test_layout."""
    media = MM.synthetic_ppm_media(spark, n=256, width=32, height=16)
    feats = MM.extract_image_features(
        media, dim=8, featurizer=MM.ppm_featurizer(8)
    )
    out = feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f_first"),
        F.round(F.element_at("features", 8), 6).alias("f_last"),
    )
    # Self-asserting (q129 pattern): ONE sampled payload is collected
    # (1.5 KB scalar probe) and re-decoded driver-side in PURE PYTHON —
    # independent header parse, raster walk, grayscale and strip means
    # with plain floats, no numpy, no shared code with the distributed
    # featurizer — so a decode/featurize regression in the Arrow path
    # cannot return plausible rows. Tolerance 2e-6 absorbs float32
    # (executor) vs float64 (probe) accumulation.
    raw = media.filter(F.col("media_id") == 11).select("payload").collect()
    got = out.filter(F.col("media_id") == 11).collect()
    payload = bytes(raw[0].payload)
    toks, i = [], 2
    while len(toks) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1
    w, h, _maxval = toks
    gray = [
        sum(payload[i + (r * w + c) * 3 + k] for k in range(3)) / 3.0 / 255.0
        for r in range(h)
        for c in range(w)
    ]
    def strip_mean(k: int, dim: int = 8) -> float:
        lo, hi = (w * k) // dim, max((w * (k + 1)) // dim, (w * k) // dim + 1)
        vals = [gray[r * w + c] for r in range(h) for c in range(lo, hi)]
        return sum(vals) / len(vals)
    if (
        len(got) != 1
        or abs(got[0].f_first - strip_mean(0)) > 2e-6
        or abs(got[0].f_last - strip_mean(7)) > 2e-6
    ):
        raise AssertionError(
            f"PPM decode self-check failed: got {got}, expected "
            f"({strip_mean(0):.6f}, {strip_mean(7):.6f})"
        )
    return out



# --------------------- 51. training-data mixture weights (temperature)

@q(
    "q98_mixture_weights",
    """
    WITH g AS (
      SELECT lang, source, count(*) AS n_docs
      FROM documents GROUP BY 1, 2
    ),
    w AS (
      SELECT lang, source, n_docs,
             pow(n_docs / sum(n_docs) OVER (), 0.5) AS wr
      FROM g
    )
    SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(round(wr / sum(wr) OVER (), 6) AS DOUBLE) AS mix_weight
    FROM w
    """,
)
def q98_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing weights per (lang, source) cell:
    w = p^alpha / sum(p^alpha) with alpha=0.5 — the standard upweighting
    of low-resource slices when composing a training mix. ONE raw scan
    (map-side-combined groupBy); the two global sums run as
    unpartitioned windows over the GROUPED table, whose cardinality is
    the mixture-cell count (langs x sources — config-bounded, dozens),
    so the single-partition window is over a handful of rows at any
    corpus size."""
    docs = _t(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    g = g.withColumn(
        "_wr", F.pow(F.col("n_docs") / F.sum("n_docs").over(w_all), 0.5)
    )
    return g.select(
        "lang",
        "source",
        "n_docs",
        F.round(F.col("_wr") / F.sum("_wr").over(w_all), 6).alias("mix_weight"),
    )



# --------------------- 63. deterministic temperature-weighted sampling

@q(
    "q110_weighted_sample",
    """
    WITH g AS (
        SELECT lang, source, count(*) AS n_docs
        FROM documents GROUP BY 1, 2
    ),
    w AS (
        SELECT lang, source, n_docs,
               pow(n_docs / sum(n_docs) OVER (), 0.5) AS wr
        FROM g
    ),
    p AS (
        SELECT lang, source,
               least(1.0, 200.0 * (wr / sum(wr) OVER ()) / n_docs)
                   AS keep_prob
        FROM w
    ),
    d AS (
        SELECT d.lang AS lang, d.source AS source,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1048576) / 1048576.0 AS u,
               p.keep_prob AS keep_prob
        FROM documents d
        JOIN p ON d.lang = p.lang AND d.source = p.source
    )
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_kept
    FROM d WHERE u < keep_prob GROUP BY 1, 2
    """,
)
def q110_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize q98's temperature mixture as an ACTUAL deterministic
    subsample (corpus.weighted_sample): per-cell keep probabilities from
    the p^0.5 weights, membership by md5 unit hash — so DuckDB
    reproduces the EXACT same kept set row for row (hash-checked here),
    which is what makes a 100 TB training-mix materialization resumable
    and auditable. rand()-based sampleBy can't cross that bar."""
    docs = _t(spark, sf_dir, "documents")
    kept = CO.weighted_sample(
        docs,
        group_cols=["lang", "source"],
        id_col="doc_id",
        target_rows=200.0,
        alpha=0.5,
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept")
    )



# --------------------- 64. rolling median (percentile as window fn)

@q(
    "q111_rolling_median",
    """
    SELECT event_id, user_id,
           CAST(round(quantile_cont(value, 0.5) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ), 4) AS DOUBLE) AS rolling_median
    FROM events WHERE user_id < 50
    """,
)
def q111_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-event median per user — exact percentile as a WINDOW
    aggregate (Spark recomputes the frame per row; fine for bounded
    rows-frames, and the robust-statistics answer to q100's mean, which
    outliers drag). Deterministic ROWS frame via the (ts, event_id)
    tie-break; oracle uses DuckDB's quantile_cont with the identical
    frame and interpolation."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias(
            "rolling_median"
        ),
    )



# --------------------- 81. k-anonymity / l-diversity privacy audit

@q(
    "q139_k_anonymity",
    """
    SELECT c_mktsegment, c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                AS BIGINT) AS l_div,
           count(*) >= 10 AS satisfies_k
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def q139_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical re-identification audit (`operators/privacy.py`):
    k-anonymity + l-diversity per quasi-identifier group over customer
    (QI = segment x nation, sensitive = banded account balance). One
    map-side-combined shuffle; the companion suppress_below_k drops
    whole violating groups (k-anonymous by construction — proven in
    test_privacy). Complements q53's literal PII scrub: scrubbing
    removes identifiers, this measures the JOIN-attack surface of what
    remains — the check a training-data release gate runs."""
    from ingestao_dados_poli_spark.operators import privacy as PV

    cust = _t(spark, sf_dir, "customer").withColumn(
        "acct_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    rep = PV.k_anonymity_report(
        cust, ["c_mktsegment", "c_nationkey"], k=10, sensitive_col="acct_band"
    )
    return rep.select(
        "c_mktsegment",
        "c_nationkey",
        F.col("n").cast("long").alias("n"),
        F.col("l_div").cast("long").alias("l_div"),
        "satisfies_k",
    )



# ------------- 97. cross-table reconciliation report

@q(
    "q155_order_reconciliation",
    """
    WITH li AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS li_net,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey),
    classed AS (
        SELECT o.o_orderkey,
               CASE
                 WHEN li.l_orderkey IS NULL THEN 'no_lines'
                 WHEN abs(o.o_totalprice - li.li_net) <= 0.01 * o.o_totalprice
                      THEN 'reconciled'
                 ELSE 'mismatch'
               END AS status
        FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
    SELECT status, CAST(count(*) AS BIGINT) AS n_orders
    FROM classed GROUP BY status
    """,
)
def q155_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation — the referential CONTENT
    check beyond q105's key-existence FK check: every order's header
    total against the sum of its lines' net amounts, classified
    reconciled / mismatch / no_lines with a relative tolerance. One
    map-side-combined pre-aggregation of the fact side, then a join at
    ORDER grain (never line grain) — the pre-agg-before-join ordering
    that keeps the join input |orders|, not |lineitem|, at 100 TB. The
    report is the per-status count a close-of-books gate consumes
    (whatever the synthetic data's actual reconciliation rate, the
    CLASSIFICATION is deterministic — that is what the oracle checks).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    li_net = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("li_net")
    )
    classed = orders.join(
        li_net, orders.o_orderkey == li_net.l_orderkey, "left"
    ).select(
        F.when(F.col("l_orderkey").isNull(), "no_lines")
        .when(
            F.abs(F.col("o_totalprice") - F.col("li_net"))
            <= 0.01 * F.col("o_totalprice"),
            "reconciled",
        )
        .otherwise("mismatch")
        .alias("status")
    )
    return classed.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )



# ------------- 100. tokenize to vocabulary ids

@q(
    "q158_tokenize_ids",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
    vocab AS (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w ASC) AS id
        FROM tok GROUP BY w
        ORDER BY count(*) DESC, w ASC LIMIT 10),
    mapped AS (
        SELECT t.doc_id, coalesce(v.id, 0) AS id
        FROM tok t LEFT JOIN vocab v ON t.w = v.w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           CAST(sum(id) AS BIGINT) AS ids_checksum
    FROM mapped GROUP BY doc_id
    """,
)
def q158_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize-to-ids step between corpus prep and sequence
    packing: build a frequency-ranked vocabulary (top-10 here so the
    unknown path is exercised; production vocabs just raise the
    limit), broadcast it, and map every token to its id with unknowns
    at 0. Two shuffles total — the vocab count and the per-doc
    rollup; the token->id join is a broadcast of the (tiny by
    definition) vocab, so the corpus never shuffles for the mapping.
    Output is per-doc (n_tokens, n_unk, ids_checksum) — the checksum
    form keeps the oracle order-insensitive."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("w").asc())
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("id", F.row_number().over(w_rank))
        .filter(F.col("id") <= 10)
        .select("w", "id")
    )
    mapped = tok.join(F.broadcast(vocab), "w", "left").select(
        "doc_id", F.coalesce(F.col("id"), F.lit(0)).alias("id")
    )
    return mapped.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("id") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_unk"),
        F.sum("id").cast("long").alias("ids_checksum"),
    )



# ------------- 127. quality-history trend over versioned report snapshots

@q(
    "q185_quality_trend",
    """
    WITH v1 AS (
        SELECT count(*) FILTER (WHERE lang IS NULL) AS null_lang,
               count(*) FILTER (WHERE n_chars < 30) AS short_docs,
               count(*) AS row_count
        FROM documents),
    v2 AS (
        SELECT count(*) FILTER (WHERE doc_id % 5 = 0 OR lang IS NULL)
                   AS null_lang,
               count(*) FILTER (WHERE n_chars < 30) AS short_docs,
               count(*) AS row_count
        FROM documents)
    SELECT 'null_lang' AS metric,
           CAST(v1.null_lang AS BIGINT) AS v1_violations,
           CAST(v2.null_lang AS BIGINT) AS v2_violations,
           CAST(v2.null_lang - v1.null_lang AS BIGINT) AS delta
    FROM v1, v2
    UNION ALL
    SELECT 'short_docs',
           CAST(v1.short_docs AS BIGINT),
           CAST(v2.short_docs AS BIGINT),
           CAST(v2.short_docs - v1.short_docs AS BIGINT)
    FROM v1, v2
    """,
)
def q185_quality_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality HISTORY, not just a point-in-time report: run the suite
    against two data versions (v2 simulates an upstream regression —
    every 5th doc loses its lang tag), persist each GX-shaped report
    as a snapshot of a versioned quality-history table, then read the
    history back and emit the per-metric violation TREND — the
    time-series a data-SLO dashboard alerts on, derived entirely from
    committed report snapshots (one tiny config-sized DataFrame per
    run, never a rescan of the data). Oracled against direct
    recomputation of both versions' violation counts."""
    import os as _os
    import shutil as _shutil

    from ingestao_dados_poli_spark import quality as Q_
    from ingestao_dados_poli_spark.sources import versioned as V

    base = f"/tmp/q185_qh_{_os.getpid()}"
    hist = base + "/quality_history"
    _shutil.rmtree(base, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    degraded = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("lang")),
    )
    suite = Q_.Suite(
        "docs_slo",
        [Q_.not_null("lang"), Q_.between("n_chars", 30, float("inf"))],
    )
    metric_names = ["null_lang", "short_docs"]
    for ver, frame in ((1, docs), (2, degraded)):
        report = Q_.validate(frame, suite)
        rows = [
            (ver, metric_names[i], int(res.get("unexpected_count", 0)))
            for i, res in enumerate(report["results"])
        ]
        snap = spark.createDataFrame(
            rows, "run long, metric string, violations long"
        )
        V.publish(spark, snap, hist)
    history = V.read_version(spark, hist, 1).unionByName(
        V.read_version(spark, hist, 2)
    )
    pivoted = (
        history.groupBy("metric")
        .pivot("run", [1, 2])
        .agg(F.first("violations"))
        .select(
            "metric",
            F.col("1").cast("long").alias("v1_violations"),
            F.col("2").cast("long").alias("v2_violations"),
            (F.col("2") - F.col("1")).cast("long").alias("delta"),
        )
    )
    return pivoted



# ------------- 128. per-source phrase profile (grouped bigram top-k)

@q(
    "q186_source_top_bigrams",
    """
    WITH toks AS (
        SELECT source, doc_id, string_split(text, ' ') AS ws
        FROM documents),
    bg AS (
        SELECT source,
               ws[i] || ' ' || ws[i + 1] AS bigram
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
    counted AS (
        SELECT source, bigram, count(*) AS n
        FROM bg GROUP BY source, bigram),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY n DESC, bigram ASC) AS rn
        FROM counted)
    SELECT source, bigram, CAST(n AS BIGINT) AS n
    FROM ranked WHERE rn <= 3
    """,
)
def q186_source_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source phrase profiling: top-3 bigrams per source — the
    per-domain signature a corpus-mixing report shows next to the
    GLOBAL vocabulary (q71). In-row bigram expansion via
    transform(sequence) — no posexplode+lead self-alignment — then one
    map-side-combined (source, bigram) count shuffle and a window over
    the already-aggregated counts (window input is |distinct bigrams|,
    never |tokens|). Exact lexicographic tie-break, same as DuckDB's."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1)
        ),
    )
    counted = (
        docs.select("source", F.explode(bigrams).alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("bigram").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "bigram", F.col("n").cast("long").alias("n"))
    )



# ------------- 129. monthly median trend per priority (grouped quantiles)

@q(
    "q187_monthly_median_trend",
    """
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
               AS month,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                AS DOUBLE) AS median_cents
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY 1, 2
    """,
)
def q187_monthly_median_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust central-tendency trend: monthly MEDIAN order value per
    priority (medians don't chase the heavy tail averages do — the
    metric a pricing dashboard actually wants). A plain grouped exact
    percentile — one map-side-combined shuffle on (month, priority),
    NO window — with the year filter pushed to the scan. Computed over
    INTEGER CENTS: an even-count median interpolates to k or exactly
    k.5, both binary-exact doubles, so the engines match with NO
    rounding guard (rounding a 2-dp-valued midpoint is the one place
    round(x, 2) itself is ulp-unstable — found by this query's first
    oracle run). The 100 TB swap is percentile_approx (q64's
    documented trade)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.percentile(
                F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(0.5)
            )
            .cast("double")
            .alias("median_cents"),
        )
    )



# --------- 132. LM-perplexity quality tiers / BPE merge induction

# Perplexity-tier cut points, in millibits of mean per-token negative
# log2-likelihood. CONFIGURATION (a real pipeline fixes these from a
# held-out calibration run), shared verbatim by the Spark query and
# the SQL oracle below.
_Q192_VOCAB_K = 20

_Q192_HEAD = 7800.0

_Q192_TAIL = 8300.0


@q(
    "q192_perplexity_tiers",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    tok AS (SELECT doc_id, source, unnest(ws) AS word
            FROM w WHERE len(ws) > 0),
    wc AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM wc),
    vocab AS (SELECT word, freq FROM wc
              ORDER BY freq DESC, word LIMIT {_Q192_VOCAB_K}),
    scored AS (
        SELECT t.doc_id, t.source,
               CASE WHEN v.word IS NOT NULL
                    THEN CAST(round(1000 * log2(tot.total / v.freq)) AS BIGINT)
                    ELSE CAST(round(1000 * log2(tot.total)) AS BIGINT)
               END AS nll
        FROM tok t CROSS JOIN tot LEFT JOIN vocab v USING (word)),
    doc AS (SELECT doc_id, source, sum(nll) AS doc_nll, count(*) AS n_tok
            FROM scored GROUP BY 1, 2),
    tiered AS (
        SELECT source,
               CASE WHEN doc_nll::DOUBLE / n_tok < {_Q192_HEAD} THEN 'head'
                    WHEN doc_nll::DOUBLE / n_tok < {_Q192_TAIL} THEN 'middle'
                    ELSE 'tail' END AS tier,
               doc_nll, n_tok
        FROM doc)
    SELECT source, tier,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_nll) AS BIGINT) AS sum_nll_millibits,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           CAST(round(sum(doc_nll)::DOUBLE / sum(n_tok), 2) AS DOUBLE)
               AS mean_nll_millibits
    FROM tiered GROUP BY 1, 2
    """,
)
def q192_perplexity_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-perplexity quality tiering (Wenzek et al. 2020):
    score every document by mean per-token negative log-likelihood
    under a unigram LM, cut the corpus into head/middle/tail tiers —
    the standard pretraining-data quality split. Spark-first shape:
    ONE tiny map-side-combined shuffle builds the word-frequency model,
    the top-K vocab (20 rows) and the token total come back as a tiny
    driver artifact, and scoring is then a PURE MAP — the vocab rides
    into the plan as a literal map<word,freq> and per-doc NLL is an
    in-row transform+aggregate over the token array, so the 100 TB
    document scan is never exploded, joined, or re-shuffled per token
    (vs the oracle's explode+join formulation). Final per-(source,
    tier) rollup is the only other shuffle. Float discipline: NLL is
    quantized to INTEGER millibits per token (round(1000*log2(...)))
    so every downstream sum is exact integer math and the tier
    comparison divides identical integers in both engines; the one
    rounded double output divides two integer sums."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    tokens = docs.select(F.explode(ws).alias("word"))
    wc = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    # Two driver-side scalars off the vocab-sized agg result: the top-K
    # model rows and the corpus token total (1 row) — tiny artifacts,
    # same discipline as quality.py's checkpoint collect.
    vocab_rows = (
        wc.orderBy(F.col("freq").desc(), F.col("word")).limit(_Q192_VOCAB_K).collect()
    )
    total = float(wc.agg(F.sum("freq")).collect()[0][0])
    model = F.create_map(
        *[F.lit(x) for r in vocab_rows for x in (r["word"], r["freq"])]
    )
    oov_nll = F.round(F.log2(F.lit(total)) * 1000).cast("long")

    def _tok_nll(t):
        freq = F.element_at(model, t)
        return F.when(
            freq.isNotNull(),
            F.round(F.log2(F.lit(total) / freq) * 1000).cast("long"),
        ).otherwise(oov_nll)

    scored = (
        docs.select("source", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "source",
            F.aggregate(
                F.transform(F.col("ws"), _tok_nll),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("doc_nll"),
            F.size("ws").cast("long").alias("n_tok"),
        )
    )
    mean_nll = F.col("doc_nll").cast("double") / F.col("n_tok")
    tiered = scored.withColumn(
        "tier",
        F.when(mean_nll < _Q192_HEAD, "head")
        .when(mean_nll < _Q192_TAIL, "middle")
        .otherwise("tail"),
    )
    return tiered.groupBy("source", "tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_nll").cast("long").alias("sum_nll_millibits"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.round(
            F.sum("doc_nll").cast("double") / F.sum("n_tok"), 2
        ).cast("double").alias("mean_nll_millibits"),
    )


@q(
    "q193_bpe_merge_pairs",
    """
    WITH w AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    tok AS (SELECT unnest(ws) AS word FROM w),
    wc AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
    pairs AS (
        SELECT unnest(list_transform(
                   range(1, length(word)),
                   i -> substr(word, i, 1) || ' ' || substr(word, i + 1, 1)))
                   AS pair,
               freq
        FROM wc WHERE length(word) >= 2)
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY 1
    ORDER BY n_occurrences DESC, pair ASC
    LIMIT 20
    """,
)
def q193_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round (Sennrich et al. 2016): corpus-weighted
    adjacent-character-pair frequencies — the statistic a byte-pair
    tokenizer trainer computes each round to pick the next merge.
    Spark-first shape: the corpus scan collapses to word counts FIRST
    (one tiny map-side-combined shuffle — the pair enumeration then
    runs over the DISTINCT VOCABULARY weighted by freq, not over 100 TB
    of raw text), pairs are derived in-row from sequence()+substr (all
    JVM codegen, no UDF), and the final count groups on the tiny
    character-pair domain. Global top-20 with ties broken by pair text
    so the cut is deterministic across engines."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    wc = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("word") >= 2)
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.col("word").substr(i, F.lit(1)),
                    F.col("word").substr(i + 1, F.lit(1)),
                ),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(20)
    )


_Q195_BUCKETS = 16

_Q195_TARGET_SRC = "src0"


@q(
    "q195_dsir_importance",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    tok AS (SELECT doc_id, source, unnest(ws) AS word
            FROM w WHERE len(ws) > 0),
    b AS (SELECT doc_id, source,
                 CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT)
                     % {_Q195_BUCKETS} AS bucket
          FROM tok),
    dist AS (SELECT bucket, count(*) AS r_n,
                    sum(CASE WHEN source = '{_Q195_TARGET_SRC}'
                             THEN 1 ELSE 0 END) AS t_n
             FROM b GROUP BY 1),
    tots AS (SELECT sum(r_n) AS r_tot, sum(t_n) AS t_tot FROM dist),
    lr AS (SELECT bucket,
                  CAST(round(1000 * log2(
                      ((t_n + 1)::DOUBLE / (t_tot + {_Q195_BUCKETS}))
                      / ((r_n + 1)::DOUBLE / (r_tot + {_Q195_BUCKETS}))))
                       AS BIGINT) AS lr
           FROM dist CROSS JOIN tots),
    docw AS (SELECT doc_id, source, sum(lr) AS w, count(*) AS n_tok
             FROM b JOIN lr USING (bucket) GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS sum_weight_millibits,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_target_like
    FROM docw GROUP BY 1
    """,
)
def q195_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via hashed importance resampling (Xie
    et al. 2023): estimate target-domain vs raw-corpus unigram
    distributions over HASHED feature buckets (md5 → 16 buckets, the
    cross-engine-stable conv/substr hash), weight every document by its
    tokens' summed log-ratio, and count the target-like (weight > 0)
    docs per source — the published recipe for picking pretraining data
    that "looks like" a small high-quality target set (here: src0).
    Spark-first shape mirrors q192: ONE map-side-combined 16-group
    shuffle estimates both distributions (conditional sums in the same
    agg — no second scan for the target), the 16 log-ratios come back
    as a tiny driver artifact WITH the rounding done engine-side
    (Python's round() is banker's; Spark/DuckDB round half-up — doing
    it driver-side was this query's first bug), and scoring is a pure
    in-row transform+aggregate over each doc's token array against the
    literal bucket→ratio map: the 100 TB scan is never exploded for
    scoring. Integer-millibit quantization keeps every sum exact."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )

    def _bucket(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            F.lit(_Q195_BUCKETS),
        )

    toks = docs.select("source", F.explode(ws).alias("word"))
    dist = toks.groupBy(_bucket(F.col("word")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("r_n"),
        F.sum(
            F.when(F.col("source") == _Q195_TARGET_SRC, 1).otherwise(0)
        ).alias("t_n"),
    )
    r_tot, t_tot = dist.agg(F.sum("r_n"), F.sum("t_n")).collect()[0]
    lr_rows = dist.select(
        "bucket",
        F.round(
            F.log2(
                ((F.col("t_n") + 1) / F.lit(float(t_tot + _Q195_BUCKETS)))
                / ((F.col("r_n") + 1) / F.lit(float(r_tot + _Q195_BUCKETS)))
            )
            * 1000
        )
        .cast("long")
        .alias("lr"),
    ).collect()
    lr_map = F.create_map(
        *[F.lit(x) for r in lr_rows for x in (r["bucket"], r["lr"])]
    )
    scored = (
        docs.select("source", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "source",
            F.aggregate(
                F.transform(
                    F.col("ws"),
                    lambda t: F.coalesce(
                        F.element_at(lr_map, _bucket(t)), F.lit(0).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("w"),
            F.size("ws").cast("long").alias("n_tok"),
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_weight_millibits"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_target_like"),
    )


@q(
    "q206_novelty_decay",
    """
    WITH d AS (
        SELECT source, doc_id,
               ntile(10) OVER (PARTITION BY source ORDER BY doc_id)
                   AS decile,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents),
    tok AS (SELECT source, decile, unnest(ws) AS word FROM d),
    tot AS (SELECT source, decile, count(*) AS n_tokens
            FROM tok GROUP BY 1, 2),
    firsts AS (SELECT source, word, min(decile) AS first_decile
               FROM tok GROUP BY 1, 2),
    novel AS (SELECT source, first_decile AS decile,
                     count(*) AS n_novel_words
              FROM firsts GROUP BY 1, 2)
    SELECT tot.source, CAST(tot.decile AS INT) AS decile,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(n_novel_words, 0) AS BIGINT) AS n_novel_words
    FROM tot LEFT JOIN novel
      ON tot.source = novel.source AND tot.decile = novel.decile
    """,
)
def q206_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-saturation curve: docs are split into 10 per-source
    deciles by ingest order, and each decile reports its token volume
    and how many words appear there for the FIRST time — the
    diminishing-novelty signal dataset curators read before deciding
    whether more of a source is worth crawling (a flat tail means new
    data is mostly repetition). All-integer outputs; ntile's
    deterministic floor split and the min-decile first-occurrence make
    the cut identical across engines. Scale shape: one window on
    (source, doc order), then two map-side-combined aggregations over
    (source, decile) and (source, word) — the (source, word) agg is
    vocabulary-sized, not corpus-sized, after the map-side combine."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    d = docs.select(
        "source",
        F.ntile(10)
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .cast("int")
        .alias("decile"),
        ws.alias("ws"),
    )
    tok = d.select("source", "decile", F.explode("ws").alias("word"))
    tot = tok.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    firsts = tok.groupBy("source", "word").agg(F.min("decile").alias("decile"))
    novel = firsts.groupBy("source", "decile").agg(
        F.count(F.lit(1)).alias("n_novel_words")
    )
    return tot.join(novel, ["source", "decile"], "left").select(
        "source",
        "decile",
        "n_tokens",
        F.coalesce("n_novel_words", F.lit(0)).cast("long").alias("n_novel_words"),
    )


@q(
    "q212_zipf_slope",
    """
    WITH w AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+'),
                                  x -> x <> '')) AS word
        FROM documents),
    wc AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
    ranked AS (SELECT word, freq,
                      row_number() OVER (ORDER BY freq DESC, word ASC)
                          AS rank
               FROM wc),
    pts AS (SELECT CAST(round(1000 * log2(rank)) AS BIGINT) AS x,
                   CAST(round(1000 * log2(freq)) AS BIGINT) AS y
            FROM ranked),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM pts)
    SELECT CAST(n AS BIGINT) AS n_words,
           CAST(round(1000.0 * (n * sxy - sx * sy)
                      / (n * sxx - sx * sx)) AS BIGINT) AS slope_milli,
           CAST(round((1.0 * sy - (1000.0 * (n * sxy - sx * sy)
                                   / (n * sxx - sx * sx)) * sx / 1000.0)
                      / n) AS BIGINT) AS intercept_milli
    FROM s
    """,
)
def q212_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope of log2(freq) on log2(rank)
    over the corpus vocabulary — the one-number natural-language
    sanity check (real text slopes near -1; generated or templated
    corpora flatten, a contamination/synthetic-data tell). Float
    discipline stacks q192's millibit quantization with q99's
    closed-form moments: each point's (x, y) is individually quantized
    to integer millis, the five regression moments are EXACT integer
    sums, and the slope/intercept are single closed-form expressions
    whose association order mirrors the oracle text exactly — no float
    accumulation anywhere in a fit over arbitrarily many points. One
    map-side-combined word count + a vocabulary-sized window."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    wc = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = wc.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("word").asc())
        ),
    )
    pts = ranked.select(
        F.round(F.log2("rank") * 1000).cast("long").alias("x"),
        F.round(F.log2("freq") * 1000).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.lit(1000.0)
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_words"),
        F.round(slope).cast("long").alias("slope_milli"),
        F.round(
            (F.lit(1.0) * F.col("sy") - slope * F.col("sx") / F.lit(1000.0))
            / F.col("n")
        )
        .cast("long")
        .alias("intercept_milli"),
    )


@q(
    "q222_sentence_dedup",
    r"""
    WITH ex AS (
      SELECT doc_id, source,
             regexp_split_to_array(text, '[.!?]+\s+') AS parts
      FROM documents
    ), s0 AS (
      SELECT doc_id, source,
             unnest(generate_series(1, len(parts))) AS pos, parts
      FROM ex
    ), s AS (
      SELECT doc_id, source, pos,
             trim(lower(regexp_replace(parts[pos], '[.!?]+\s*$', '')))
                 AS sent
      FROM s0
      WHERE trim(lower(regexp_replace(parts[pos], '[.!?]+\s*$', ''))) <> ''
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rn
      FROM s
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(sum(CASE WHEN rn > 1 THEN length(sent) ELSE 0 END) AS BIGINT)
               AS chars_removed,
           bit_xor(CASE WHEN rn = 1 THEN
               CAST(('0x' || substr(md5(sent), 1, 15)) AS BIGINT) END)
               AS kept_fingerprint
    FROM r GROUP BY source ORDER BY source
    """,
)
def q222_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide SENTENCE-level exact dedup
    (`corpus.sentence_first_occurrence` — the Lee et al. 2022
    exact-substring regime at sentence granularity, the standard
    boilerplate killer between document-level hashing (q23/q24) and
    span dedup (q137)): every normalized sentence keeps only its
    (doc_id, pos)-first occurrence, deterministically. Per-source
    report: sentence volume, kept/removed counts, chars saved, and a
    bit_xor md5 fingerprint of the KEPT sentence set — the fingerprint
    value-hashes the exact surviving corpus cross-engine, not just its
    size (conv-hex trick, q143 pattern). One shuffle keyed by
    sentence; the hot boilerplate group streams through row_number
    without buffering."""
    docs = _t(spark, sf_dir, "documents")
    marked = CO.sentence_first_occurrence(
        docs, text_col="text", id_col="doc_id", carry_cols=("source",)
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum(F.col("is_first").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_first")).cast("long")).alias("n_removed"),
            F.sum(F.when(~F.col("is_first"), F.length("sent")).otherwise(0))
            .cast("long")
            .alias("chars_removed"),
            F.expr(
                "bit_xor(CASE WHEN is_first THEN"
                " cast(conv(substring(md5(sent), 1, 15), 16, 10) as bigint)"
                " END)"
            ).alias("kept_fingerprint"),
        )
        .orderBy("source")
    )


@q(
    "q224_bm25_retrieval",
    r"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')
                 AS w
      FROM documents
    ), docs AS (
      SELECT doc_id, len(w) AS dl, w FROM d
    ), stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs
    ), tok AS (
      SELECT doc_id, dl, unnest(w) AS term FROM docs
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM tok WHERE term IN ('spark', 'window', 'hash')
      GROUP BY doc_id, dl, term
    ), dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             CAST(round((log2(2 * s.n_docs + 2) - log2(2 * f.df_t + 1))
                        * 1000) AS BIGINT) AS idf_milli,
             tf.tf, tf.dl, s.n_docs, s.sum_dl
      FROM tf JOIN dfreq f USING (term) CROSS JOIN stats s
    ), per_doc AS (
      SELECT doc_id,
             sum((idf_milli * 44 * tf * sum_dl)
                 // (20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n_docs))
                 AS score_milli,
             count(*) AS n_terms_hit
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id)
                AS BIGINT) AS rank,
           CAST(score_milli AS BIGINT) AS score_milli,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM per_doc ORDER BY score_milli DESC, doc_id LIMIT 10
    """,
)
def q224_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (`corpus.bm25_topk`, k1=1.2 b=0.75) for a
    three-term query — the classic sparse-retrieval scorer a
    training-data pipeline runs for benchmark-contamination lookups
    and quality probes. Every score is exact bigint (idf quantized
    once per term to millibits, tf saturation a pure integer closed
    form — see the operator docstring), so the ranking value-hashes
    cross-engine. Plan: the explode filters to the 3 query terms
    BEFORE its map-side-combined (doc,term) agg, the 3-row df table
    and 1-row corpus stats broadcast (the stats crossJoin is the
    allowlisted 1-row BNLJ shape), and only scored docs enter the
    global top-k window."""
    docs = _t(spark, sf_dir, "documents")
    return CO.bm25_topk(docs, ["spark", "window", "hash"], k=10)


@q(
    "q225_gopher_repetition",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')
                 AS w
      FROM documents
    ), base AS (
      SELECT doc_id, source, w, len(w) AS n_words FROM d
    ), g1 AS (
      SELECT doc_id, source, n_words, 1 AS n, unnest(w) AS g FROM base
    ), g2 AS (
      SELECT doc_id, source, n_words, 2 AS n,
             unnest(list_transform(
                 generate_series(1, greatest(len(w) - 1, 0)),
                 i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g
      FROM base
    ), g5 AS (
      SELECT doc_id, source, n_words, 5 AS n,
             unnest(list_transform(
                 generate_series(1, greatest(len(w) - 4, 0)),
                 i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS g
      FROM base
    ), allg AS (
      SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g5
    ), counts AS (
      SELECT doc_id, source, n_words, n, g, count(*) AS c
      FROM allg WHERE g <> '' GROUP BY doc_id, source, n_words, n, g
    ), per_doc AS (
      SELECT doc_id, source, n_words,
             max(CASE WHEN n = 1 THEN c END) AS top_word,
             max(CASE WHEN n = 2 THEN c * 2 END) AS top_bigram_words,
             sum(CASE WHEN n = 5 THEN c - 1 ELSE 0 END) AS dup5_extra,
             sum(CASE WHEN n = 5 THEN 1 ELSE 0 END) AS n_5grams
      FROM counts GROUP BY doc_id, source, n_words
    ), prof AS (
      SELECT doc_id, source, n_words,
             coalesce(top_word, 0) * 1000 // n_words AS top_word_milli,
             least(coalesce(top_bigram_words, 0), n_words) * 1000 // n_words
                 AS top_bigram_milli,
             CASE WHEN n_5grams > 0 THEN dup5_extra * 1000 // n_5grams
                  ELSE 0 END AS dup_5gram_milli
      FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN top_word_milli > 300 OR top_bigram_milli > 200
                         OR dup_5gram_milli > 150 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(sum(top_word_milli) AS BIGINT) AS sum_top_word_milli,
           CAST(sum(top_bigram_milli) AS BIGINT) AS sum_top_bigram_milli,
           CAST(sum(dup_5gram_milli) AS BIGINT) AS sum_dup_5gram_milli
    FROM prof GROUP BY source ORDER BY source
    """,
)
def q225_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher within-document repetition filters
    (`corpus.repetition_profile`, Rae et al. 2021 Table A1): per-doc
    top-word / top-bigram / duplicate-5-gram fractions as exact
    integer permille, thresholded at the Gopher defaults, rolled up
    per source. The standard pre-training cut for templated
    boilerplate that survives document-level dedup. Plan: grams
    explode in-row, then two map-side-combined aggs BOTH keyed by the
    doc id — group size is bounded by document length, never corpus
    size, so hot boilerplate grams cannot concentrate on a reducer."""
    docs = _t(spark, sf_dir, "documents")
    prof = CO.repetition_profile(docs, carry_cols=("source",))
    return (
        prof.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
            F.sum("top_word_milli").cast("long").alias("sum_top_word_milli"),
            F.sum("top_bigram_milli")
            .cast("long")
            .alias("sum_top_bigram_milli"),
            F.sum("dup_5gram_milli")
            .cast("long")
            .alias("sum_dup_5gram_milli"),
        )
        .orderBy("source")
    )


@q(
    "q230_content_defined_chunking",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')
                 AS w
      FROM documents
      WHERE len(list_filter(
          regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
          x -> x <> '')) > 0
    ), b AS (
      SELECT doc_id, source, w,
             list_sort(list_distinct(list_concat(list_concat([0],
                 list_filter(generate_series(1, len(w)),
                     i -> CAST(('0x' || substr(md5(w[i]), 1, 15)) AS BIGINT)
                          % 16 = 0)),
                 [len(w)]))) AS bpos
      FROM d
    ), ch AS (
      SELECT doc_id, source,
             unnest(generate_series(1, len(bpos) - 1)) AS j, w, bpos
      FROM b
    ), chunks AS (
      SELECT doc_id, source,
             bpos[j + 1] - bpos[j] AS chunk_words,
             CAST(('0x' || substr(md5(array_to_string(
                 list_slice(w, bpos[j] + 1, bpos[j + 1]), ' ')), 1, 15))
                 AS BIGINT) AS chunk_hash
      FROM ch
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS n_distinct_chunks,
           CAST(count(*) - count(DISTINCT chunk_hash) AS BIGINT)
               AS dup_chunk_instances,
           CAST(sum(chunk_words) AS BIGINT) AS total_chunk_words,
           bit_xor(DISTINCT chunk_hash) AS chunk_set_fp
    FROM chunks GROUP BY source ORDER BY source
    """,
)
def q230_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (`corpus.content_defined_chunks`,
    word-level Rabin/FastCDC analog, expected 16-word chunks): chunk
    boundaries depend only on local content, so incremental corpus
    refreshes re-chunk only edited neighborhoods and chunk-hash dedup
    stays stable under insertions — the storage-dedup regime between
    fixed spans (q137) and sentences (q222). Per-source report: chunk
    volume, distinct chunk hashes, duplicate instances, and a
    bit_xor fingerprint of the DISTINCT chunk set. Boundary flags,
    prefix positions, and slicing are all in-row (zero shuffle before
    the final per-source agg)."""
    docs = _t(spark, sf_dir, "documents")
    chunks = CO.content_defined_chunks(docs, carry_cols=("source",))
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count_distinct("chunk_hash")
            .cast("long")
            .alias("n_distinct_chunks"),
            (F.count(F.lit(1)) - F.count_distinct("chunk_hash"))
            .cast("long")
            .alias("dup_chunk_instances"),
            F.sum("chunk_words").cast("long").alias("total_chunk_words"),
            F.expr("bit_xor(DISTINCT chunk_hash)").alias("chunk_set_fp"),
        )
        .orderBy("source")
    )


@q(
    "q232_vocab_coverage_cut",
    r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                    '\s+')) AS term
      FROM documents
    ), freq AS (
      SELECT term, count(*) AS f FROM tok WHERE term <> '' GROUP BY term
    ), tot AS (
      SELECT sum(f) AS total, count(*) AS n_terms FROM freq
    ), ranked AS (
      SELECT term, f,
             row_number() OVER (ORDER BY f DESC, term) AS rnk,
             sum(f) OVER (ORDER BY f DESC, term
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM freq
    )
    SELECT (SELECT CAST(min(rnk) AS BIGINT) FROM ranked, tot
            WHERE cum * 100 >= total * 95) AS vocab_95,
           (SELECT CAST(min(rnk) AS BIGINT) FROM ranked, tot
            WHERE cum * 100 >= total * 99) AS vocab_99,
           (SELECT CAST(total AS BIGINT) FROM tot) AS total_tokens,
           (SELECT CAST(n_terms AS BIGINT) FROM tot) AS n_terms,
           (SELECT CAST(sum(f) AS BIGINT) FROM ranked WHERE rnk <= 10)
               AS top10_tokens
    """,
)
def q232_vocab_coverage_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage cut: the smallest frequency-ranked
    vocabulary prefix covering 95% / 99% of token instances — the
    statistic that sizes a tokenizer's vocab and predicts OOV rates
    before a BPE run (complements q193's merge induction and q212's
    Zipf fit). Exact integer comparison (cum*100 >= total*95 — no
    float thresholds). The ranking window is VOCABULARY-sized (Heaps'
    law: ~1M rows at 100 TB, one partition is fine and bounded), never
    corpus-sized; token counting is one map-side-combined agg."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(
                F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+",
            )
        ).alias("term")
    ).where(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term"))
    ranked = freq.select(
        "f",
        F.row_number().over(w).alias("rnk"),
        F.sum("f")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    tot = freq.agg(
        F.sum("f").alias("total"), F.count(F.lit(1)).alias("n_terms")
    )
    j = ranked.crossJoin(F.broadcast(tot))
    return (
        j.agg(
            F.min(F.when(F.col("cum") * 100 >= F.col("total") * 95, F.col("rnk")))
            .cast("long")
            .alias("vocab_95"),
            F.min(F.when(F.col("cum") * 100 >= F.col("total") * 99, F.col("rnk")))
            .cast("long")
            .alias("vocab_99"),
            F.max("total").cast("long").alias("total_tokens"),
            F.max("n_terms").cast("long").alias("n_terms"),
            F.sum(F.when(F.col("rnk") <= 10, F.col("f")))
            .cast("long")
            .alias("top10_tokens"),
        )
    )


@q("q233_image_ahash_neardup")
def q233_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup detection (rows-only — pixel decode is
    not SQL-expressible): REAL P6 decode → average-hash
    (`multimodal.image_ahash`) → banded hamming join
    (`multimodal.ahash_near_dup_pairs`, the image analog of MinHash
    LSH, sharing the SAME distributed hot-bucket degradation as text
    dedup). Ground truth is planted: 48 distinct block-pattern images
    + 48 near-duplicates with exactly 2 blocks flipped, so every
    (i, i+48) pair must surface at hamming 2 and nothing else may.

    Self-asserting (q129 pattern): the query fails loudly unless
    (1) planted recall is exactly 1.0 with zero false positives, and
    (2) one sampled image's distributed aHash equals the hash
    re-derived DRIVER-SIDE from `_block_bits` first principles — pure
    Python, no Spark, no shared code path with the mapInPandas
    decode."""
    n_base = 48
    media = MM.synthetic_ppm_blocks(spark, n_base=n_base)
    hashes = MM.image_ahash(media)
    pairs = MM.ahash_near_dup_pairs(hashes, bands=4, max_hamming=3)
    got = [
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.hamming)
        for r in pairs.collect()  # bounded: <= n_base pairs by design
    ]
    planted = {(i, i + n_base) for i in range(n_base)}
    found = {(a, b) for a, b, _ in got}
    if found != planted or any(h != 2 for _, _, h in got):
        raise AssertionError(
            f"aHash near-dup ground truth violated: missing="
            f"{len(planted - found)} extra={len(found - planted)}"
        )
    probe_id = 5
    bits = MM._block_bits(probe_id, 8)
    expected = 0
    for b in bits:
        expected = (expected << 1) | b
    if expected >= 1 << 63:
        expected -= 1 << 64
    probe = hashes.where(F.col("media_id") == probe_id).collect()
    if len(probe) != 1 or probe[0].ahash != expected:
        raise AssertionError(
            f"driver-side aHash probe mismatch: {probe} != {expected}"
        )
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("hamming")
    )



# --------------------- 134. tokenizer sharding manifest

@q(
    "q237_tokenizer_shards",
    """
    WITH s AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 16 AS shard,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS ws_toks,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
        FROM documents)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
           CAST(bit_xor(fp) AS BIGINT) AS content_fp
    FROM s GROUP BY shard ORDER BY shard
    """,
)
def q237_tokenizer_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-run sharding manifest: corpus split into 16
    deterministic md5 shards (corpus.hash_bucket — the q83 split
    primitive) with per-shard doc count, whitespace token count (the
    tokenizer cost model) and a bit_xor content fingerprint over
    60-bit doc digests. This is the manifest a distributed tokenizer
    job consumes: shard membership is a pure function of doc_id, so a
    re-run, a backfill, or a different engine produces byte-identical
    shard assignments (the oracle recomputes the identical buckets and
    fingerprints in DuckDB), and the fingerprint lets each tokenizer
    worker verify its input slice before burning GPU-adjacent compute.
    Scale shape: scan-side hashes + ONE map-side-combined groupBy on a
    16-value key; no windows, no joins. At 100 TB the shard count
    simply rises with the worker fleet — the plan shape is constant."""
    docs = _t(spark, sf_dir, "documents")
    sharded = docs.select(
        CO.hash_bucket(F.col("doc_id"), 16).alias("shard"),
        TX.n_tokens_ws("text").alias("ws_toks"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fp"),
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws_toks").cast("long").alias("ws_tokens"),
            F.bit_xor("fp").alias("content_fp"),
        )
        .orderBy("shard")
    )



# --------------------- 135. cross-source quantile normalization

@q(
    "q248_quantile_normalize",
    """
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    g AS (SELECT source, doc_id, n_chars,
                 row_number() OVER (
                     PARTITION BY source ORDER BY n_chars, doc_id) AS r,
                 count(*) OVER (PARTITION BY source) AS ng
          FROM d),
    j AS (SELECT source, doc_id, (10 * r + ng - 1) // ng AS quantile
          FROM g),
    ordered AS (SELECT n_chars,
                       row_number() OVER (ORDER BY n_chars, doc_id) AS k
                FROM d),
    nq AS (SELECT count(*) AS N FROM d),
    dec AS (SELECT t.jq AS quantile, o.n_chars AS norm_value
            FROM (SELECT unnest(range(1, 11)) AS jq) t, nq, ordered o
            WHERE o.k = ((t.jq * nq.N + 9) // 10))
    SELECT j.source, CAST(j.quantile AS BIGINT) AS quantile,
           CAST(dec.norm_value AS BIGINT) AS norm_value,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM j JOIN dec ON j.quantile = dec.quantile
    GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
)
def q248_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources
    (corpus.quantile_normalize): every doc's length maps to the GLOBAL
    distribution's value at the doc's within-source quantile, making
    per-source scores comparable before any cross-source threshold —
    the fix for the classic corpus-curation bug where one source's
    length/quality scale silently dominates a global cut. All
    NEAREST-RANK integer arithmetic (no interpolation, no floats):
    within-source rank r of n_g → decile ceil(10r/n_g); normalized
    value = global ceil(j*N/10)-th smallest. Engine never sorts raw
    rows globally: the global value-at-rank table derives from the
    distinct-value histogram (map-side-combined groupBy + cumulative
    window over the value-cardinality-sized aggregate), each distinct
    value emitting the decile indexes whose target rank lands in its
    cumulative span; the 10-row decile table broadcast-joins back.
    The oracle computes the same mapping by brute-force global sort —
    the hash match proves the histogram derivation exact."""
    docs = _t(spark, sf_dir, "documents")
    out = CO.quantile_normalize(docs, "n_chars", "source", "doc_id", 10)
    return (
        out.groupBy("source", "quantile")
        .agg(
            F.min("norm_value").cast("long").alias("norm_value"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select("source", F.col("quantile"), "norm_value", "n_docs")
        .orderBy("source", "quantile")
    )



# --------------------- 136. positional-index phrase search

@q(
    "q250_phrase_search",
    """
    WITH tok AS (SELECT doc_id,
                        string_split(trim(regexp_replace(
                            lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                 FROM documents),
    ex AS (SELECT doc_id, i AS pos, toks[i] AS tk
           FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)),
    p0 AS (SELECT doc_id, pos FROM ex WHERE tk = 'slow'),
    p1 AS (SELECT doc_id, pos - 1 AS pos FROM ex WHERE tk = 'hash'),
    p2 AS (SELECT doc_id, pos - 2 AS pos FROM ex WHERE tk = 'batch')
    SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM p0 JOIN p1 USING (doc_id, pos) JOIN p2 USING (doc_id, pos)
    GROUP BY 1 ORDER BY 1
    """,
)
def q250_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search via a positional inverted index
    (corpus.phrase_search): docs where 'slow hash batch' occurs as
    CONSECUTIVE tokens — the IR primitive bag-of-words BM25 (q224)
    cannot express. Postings materialize only for the phrase's three
    tokens (scan-side isin filter), then position lists equi-join on
    (doc, shifted position); occurrence counts per doc come back
    exactly. The oracle rebuilds the same positional logic from
    DuckDB's token arrays. At scale the naive substring scan reads
    100% of corpus bytes per query; the positional join reads three
    posting lists."""
    docs = _t(spark, sf_dir, "documents")
    out = CO.phrase_search(docs, ("slow", "hash", "batch"))
    return out.orderBy("doc_id")



# --------------------- 137. readability scoring

@q(
    "q251_readability",
    """
    WITH s AS (
        SELECT source,
               greatest(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END, 1) AS words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll
        FROM documents),
    f AS (SELECT source,
                 206835 - (1015 * words) // sentences
                        - (84600 * syll) // words AS score
          FROM s)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(score) AS BIGINT) AS min_milli,
           CAST(max(score) AS BIGINT) AS max_milli,
           CAST(sum(score) // count(*) AS BIGINT) AS avg_milli
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def q251_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source (functions.text.flesch_milli)
    in exact integer MILLI units — the readability member of the
    text-quality family (entropy, Gopher rules, perplexity tiers),
    scored with integer division throughout so both engines agree
    bit-for-bit; this corpus has no terminal punctuation, so every
    doc scores as one long sentence (the operator's min-1 guard,
    exercised corpus-wide). Scan-side regexp counting + one
    map-side-combined groupBy; the per-source average uses
    FLOOR(sum/count) to match DuckDB's floor-division `//` on a
    possibly negative sum."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source", TX.flesch_milli("text").alias("score")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("score").cast("long").alias("min_milli"),
            F.max("score").cast("long").alias("max_milli"),
            F.floor(F.sum("score") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_milli"),
        )
        .orderBy("source")
    )


# --------------------- code-switching / language-mixture detection

# seeded code-switch suffix: the ENGINE's own es marker words (9 es
# hits, zero en/pt hits — verified disjoint from the other marker
# sets), so derived docs are PROVABLY mixed whenever the base doc has
# enough en hits for a >= 30% second share
_CS_SUFFIX = " " + " ".join(TX._LANG_MARKERS["es"])

@q(
    "q284_code_switching",
    f"""
    WITH u AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id + 300000 AS doc_id, text || '{_CS_SUFFIX}' AS text
        FROM documents WHERE doc_id < 100),
    scored AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{_LANG_RE["en"]}')) AS en_hits,
               len(regexp_extract_all(lower(text), '{_LANG_RE["es"]}')) AS es_hits,
               len(regexp_extract_all(lower(text), '{_LANG_RE["pt"]}')) AS pt_hits
        FROM u),
    ranked AS (
        SELECT doc_id, en_hits + es_hits + pt_hits AS total,
               list_sort([
                   {{'neg': -en_hits, 'lang': 'en'}},
                   {{'neg': -es_hits, 'lang': 'es'}},
                   {{'neg': -pt_hits, 'lang': 'pt'}}]) AS r
        FROM scored)
    SELECT doc_id, r[1].lang AS lang1, r[2].lang AS lang2,
           CAST((1000 * -r[1].neg) // total AS BIGINT) AS top_permille,
           CAST((1000 * -r[2].neg) // total AS BIGINT) AS second_permille
    FROM ranked
    WHERE total >= 4 AND (1000 * -r[2].neg) // total >= 300
    ORDER BY doc_id
    """,
)
def q284_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching (mixed-language) document detection — the
    corpus-hygiene screen monolingual lang-ID (q34) can't express: a
    doc whose SECOND-strongest language still owns >= 30% of its
    marker hits is flagged as mixed (with >= 4 total hits so two
    stray stopwords can't trigger it). Marker counts reuse the
    ENGINE's `_LANG_MARKERS` regexes (oracle derives from the same
    dict — the two sides cannot drift); languages rank in-row via a
    sorted (−hits, lang) struct array, the same lexicographic
    tie-break in both engines; shares are exact integer permille.
    This corpus's text is English-marker-only regardless of its lang
    label, so provable mixed docs are SEEDED: the first 100 docs get
    a companion with the engine's 9 es marker words appended — every
    companion whose base has >= 4 en hits MUST flag (second share
    >= 300 permille by construction), and a missed one fails on rows.
    Scale shape: pure scan-side row expressions — three regexp_count
    passes and an in-row 3-element sort, no shuffle at all before
    the (already tiny) result."""
    base = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    ).select("doc_id", "text")
    derived = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_CS_SUFFIX)).alias("text"),
    )
    docs = base.unionByName(derived)
    hits = {
        lang: F.regexp_count(F.lower("text"), F.lit(pat))
        for lang, pat in _LANG_RE.items()
    }
    ranked = docs.select(
        "doc_id",
        (hits["en"] + hits["es"] + hits["pt"]).alias("total"),
        F.sort_array(
            F.array(
                *[
                    F.struct(
                        (-hits[lang]).cast("long").alias("neg"),
                        F.lit(lang).alias("lang"),
                    )
                    for lang in ("en", "es", "pt")
                ]
            )
        ).alias("r"),
    )
    top = -F.get(F.col("r"), 0).getField("neg")
    second = -F.get(F.col("r"), 1).getField("neg")
    out = ranked.select(
        "doc_id",
        F.get(F.col("r"), 0).getField("lang").alias("lang1"),
        F.get(F.col("r"), 1).getField("lang").alias("lang2"),
        F.expr("(1000 * -r[0].neg) div total").cast("long").alias(
            "top_permille"
        ),
        F.expr("(1000 * -r[1].neg) div total").cast("long").alias(
            "second_permille"
        ),
        F.col("total"),
    ).filter(
        (F.col("total") >= 4) & (F.col("second_permille") >= 300)
    )
    return out.drop("total").orderBy("doc_id")


# --------------------- leave-one-source-out data valuation

@q(
    "q286_source_loo_value",
    """
    WITH wc AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                   AS words
        FROM documents),
    per AS (SELECT source, count(*) AS n, sum(words) AS s
            FROM wc GROUP BY 1),
    tot AS (SELECT sum(n) AS nt, sum(s) AS st FROM per)
    SELECT p.source,
           CAST(p.n AS BIGINT) AS n_docs,
           CAST((1000000 * t.st) // t.nt AS BIGINT) AS mean_all_micro,
           CAST((1000000 * (t.st - p.s)) // (t.nt - p.n) AS BIGINT)
               AS mean_without_micro,
           CAST((1000000 * t.st) // t.nt
                - (1000000 * (t.st - p.s)) // (t.nt - p.n) AS BIGINT)
               AS delta_micro
    FROM per p CROSS JOIN tot t ORDER BY p.source
    """,
)
def q286_source_loo_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation — the cheapest member of
    the Shapley family and the first question a corpus curator asks:
    how does the corpus-level metric move if source s is DROPPED?
    Because the metric here (mean words per doc) is a ratio of sums,
    every leave-one-out value is pure algebra on the per-source
    (n, Σwords) aggregates — NO per-source re-scan, one pass total,
    then 20 rows of arithmetic against the broadcast 1-row total.
    delta > 0 means the source pulls the corpus average up. All
    divisions truncate in micro units, identically in both engines.
    At 100 TB the same shape prices any sum-decomposable metric
    (quality score, dedup rate, token entropy) per source for free."""
    docs = _t(spark, sf_dir, "documents")
    wc = docs.select(
        "source", TX.n_tokens_ws("text").alias("words")
    )
    per = wc.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("words").cast("decimal(38,0)").alias("s"),
    )
    tot = per.agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    M = F.lit(1000000).cast("decimal(38,0)")

    def tdv(num, den):
        return ((num - num % den) / den).cast("long")

    j = per.crossJoin(F.broadcast(tot))
    mean_all = tdv(M * F.col("st"), F.col("nt"))
    mean_wo = tdv(
        M * (F.col("st") - F.col("s")), F.col("nt") - F.col("n")
    )
    return j.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        mean_all.alias("mean_all_micro"),
        mean_wo.alias("mean_without_micro"),
        (mean_all - mean_wo).alias("delta_micro"),
    ).orderBy("source")


# --------------------- per-class precision / recall / F1

@q(
    "q291_lang_id_prf",
    f"""
    WITH scored AS (
        SELECT lang AS lang_true,
               CASE WHEN greatest(
                        len(regexp_extract_all(lower(text), '{_LANG_RE["en"]}')),
                        len(regexp_extract_all(lower(text), '{_LANG_RE["es"]}')),
                        len(regexp_extract_all(lower(text), '{_LANG_RE["pt"]}'))) = 0
                         THEN 'und'
                    WHEN len(regexp_extract_all(lower(text), '{_LANG_RE["pt"]}'))
                         >= len(regexp_extract_all(lower(text), '{_LANG_RE["es"]}'))
                     AND len(regexp_extract_all(lower(text), '{_LANG_RE["pt"]}'))
                         >= len(regexp_extract_all(lower(text), '{_LANG_RE["en"]}'))
                         THEN 'pt'
                    WHEN len(regexp_extract_all(lower(text), '{_LANG_RE["es"]}'))
                         >= len(regexp_extract_all(lower(text), '{_LANG_RE["en"]}'))
                         THEN 'es'
                    ELSE 'en' END AS lang_pred
        FROM documents),
    classes AS (
        SELECT lang_true AS c FROM scored
        UNION SELECT lang_pred FROM scored),
    stats AS (
        SELECT k.c,
               sum(CASE WHEN s.lang_true = k.c AND s.lang_pred = k.c
                        THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN s.lang_true <> k.c AND s.lang_pred = k.c
                        THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN s.lang_true = k.c AND s.lang_pred <> k.c
                        THEN 1 ELSE 0 END) AS fn
        FROM classes k CROSS JOIN scored s GROUP BY 1)
    SELECT c AS class,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
                ELSE (1000000 * tp) // (tp + fp) END AS BIGINT)
               AS precision_micro,
           CAST(CASE WHEN tp + fn = 0 THEN 0
                ELSE (1000000 * tp) // (tp + fn) END AS BIGINT)
               AS recall_micro,
           CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT)
               AS f1_micro
    FROM stats ORDER BY 1
    """,
)
def q291_lang_id_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the lang-ID model — the
    eval readout q34's raw confusion matrix stops short of. F1 uses
    the integer-exact identity F1 = 2TP/(2TP+FP+FN) (the harmonic
    mean NEVER needs float P and R), and all three metrics emit
    truncating micro units with explicit zero-denominator guards
    (classes the model never predicts — de/fr/zh here — get
    precision 0, not a division error). Classes are the UNION of
    truth and prediction labels so both phantom predictions and
    never-predicted truths appear. Scale shape: one scan scores and
    counts per (truth, pred) cell implicitly via conditional sums
    against the broadcast class list; everything after the scan runs
    on |classes| rows."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("lang").alias("lang_true"),
        TX.lang_id("text").alias("lang_pred"),
    )
    classes = (
        scored.select(F.col("lang_true").alias("c"))
        .union(scored.select("lang_pred"))
        .distinct()
    )
    j = scored.crossJoin(F.broadcast(classes))
    stats = j.groupBy("c").agg(
        F.sum(
            F.when(
                (F.col("lang_true") == F.col("c"))
                & (F.col("lang_pred") == F.col("c")),
                1,
            ).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(
                (F.col("lang_true") != F.col("c"))
                & (F.col("lang_pred") == F.col("c")),
                1,
            ).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(
                (F.col("lang_true") == F.col("c"))
                & (F.col("lang_pred") != F.col("c")),
                1,
            ).otherwise(0)
        ).alias("fn"),
    )

    return stats.select(
        F.col("c").alias("class"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(0))
        .otherwise(F.expr("(1000000 * tp) div (tp + fp)"))
        .cast("long")
        .alias("precision_micro"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(0))
        .otherwise(F.expr("(1000000 * tp) div (tp + fn)"))
        .cast("long")
        .alias("recall_micro"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0))
        .otherwise(F.expr("(2000000 * tp) div (2 * tp + fp + fn)"))
        .cast("long")
        .alias("f1_micro"),
    ).orderBy("class")


# --------------------- source vocabulary overlap matrix

@q(
    "q299_vocab_overlap_matrix",
    """
    WITH tok AS (
        SELECT DISTINCT source,
               unnest(string_split(trim(regexp_replace(lower(text),
                      '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents WHERE trim(text) <> ''),
    sizes AS (SELECT source, count(*) AS n FROM tok GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS i
        FROM tok a JOIN tok b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
    SELECT i.source_a, i.source_b,
           CAST(i.i AS BIGINT) AS n_shared,
           CAST((1000 * i.i) // least(sa.n, sb.n) AS BIGINT)
               AS overlap_permille
    FROM inter i
    JOIN sizes sa ON i.source_a = sa.source
    JOIN sizes sb ON i.source_b = sb.source
    WHERE (1000 * i.i) // least(sa.n, sb.n) >= 500
    ORDER BY 1, 2
    """,
)
def q299_vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szymkiewicz–Simpson OVERLAP coefficient |A∩B| / min(|A|,|B|)
    between source vocabularies — the redundancy measure for feeds:
    a small source whose vocabulary sits INSIDE a big one scores
    ~1000‰ here while its Jaccard vs the giant is tiny (same
    asymmetry argument as containment dedup q268, lifted from
    documents to source-level vocab SETS). Pairs ≥ 500‰ are the
    drop-candidates a curator reviews. Exact integer permille;
    the distinct (source, token) table is the only large
    intermediate, and the pair intersection joins token postings
    whose length is bounded by |sources| (each token contributes at
    most |sources|²/2 pairs, with |sources| = 20) — never a
    doc-level pair join. Scale shape: one distinct-agg over the
    scan, one posting join on token, a |sources|²-row rollup."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    tok = docs.select(
        "source",
        F.explode(
            F.split(TX.normalize_text(F.col("text")), " ")
        ).alias("token"),
    ).distinct()
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col("source").alias("source_a"), "token")
    b = tok.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    out = (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("i").cast("long").alias("n_shared"),
            F.expr("(1000 * i) div least(na, nb)").cast("long").alias(
                "overlap_permille"
            ),
        )
        .filter(F.col("overlap_permille") >= 500)
    )
    return out.orderBy("source_a", "source_b")
