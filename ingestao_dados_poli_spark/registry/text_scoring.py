"""Text registry (scoring slice): perplexity tiers, BPE merges, DSIR
importance, novelty decay, Zipf/readability, retrieval and vocab
overlap suites (q192+).

Split out of registry/text.py in round 6 to hold every registry module
under the round-4 2,500-line bound — every block is verbatim.
Registration happens via the shared `q` decorator from `._base`, so
importing this module populates QUERIES/ORACLES.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403

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
    # Lazy checkpoint of the 16-row distribution (r08): two driver
    # actions read it (the totals, then the log-ratios) and without the
    # cut the SECOND one re-ran the whole tokenize+explode+agg pass —
    # the q218 self-assert double-computation class (guide §5). The
    # totals collect materializes the blocks; the lr collect reads them.
    dist = (
        toks.groupBy(_bucket(F.col("word")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("r_n"),
            F.sum(
                F.when(F.col("source") == _Q195_TARGET_SRC, 1).otherwise(0)
            ).alias("t_n"),
        )
        .localCheckpoint(eager=False)
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
    # fan_out: lang_id runs one regexp count per language marker set
    # per doc — the dominant stage; spread it across cores instead of
    # the single under-split scan task (§2.5).
    docs = fan_out(_t(spark, sf_dir, "documents").select("lang", "text"))
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
