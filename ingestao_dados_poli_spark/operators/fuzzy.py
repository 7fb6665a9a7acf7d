"""Blocked fuzzy (edit-distance) matching.

Generalizes the reference's conform-entity-key join (etl/3:62-78,
etl/4:36-57 normalize bank names before an exact join) to approximate
matching: find all record pairs whose names are within ``max_dist``
edits, without ever forming the full n² pair product.

Scale design — the candidate space is bounded by CONSTRUCTION, not by
dataset luck:

- **Composite blocking key** = (caller's block column, length band).
  ``band = floor(len(text) / band_width)`` with ``band_width =
  max_dist + 1``; the build side is replicated into bands b-1, b, b+1.
  Any pair with ``|len(a) - len(b)| <= max_dist`` differs by at most
  one band, so it is found in exactly ONE of the three copies — the
  banding is lossless for the threshold, and every blocking key gains
  a factor of the length spread in cardinality. Pairs straddling two
  bands are impossible to miss AND impossible to double-count (one
  build copy per band value matches a given probe band).
- **Length prefilter inside the join condition**:
  ``|len(a)-len(b)| <= max_dist`` is a free necessary condition for
  ``levenshtein <= max_dist`` — it prunes before the DP runs.
- **Thresholded levenshtein** (Spark >= 3.5): banded DP that
  early-exits at ``> max_dist`` (returns -1) instead of filling the
  full O(m·n) matrix; computed once per surviving pair.
- **Optional hard cap** ``max_block_size``: (block, band) groups larger
  than the cap are dropped from BOTH sides (counts are computed once
  and broadcast — no extra shuffle of the data itself). This is the
  same recall-for-boundedness contract as
  ``dedup.minhash_candidate_pairs(max_bucket_size=...)``: with a cap,
  emitted pairs are <= groups × cap², linear in rows at fixed cap.
  Leave it ``None`` for exact results when block sizes are known
  bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestao_dados_poli_spark.partitioning import fan_out


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block_col: str | None = None,
    max_dist: int = 12,
    band_width: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """All pairs (block, key_a, key_b, dist) with ``key_a < key_b`` and
    ``levenshtein(text_a, text_b) <= max_dist``, optionally restricted
    to equal values of ``block_col``.

    Returns columns: ``block_col`` (if given), ``key_a``, ``key_b``,
    ``dist``.
    """
    band_width = band_width or (max_dist + 1)
    if band_width <= max_dist:
        raise ValueError(
            f"band_width={band_width} must exceed max_dist={max_dist}: "
            "pairs within the threshold must never straddle two bands"
        )
    block = [block_col] if block_col else []
    band = (F.length(F.col(text_col)) / band_width).cast("int")

    probe = fan_out(df).select(
        *block,
        F.col(key_col).alias("key_a"),
        F.col(text_col).alias("_text_a"),
        band.alias("_band"),
    )
    build = df.select(
        *[F.col(c).alias(f"_b_{c}") for c in block],
        F.col(key_col).alias("key_b"),
        F.col(text_col).alias("_text_b"),
        F.explode(F.array(band - 1, band, band + 1)).alias("_band_b"),
    )

    if max_block_size is not None:
        # One tiny aggregate per side, broadcast back as an anti-join —
        # oversized (block, band) groups are excluded from both sides
        # before any pair forms. The data rows themselves never take an
        # extra shuffle for the cap.
        sizes = (
            df.groupBy(*block, band.alias("_band"))
            .count()
            .filter(F.col("count") > max_block_size)
            .drop("count")
        )
        probe = probe.join(F.broadcast(sizes), [*block, "_band"], "left_anti")
        bsizes = sizes.select(
            *[F.col(c).alias(f"_b_{c}") for c in block],
            F.col("_band").alias("_band_b"),
        )
        build = build.join(F.broadcast(bsizes), [f"_b_{c}" for c in block] + ["_band_b"], "left_anti")

    cond = (F.col("_band") == F.col("_band_b")) & (F.col("key_a") < F.col("key_b"))
    for c in block:
        cond &= F.col(c) == F.col(f"_b_{c}")
    cond &= F.abs(F.length("_text_a") - F.length("_text_b")) <= max_dist

    # The dist>=0 filter below gets PUSHED into the join condition and
    # PREPENDED to it, so whatever expression computes `dist` runs on
    # every (block, band)-joined candidate BEFORE the cheap key/length
    # conjuncts (measured in the plan: levenshtein was the first
    # conjunct — the banded DP ran on 2x the pairs, including every
    # key_a >= key_b mirror). Guarding the projected expression with
    # the cheap conditions makes the PUSHED copy short-circuit: the
    # when() evaluates key order + length prefilter first and only
    # runs the DP on pairs that could survive (r07, guide §1.2/§7.2).
    cheap = (F.col("key_a") < F.col("key_b")) & (
        F.abs(F.length("_text_a") - F.length("_text_b")) <= max_dist
    )
    dist_expr = (
        F.when(cheap, F.levenshtein("_text_a", "_text_b", max_dist))
        .otherwise(F.lit(-1))
    )
    pairs = (
        probe.join(build, cond)
        .select(
            *block,
            "key_a",
            "key_b",
            dist_expr.alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    return pairs
