"""Text-analysis column functions for training-data pipelines.

All JVM-side built-ins (no Python UDFs): at 100 TB these run inside
whole-stage codegen over the parquet scan, shuffle-free. Extends the
reference's string layer (SURVEY §2.6) toward LLM-data work: token
counting, language-ID heuristic, quality scoring, fingerprinting,
shingling for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols.
TOKEN_PATTERN = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]"

# Tiny stopword lists for the language-ID heuristic (public knowledge).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "a"),
    "pt": ("de", "que", "não", "uma", "para", "com", "os", "é", "do"),
    "es": ("el", "la", "los", "las", "por", "una", "es", "y", "en"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def n_chars(col: Column | str) -> Column:
    return F.length(_c(col))


def n_tokens_ws(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(_c(col))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def n_tokens_bpe(col: Column | str) -> Column:
    """BPE-ish token count via regexp extraction (words/numbers/symbols)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_PATTERN), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def upper_ratio(col: Column | str) -> Column:
    c = _c(col)
    uppers = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return uppers / F.greatest(F.length(c), F.lit(1))


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    """Count of marker-stopword occurrences (word-bounded)."""
    words = "|".join(_LANG_MARKERS[lang])
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(rf"\b({words})\b"), F.lit(0))
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts.

    Deterministic tie-break by language code order (en < es < pt via the
    struct comparison below), 'und' when no markers hit at all.
    """
    c = _c(col)
    scored = [
        F.struct(stopword_count(c, lang).alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(_LANG_MARKERS)  # en, es, pt
    ]
    # greatest() picks max hits; ties break toward the LAST-sorting lang,
    # so order langs descending to make ties deterministic and documented.
    best = F.greatest(*scored)
    return F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length, punctuation, casing.

    Heuristics in the spirit of Gopher/C4 quality rules (public papers):
    prefer 200-8000 chars, <15% punctuation, <30% uppercase.
    """
    c = _c(col)
    length_ok = F.when((n_chars(c) >= 100) & (n_chars(c) <= 20000), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio(c) <= 0.15, 1.0).otherwise(0.5)
    upper_ok = F.when(upper_ratio(c) <= 0.30, 1.0).otherwise(0.5)
    token_ok = F.when(n_tokens_ws(c) >= 10, 1.0).otherwise(0.3)
    return (length_ok * punct_ok * upper_ok * token_ok).cast("double")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, squash whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized text).

    Used as the exact-dedup key: identical-after-normalization documents
    collide. md5 exists in Spark and DuckDB with identical output, which
    keeps this oracle-checkable."""
    return F.md5(normalize_text(col))


# Conservative PII patterns (public-knowledge shapes): emails and
# international-ish phone numbers. Scrubbing is a REDACTION, not a
# deletion — length statistics stay comparable.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def scrub_pii(col: Column | str, replacement: str = "[REDACTED]") -> Column:
    """Redact email addresses and phone-shaped numbers (training-data
    hygiene pass; scan-side, no shuffle).

    Recall-biased by design: long digit runs with separators (dates,
    build numbers) can over-match as phones — acceptable for a hygiene
    pass where missing real PII costs more than redacting a date.
    Dotted sequences (IPs, versions) do NOT match."""
    out = F.regexp_replace(_c(col), EMAIL_PATTERN, replacement)
    return F.regexp_replace(out, PHONE_PATTERN, replacement)


def pii_count(col: Column | str) -> Column:
    """How many PII-shaped spans a document contains."""
    c = _c(col)
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), F.lit(0))) + F.size(
        F.regexp_extract_all(c, F.lit(PHONE_PATTERN), F.lit(0))
    )


def repetition_ratio(col: Column | str) -> Column:
    """1 - distinct_tokens/tokens — the Gopher-style repetition signal
    (boilerplate and looping generations score high). 0 for empty."""
    toks = F.split(F.trim(_c(col)), r"\s+")
    n = F.size(toks)
    return F.when(F.trim(_c(col)) == "", F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / n
    )


def shingles(col: Column | str, k: int = 5) -> Column:
    """Word k-shingles (array<string>) for MinHash/Jaccard dedup.

    Built with slice over the token array — stays JVM-side. Documents
    shorter than k words yield a single shingle of the full text.
    """
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, k), " ")
    )


def flesch_milli(col: Column | str) -> Column:
    """Flesch reading-ease score in exact MILLI units (integer):
    ``206835 - (1015*words) div sentences - (84600*syllables) div
    words`` — every term integer division, so engines agree
    bit-for-bit (the integer-quantization trick from the perplexity
    tiers, applied to readability). Heuristics: words = whitespace
    tokens (min 1), sentences = [.!?]+ runs (min 1 — prose without
    terminal punctuation scores as one long sentence), syllables =
    [aeiouy]+ vowel groups. Scan-side regexp counting only — no
    shuffle, no UDF. Integer division via floor(a/b): with both
    operands exact in double far below 2^53 the floor is exact
    (a = k*b - 1 sits 1/b >= 1e-9 below k, astronomically beyond
    double rounding error)."""
    c = _c(col)
    words = F.greatest(n_tokens_ws(c), F.lit(1)).cast("long")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    syllables = F.size(
        F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("long")
    wps = F.floor((F.lit(1015) * words) / sentences).cast("long")
    spw = F.floor((F.lit(84600) * syllables) / words).cast("long")
    return (F.lit(206835) - wps - spw).cast("long")
