"""Locale-aware numeric parsing (pt-BR decimal-comma strings).

The reference normalizes ``"0,25"``-style strings with an inline
``regexp_replace(',', '.')`` then ``cast('integer')`` in the GOLD layer
(etl/4-generate-final-table-gold.py:54,79) — which truncates 0.25 → 0 and
is then averaged (etl/4:88). The engine parses locale numerics once, at
ingest, and offers both semantics:

- ``parse_decimal_comma(...)`` → correct double value;
- ``compat_int_index(...)``   → the reference's truncating behavior, kept
  for byte-compat mode (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_decimal_comma(col: Column | str) -> Column:
    """'1.234,56' or '0,25' → double. Thousands dots stripped first."""
    c = F.col(col) if isinstance(col, str) else col
    no_thousands = F.regexp_replace(c, r"\.", "")
    dotted = F.regexp_replace(no_thousands, ",", ".")
    return dotted.cast("double")


def compat_int_index(col: Column | str) -> Column:
    """Reference-faithful: comma→dot then int cast (truncates fractions;
    etl/4:54,79)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").cast("double").cast("int")


def safe_cast_double(col: Column | str) -> Column:
    """Explicit string→double (replaces the reference's implicit coercion
    inside avg(), etl/4:87-91 — SURVEY F12 says never rely on implicit)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")
