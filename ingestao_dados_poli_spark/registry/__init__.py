"""Per-domain query registry modules (split from the monolithic
queries.py in round 5 — a stray edit there risked all 190 queries).
Importing `ingestao_dados_poli_spark.queries` assembles the full
registry; each submodule is also importable alone for a partial one
(plus `._base`)."""
