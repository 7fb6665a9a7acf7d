"""Smoke the driver contract: every registry query runs at sf0.001 and
returns a stable schema; oracle coverage is declared for all
SQL-expressible entries."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from ingestao_dados_poli_spark import queries as Q

ROWS_ONLY = {
    "q27_minhash_pairs",
    "q28_simhash_pairs",
    "q29_jaccard_pairs",
    "q30_embedding_lsh_topk",
    "q39_embedding_sim_pairs",
    "q40_media_features",
    "q49_stratified_sample",
    "q97_media_decode",
}


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0


def test_oracle_coverage():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) == set(qs) - ROWS_ONLY


def test_readme_counts_match_registry():
    # README's driver-contract block states the registry size; keep it
    # from drifting (round-1 verdict found it stale).
    import pathlib
    import re

    text = (pathlib.Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(r"the (\d+)-query registry", text)
    assert m and int(m.group(1)) == len(Q.QUERIES)
    m = re.search(r"\((\d+) entries\), `oracle_sql\(\)` \((\d+) DuckDB oracles", text)
    assert m and int(m.group(1)) == len(Q.QUERIES)
    assert int(m.group(2)) == len(Q.ORACLES)


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert df.columns  # stable, non-empty schema
    df.limit(5).collect()  # executes without error
