"""The query registry — public facade.

The registry itself lives in `ingestao_dados_poli_spark/registry/`
split by domain (relational, analytics, text, similarity, streaming,
layout, mlstats) with shared infrastructure in `registry/_base.py`; importing
this module assembles all of them into the same QUERIES / ORACLES
dicts the driver contract (`__spark_entry__.py`), the oracle gate
(`tools/check_oracle.py`) and the bench CLI consume. Split in round 5:
at 8.7k lines the monolith was 51% of the codebase and a single bad
edit risked every query; a stray edit now risks one domain at most.

Everything previously importable from this module still is — the
star-imports below re-export the shared helpers (including the
underscore names tests use: `_t`, `_events_ts`, `_CENTROIDS`) and
every query function.
"""

from ingestao_dados_poli_spark.registry._base import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.relational import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.relational_sql import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.analytics import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.analytics_behavior import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.analytics_trend import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.text import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.text_scoring import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.similarity import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.similarity_graph import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.streaming import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.layout import *  # noqa: F401,F403
from ingestao_dados_poli_spark.registry.mlstats import *  # noqa: F401,F403
