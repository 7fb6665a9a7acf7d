"""ingestao_dados_poli_spark — PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``LeoGaller/ingestao-dados-poli`` (a Databricks medallion
ETL, surveyed in SURVEY.md): typed ingestion, declarative transform
pipelines, entity-key conforming, relational query surface, data-quality
suites, plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB inputs.
"""

from ingestao_dados_poli_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
