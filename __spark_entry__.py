"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship KG pipeline (docs → extract → mentions → link →
              entities) at sf0.001.
queries():    one entry per implemented operator from SURVEY.md §2
              (entity_extractor_linker_api_v2_spark.plans.queries).
oracle_sql(): DuckDB twins (entity_extractor_linker_api_v2_spark.plans.oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from entity_extractor_linker_api_v2_spark.plans.queries import q_entities
    return q_entities(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from entity_extractor_linker_api_v2_spark.plans.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from entity_extractor_linker_api_v2_spark.plans.oracle import ORACLE
    return dict(ORACLE)
