"""Driver contract for the spark-graft builder (PySpark target).

Thin aggregator over the ``ulh_etl_spark`` package: the engine's query
catalog (``ulh_etl_spark.queries``) carries one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline operators,
each paired with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ulh_etl_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    from ulh_etl_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
