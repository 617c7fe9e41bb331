"""SQL query source (reference S5): a config-declared SQL string run
verbatim as an ingest source (RAW_ADLS_TO_RAW_SNOWFLAKE.py:693-696,
979-1010; example with a self-join at practice_ingest_config.json:280).

Spark: ``spark.sql`` over registered temp views — Catalyst plans it
like any other query (pushdown/pruning free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def query_source(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
