"""Query catalog: every operator from SURVEY.md §2 (plus the
training-data operators) exposed as (spark, sf_dir) -> DataFrame
callables with matching DuckDB oracle SQL.

Each module contributes two dicts: ``QUERIES`` and ``ORACLES``
(oracle omitted only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    from ulh_etl_spark.queries import (
        analytic,
        curation,
        dedup,
        multimodal,
        relational,
        similarity,
        streaming,
        temporal,
        textops,
    )

    return [
        relational,
        textops,
        dedup,
        similarity,
        streaming,
        multimodal,
        temporal,
        analytic,
        curation,
    ]
