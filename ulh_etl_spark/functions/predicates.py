"""Config-driven predicate compiler (reference P7).

The reference compiles per-feed ``source_filter`` clauses — lists of
``{column, operator, value}`` — into an AND-combined SQL WHERE string
(REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1267-1299; config example
practice_ingest_config.json:695-701 ``ELIGIBLE = 'Y'``). Here the same
vocabulary compiles to native ``Column`` expressions so Catalyst can
push them into the parquet scan (predicate pushdown is free once the
filter is declarative — SURVEY §4).

Supported operators: = != <> > < >= <= LIKE, NOT LIKE, IN (comma-split
list), IS NULL, IS NOT NULL.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ulh_etl_spark.resolve import ColumnResolver


@dataclass
class FilterClause:
    column: str
    operator: str
    value: str | float | int | None = None


_BINARY = {"=", "==", "!=", "<>", ">", "<", ">=", "<="}


def _compile_clause(col: Column, op: str, value) -> Column:
    op = op.strip().upper()
    if op in ("=", "=="):
        return col == F.lit(value)
    if op in ("!=", "<>"):
        return col != F.lit(value)
    if op == ">":
        return col > F.lit(value)
    if op == "<":
        return col < F.lit(value)
    if op == ">=":
        return col >= F.lit(value)
    if op == "<=":
        return col <= F.lit(value)
    if op == "LIKE":
        return col.like(str(value))
    if op == "NOT LIKE":
        return ~col.like(str(value))
    if op == "IN":
        items = (
            [v.strip() for v in value.split(",")]
            if isinstance(value, str)
            else list(value)
        )
        return col.isin(items)
    if op == "IS NULL":
        return col.isNull()
    if op == "IS NOT NULL":
        return col.isNotNull()
    raise ValueError(f"unsupported predicate operator {op!r}")


def compile_predicate(
    clauses: list[FilterClause | dict],
    resolver: ColumnResolver | None = None,
) -> Column:
    """AND-combine config filter clauses into one Column predicate.

    Column names go through the normalized resolver when one is given
    (config names are punctuation/case-insensitive, SURVEY §1.3).
    """
    if not clauses:
        return F.lit(True)
    compiled: list[Column] = []
    for c in clauses:
        if isinstance(c, dict):
            c = FilterClause(**c)
        name = resolver.resolve_or_raise(c.column) if resolver else c.column
        compiled.append(_compile_clause(F.col(name), c.operator, c.value))
    return reduce(lambda a, b: a & b, compiled)


def apply_source_filter(df: DataFrame, clauses: list[FilterClause | dict]) -> DataFrame:
    return df.filter(compile_predicate(clauses, ColumnResolver.for_df(df)))


def future_only_filter(
    df: DataFrame,
    date_col: str,
    time_col: str | None = None,
    now: Column | None = None,
) -> DataFrame:
    """Future-only temporal filter (reference P9):
    ``TRY_TO_TIMESTAMP(date [|| ' ' || time]) > CURRENT_TIMESTAMP()``
    (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1539-1557). Lenient
    parse — unparseable strings become NULL and are filtered out.
    ``now`` is injectable for deterministic tests."""
    ts = (
        F.concat_ws(" ", F.col(date_col), F.col(time_col))
        if time_col
        else F.col(date_col)
    )
    now = now if now is not None else F.current_timestamp()
    return df.filter(F.try_to_timestamp(ts) > now)
