"""Column profiling: the data-quality snapshot an ETL engine takes
before/after a load (the table-level companion of validate.py's
file-level prechecks): per column, non-null count, exact distinct
count, and min/max rendered as strings.

Scale: ONE pass over the relation — all metrics for all columns go
into a single agg (partial-aggregated map-side). Exact
countDistinct over many columns expands the aggregate (one
shuffled copy per distinct column — Spark's Expand); at true
corpus scale swap `exact=False` to approx_count_distinct (HLL,
constant memory, no expand) — the default stays exact because the
profile IS the correctness artifact here and the DuckDB oracle is
exact."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list, exact: bool = True) -> DataFrame:
    """One row per profiled column:
    (column, n_nonnull, n_distinct, min_value, max_value)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            distinct_fn(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nn").cast("long").alias("n_nonnull"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select("_r.*")
