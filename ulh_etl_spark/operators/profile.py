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


def embedding_psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    dims: int = 8,
    bins: int = 4,
) -> DataFrame:
    """Population-stability-index drift between two embedding
    snapshots, per dimension: equal-width bins derived from the
    REFERENCE snapshot's per-dim [min, max], Laplace-smoothed bin
    proportions on both sides, PSI = sum over bins of
    (p_ref - p_cur) * ln(p_ref / p_cur). The standard model-input
    drift monitor (PSI > 0.2 ~ investigate, > 0.25 ~ retrain),
    applied to each embedding dimension — catches encoder or
    upstream-distribution shifts before they poison ANN indexes and
    semantic dedup.

    Bit-stable cross-engine: bin counts are integers; every float
    step (bin width, proportions, each bin's PSI term) is a single
    fixed-order double expression — bins pivot to COLUMNS via
    conditional aggregation, so the final per-dim sum adds a fixed
    literal chain (never a float SUM whose partial order floats).
    Values outside the reference range clamp to the edge bins (that
    mass shift is exactly what PSI should see).

    Shape: slice to ``dims`` leading dimensions BEFORE exploding
    (explode factor = dims, not vector length), one tiny per-dim
    bounds agg broadcast back, one per-dim groupBy. Linear in
    rows x dims at any corpus size.

    Output: (dim, n_ref, n_cur, psi)."""
    if dims < 1 or bins < 2:
        raise ValueError("dims must be >= 1 and bins >= 2")
    x = F.col("x").cast("double")

    def _expl(df: DataFrame, snap: int) -> DataFrame:
        return df.select(
            F.lit(snap).alias("snap"),
            F.posexplode(F.slice(F.col(vec_col), 1, dims)).alias("dim", "x"),
        )

    expl = _expl(ref, 0).unionByName(_expl(cur, 1)).select(
        "snap", "dim", x.alias("x")
    )
    bounds = (
        expl.filter(F.col("snap") == 0)
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(bins))
    bin_col = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor((F.col("x") - F.col("mn")) / width),
            ),
        )
    )
    binned = expl.join(F.broadcast(bounds), "dim").select(
        "dim", "snap", bin_col.cast("int").alias("bin")
    )
    aggs = []
    for s, tag in ((0, "r"), (1, "c")):
        for b in range(bins):
            aggs.append(
                F.sum(
                    ((F.col("snap") == s) & (F.col("bin") == b)).cast("long")
                ).alias(f"_{tag}{b}")
            )
    per = binned.groupBy("dim").agg(*aggs)
    n_ref = sum([F.col(f"_r{b}") for b in range(1, bins)], F.col("_r0"))
    n_cur = sum([F.col(f"_c{b}") for b in range(1, bins)], F.col("_c0"))
    per = per.withColumn("n_ref", n_ref).withColumn("n_cur", n_cur)
    psi = F.lit(0.0)
    for b in range(bins):
        p_r = (F.col(f"_r{b}").cast("double") + F.lit(1.0)) / (
            F.col("n_ref").cast("double") + F.lit(float(bins))
        )
        p_c = (F.col(f"_c{b}").cast("double") + F.lit(1.0)) / (
            F.col("n_cur").cast("double") + F.lit(float(bins))
        )
        psi = psi + (p_r - p_c) * F.log(p_r / p_c)
    return per.select(
        "dim", "n_ref", "n_cur", F.round(psi, 6).alias("psi")
    )
