"""Data-layout optimization: Z-order (Morton) clustering.

At 100 TB, scan pruning is the cheapest query accelerator there is —
but min/max file statistics only prune on the SORT key. Z-ordering
interleaves the bits of two dimensions so that range-partitioning on
ONE derived key gives locality in BOTH: each output partition (and
therefore each parquet file's min/max stats) covers a small rectangle
of the (a, b) space instead of a full-width stripe, and filters on
EITHER dimension prune files. This is the same layout trick Delta's
OPTIMIZE ZORDER BY and Iceberg's sort orders apply — here as plain
Spark expressions + ``repartitionByRange``, storage-format-agnostic.

The key is a pure JVM expression (bit shifts folded by codegen):
zero Python, zero shuffle beyond the single range exchange of the
clustered write itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.
    Deterministic closed form — the DuckDB oracle computes the same
    sum of shifted bit tests."""
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def zorder_bucket_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    bucket_shift: int = 20,
) -> DataFrame:
    """Clustering-quality report: bucket = morton_key >> bucket_shift;
    per bucket, the row count and the (min, max) span of BOTH
    dimensions. Small spans on both axes = the layout prunes on
    either filter column. One partial-agged shuffle on the bucket
    key."""
    key = morton_key(F.col(col_a), F.col(col_b), bits)
    return (
        df.select(
            F.col(col_a), F.col(col_b),
            F.shiftright(key, bucket_shift).alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(col_a).alias(f"min_{col_a}"),
            F.max(col_a).alias(f"max_{col_a}"),
            F.min(col_b).alias(f"min_{col_b}"),
            F.max(col_b).alias(f"max_{col_b}"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of
    (``col_a``, ``col_b``): range-partition on the morton key (each
    file owns a contiguous key range = a small rectangle of the 2-D
    space, so its min/max stats prune on either column), sort within
    partitions so row groups inherit the locality too. One range
    exchange — the same cost as any sorted write."""
    if num_files is None:
        num_files = df.sparkSession.sparkContext.defaultParallelism
    key = morton_key(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
