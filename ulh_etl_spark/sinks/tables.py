"""Catalog-table sinks (reference K1-K5).

Storage model: managed Spark catalog tables (parquet). MERGE and
UPDATE (which Snowflake gave the reference for free) are implemented
storage-agnostically via staging-table swap — on a Delta/Iceberg
deployment you'd swap these bodies for native ``MERGE INTO`` /
``UPDATE`` and keep the signatures (SURVEY §7.3).

Scale notes: merge_upsert shuffles once on the merge keys and keeps
map-side dedup via row_number; the staging swap is a metadata
operation, not a data copy. The anti-join watermark design in
ulh_etl_spark.state avoids mutable flags entirely and is the
preferred incremental mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (reference A5 queries INFORMATION_SCHEMA,
    RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:690-696)."""
    return spark.catalog.tableExists(name)


def write_table(df: DataFrame, name: str, mode: str = "append") -> None:
    """K1: append / overwrite / create-if-absent
    (reference RAW_ADLS_TO_RAW_SNOWFLAKE.py:722-752)."""
    df.write.mode(mode).saveAsTable(name)


def truncate_table(spark: SparkSession, name: str) -> None:
    """K2: TRUNCATE before load (reference :713-720). Implemented as
    an empty overwrite preserving schema."""
    if table_exists(spark, name):
        spark.sql(f"TRUNCATE TABLE {name}")


def insert_select(
    spark: SparkSession, target: str, source_df: DataFrame
) -> int:
    """K3: INSERT INTO target SELECT ... — column-aligned append (the
    curated load, REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1413-1430).
    Returns rows written."""
    n = source_df.count()
    if table_exists(spark, target):
        cols = [f.name for f in spark.table(target).schema.fields]
        source_df = source_df.select(*cols)
        source_df.write.mode("append").insertInto(target)
    else:
        source_df.write.saveAsTable(target)
    return n


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table write: co-locates rows by hash(bucket
    cols) at WRITE time, so later equi-joins/aggregations on those
    columns skip their shuffle entirely (Catalyst sees the bucketing
    and drops the Exchange). The 100 TB play: bucket the big fact
    tables on their join key once, join shuffle-free forever after.
    Sorted within buckets for sort-merge-friendly probes."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def write_partitioned(
    df: DataFrame,
    name: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned write: one directory per partition value, so
    filters on partition columns prune entire directories at plan
    time (PartitionFilters in the scan) — the layout for zone tables
    keyed by practice/ingest-date."""
    df.write.mode(mode).partitionBy(*partition_cols).saveAsTable(name)


def _swap_staging(spark: SparkSession, target: str, staging: str) -> None:
    """Replace ``target`` with ``staging`` (metadata-only swap)."""
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")


def merge_upsert(
    spark: SparkSession,
    target: str,
    source_df: DataFrame,
    keys: list[str],
) -> dict[str, int]:
    """K4: MERGE upsert — WHEN MATCHED UPDATE all columns, WHEN NOT
    MATCHED INSERT (reference Rater8_Reviews.ipynb ``run_merge`` on
    (SURVEY_ID, QUESTION_ID)).

    Parquet-mode implementation: union target+source with a priority
    column, keep-latest per key via row_number (source wins), write to
    a staging table, metadata-swap. One shuffle on the merge keys.
    Returns {"updated": ..., "inserted": ...} (the reference reports
    the same split from MERGE output).
    """
    if not table_exists(spark, target):
        write_table(source_df, target, mode="overwrite")
        return {"updated": 0, "inserted": source_df.count()}

    tgt = spark.table(target)
    matched = source_df.join(tgt.select(*keys).distinct(), keys, "left_semi").count()
    inserted = source_df.count() - matched

    combined = tgt.withColumn("_prio", F.lit(0)).unionByName(
        source_df.withColumn("_prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("_prio").desc())
    merged = (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )
    staging = f"{target}__staging"
    merged.write.mode("overwrite").saveAsTable(staging)
    _swap_staging(spark, target, staging)
    return {"updated": matched, "inserted": inserted}


def update_flag(
    spark: SparkSession, target: str, flag_col: str, from_val, to_val
) -> int:
    """K5: the reference's flag-flip ``UPDATE t SET f=0 WHERE f=1``
    (RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:717-718). Parquet-mode:
    rewrite via staging swap. NOTE the reference semantics flip ALL
    matching rows, including rows another concurrent run landed
    mid-flight (race documented in SURVEY §7.4) — reproduced
    faithfully here; prefer ulh_etl_spark.state's watermark anti-join
    which has no such race. Returns rows flipped."""
    tgt = spark.table(target)
    n = tgt.filter(F.col(flag_col) == from_val).count()
    if n == 0:
        return 0
    flipped = tgt.withColumn(
        flag_col,
        F.when(F.col(flag_col) == from_val, F.lit(to_val)).otherwise(F.col(flag_col)),
    )
    staging = f"{target}__staging"
    flipped.write.mode("overwrite").saveAsTable(staging)
    _swap_staging(spark, target, staging)
    return n
