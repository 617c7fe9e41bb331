"""In-engine JSON config scan (reference S6).

The reference parses its practice config *inside the warehouse*:
JSON file format + ``LATERAL FLATTEN(cfg.$1:Practices) p, LATERAL
FLATTEN(p.value:ingest) f`` + ``f.value:a:b::type`` extraction
(RAW_ADLS_TO_RAW_SNOWFLAKE.py:551-609; same pattern in 5 other
notebooks). The engine's primary path is driver-side ``json.load``
(ulh_etl_spark.config — configs are ~100s of KB), but this module is
the distributed equivalent for genuinely large configs: multiLine
JSON read + nested ``explode`` + field access — byte-for-byte the
FLATTEN semantics, planned by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_config_df(spark: SparkSession, path: str) -> DataFrame:
    """Read a whole-file JSON config document (multiLine: one JSON
    object spanning the file, the shape LATERAL FLATTEN consumed)."""
    return spark.read.option("multiLine", True).json(path)


def flatten_practices(cfg: DataFrame, practices_field: str = "Practices") -> DataFrame:
    """FLATTEN #1: one row per practice (reference p.value)."""
    return cfg.select(F.explode(F.col(practices_field)).alias("practice")).select(
        F.col("practice.practice_name").alias("practice_name"),
        F.col("practice.*"),
    )


def flatten_ingest_entries(
    cfg: DataFrame, practices_field: str = "Practices", ingest_field: str = "ingest"
) -> DataFrame:
    """FLATTEN #1 + #2: one row per (practice, ingest entry) with the
    practice name carried alongside — the exact row set the
    reference's double LATERAL FLATTEN produces, with nested field
    access (``f.value:source:kind::string`` -> ``entry.source.kind``)
    available as ordinary struct columns."""
    practices = cfg.select(F.explode(F.col(practices_field)).alias("p"))
    return practices.select(
        F.col("p.practice_name").alias("practice_name"),
        F.explode(F.col(f"p.{ingest_field}")).alias("entry"),
    )


def select_entry_fields(entries: DataFrame, *dotted: str) -> DataFrame:
    """Typed field extraction from flattened entries: each ``a.b``
    path becomes a column named ``a_b`` (the ``::type`` casts are
    whatever the JSON reader inferred; add ``.cast`` downstream when
    the config stores numbers as strings)."""
    cols = [F.col("practice_name")]
    for path in dotted:
        cols.append(F.col(f"entry.{path}").alias(path.replace(".", "_")))
    return entries.select(*cols)
