"""Medallion-zone warehouse naming (SURVEY §1.1).

The reference lays tenants out across three Snowflake databases —
``UPPERLINE.RAW_INBOUND_AFFILIATEDATA.*``,
``UPPERLINE_REFINED.AFFILIATEDATA.*``,
``UPPERLINE_CURATED.AFFILIATEDATA.*`` (practice_ingest_config.json:
69-75) — one zone per stage, table per (practice, feed). Spark
equivalent: one catalog database per zone, ``saveAsTable`` into
zone-qualified names. Zone databases are plain Spark databases so
the layout survives on any catalog (Hive metastore, Glue, Unity).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

ZONES = ("raw", "refined", "curated")


def _ident(name: str) -> str:
    """Catalog-safe identifier: lowercase, non-alphanumerics -> _."""
    return re.sub(r"[^a-z0-9_]", "_", name.lower()).strip("_")


def zone_db(zone: str) -> str:
    if zone not in ZONES:
        raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
    return f"{zone}_zone"


def zone_table(zone: str, practice: str, entry: str) -> str:
    """Fully-qualified zone table name, e.g.
    ``raw_zone.adcs_appointments`` — the engine's analog of
    ``UPPERLINE.RAW_INBOUND_AFFILIATEDATA.ADCS_APPOINTMENTS``."""
    return f"{zone_db(zone)}.{_ident(practice)}_{_ident(entry)}"


def ensure_zones(spark: SparkSession) -> None:
    """Create the three zone databases if absent (idempotent)."""
    for z in ZONES:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {zone_db(z)}")


def apply_zone_naming(entry, practice_name: str) -> None:
    """Fill an IngestEntry's raw/refined/curated table names from the
    zone convention wherever the config left them unset."""
    if entry.raw_table is None:
        entry.raw_table = zone_table("raw", practice_name, entry.name)
    if entry.refined_table is None and entry.transforms:
        entry.refined_table = zone_table("refined", practice_name, entry.name)
    if entry.curated_table is None and entry.curated_mapping:
        entry.curated_table = zone_table("curated", practice_name, entry.name)
