"""ulh_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system UpperlineHealth-Tech/ULH-ETL (a config-driven,
multi-tenant healthcare ETL pipeline: CSV/API ingest -> RAW -> REFINED
-> CURATED -> external entity sync), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design stance (see SURVEY.md §7): the engine is a *config-compiled
DataFrame pipeline* sitting above Catalyst. All relational work is
declared through the DataFrame/SQL API so Catalyst/Tungsten handle
pushdown, pruning, join strategy, codegen and AQE; custom layers are
limited to (1) the config->plan compiler, (2) normalized column
resolution, (3) incremental watermark state, (4) HTTP source/sink
adapters.
"""

__version__ = "0.1.0"

from ulh_etl_spark.session import get_spark, load_tables  # noqa: F401
