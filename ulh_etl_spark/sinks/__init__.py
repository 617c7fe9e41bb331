"""Sinks: catalog table writes (append/overwrite/truncate/
insert-select), MERGE upsert, audit logs, entity-store upsert
(Dataverse-like $batch semantics), archive file moves."""

from ulh_etl_spark.sinks.entity import (  # noqa: F401
    batch_upsert_http,
    classify_create_update,
    entity_mirror_merge,
)
from ulh_etl_spark.sinks.tables import (  # noqa: F401
    insert_select,
    merge_upsert,
    table_exists,
    truncate_table,
    write_table,
)
