"""Source adapters: staged files (CSV/TXT/gz), raw-line scans, SQL
query sources, and HTTP APIs (refresh-handshake, OAuth2+retry, token
pagination, per-entity fan-out, OData paging) behind one
``Source -> DataFrame`` protocol."""

from ulh_etl_spark.sources.files import (  # noqa: F401
    FileInfo,
    csv_scan,
    list_stage_files,
    raw_line_scan,
)
from ulh_etl_spark.sources.http import (  # noqa: F401
    HttpResponse,
    OAuth2ClientCredentials,
    entity_fanout_source,
    hierarchy_walk_source,
    odata_paged_source,
    refresh_handshake_source,
    retry_call,
    single_call_source,
    token_paginated_source,
)
from ulh_etl_spark.sources.query import query_source  # noqa: F401
