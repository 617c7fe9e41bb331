"""Audit-log sink (reference K6): four per-stage append-only
``*_INGEST_LOG`` tables with run lineage and timings
(RAW_ADLS_TO_RAW_SNOWFLAKE.py:316-382 and the three sibling loggers).

Implemented as parameterized 1-row DataFrame appends — deliberately
NOT string-spliced SQL (the reference escapes quotes by hand into
INSERT VALUES; SURVEY §7.1 calls out fixing that)."""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import SparkSession

LOG_SCHEMA = (
    "log_id string, stage string, run_id string, parent_run_id string, "
    "practice string, entry string, status string, rows_read bigint, "
    "rows_written bigint, started_at timestamp, finished_at timestamp, "
    "duration_seconds double, error_message string"
)

STAGES = ("PRECHECK", "RAW", "REFINED", "CURATED")

# Engine-noise prefix in surfaced error messages (reference F19 strips
# the same `(\d+): uuid: ... (CODE):` prefix before logging/notifying,
# RAW_ADLS_TO_RAW_SNOWFLAKE.py:760-766).
_ERROR_PREFIX = re.compile(
    r"^\(\d+\):\s*(?:[0-9a-fA-F-]{8,}:\s*)?(?:\d+\s*)?(?:\([A-Z0-9]+\):\s*)?"
)


def clean_error_message(msg: str, max_len: int = 500) -> str:
    """Strip engine-internal error prefixes so logs/notifications
    carry the human-relevant message."""
    return _ERROR_PREFIX.sub("", (msg or "").strip())[:max_len]


def log_table_name(stage: str) -> str:
    return f"{stage.lower()}_ingest_log"


def append_log(
    spark: SparkSession,
    stage: str,
    run_id: str,
    parent_run_id: str,
    practice: str,
    entry: str,
    status: str,
    rows_read: int = 0,
    rows_written: int = 0,
    started_at: datetime | None = None,
    finished_at: datetime | None = None,
    error_message: str = "",
) -> None:
    import uuid

    now = datetime.now(timezone.utc).replace(tzinfo=None)
    started = (started_at or now).replace(tzinfo=None)
    finished = (finished_at or now).replace(tzinfo=None)
    duration = (finished - started).total_seconds()
    row = (
        str(uuid.uuid4()),
        stage,
        run_id,
        parent_run_id,
        practice,
        entry,
        status,
        rows_read,
        rows_written,
        started,
        finished,
        duration,
        error_message,
    )
    spark.createDataFrame([row], LOG_SCHEMA).write.mode("append").saveAsTable(
        log_table_name(stage)
    )
