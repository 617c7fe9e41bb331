"""Scheduled API-ingest orchestration (SURVEY §3.2 — the reference's
ELLKAY daily orchestrator, ELLKAY_DAILY_INGEST_TO_RAW_SNOWFLAKE.py).

Per practice: authenticate once, then run its API ingest entries IN
CONFIG ORDER — ordering is load-bearing (``UpdatedPatients`` must
land before the patient-loop endpoints that read its table; reference
:10-11, config practice_ingest_config.json:1379-1433). Each entry
dispatches to one of three fetch patterns (single call / token
pagination / per-entity fan-out), writes RAW with the standard
metadata columns, and failures are contained per-endpoint and
per-practice (continue-on-error, :628-655; per-endpoint statuses land
in the audit log).

Spark shape: a driver-side DAG executor over config entries —
sequential within a practice (the dependency chain), with the HTTP
adapters doing the fetching and one ``createDataFrame`` + append per
endpoint. Practices are independent and could run in parallel
threads; kept sequential for rate-limit friendliness (the reference's
choice too).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.config import IngestEntry, Practice
from ulh_etl_spark.sinks.logs import append_log
from ulh_etl_spark.sinks.tables import write_table
from ulh_etl_spark.sources.http import (
    Transport,
    entity_fanout_source,
    single_call_source,
    token_paginated_source,
)
from ulh_etl_spark.state import new_run_id


@dataclass
class EndpointResult:
    entry: str
    status: str  # SUCCESS | FAILED | SKIPPED
    rows: int = 0
    error: str = ""


@dataclass
class ApiRunReport:
    practice: str
    parent_run_id: str
    endpoints: list[EndpointResult] = field(default_factory=list)

    @property
    def succeeded(self) -> int:
        return sum(1 for e in self.endpoints if e.status == "SUCCESS")


def lookback_window(
    days_back: float = 7.0,
    hours_back: float | None = None,
    clock_skew_hours: float = 6.0,
    now: datetime | None = None,
) -> tuple[datetime, datetime]:
    """Incremental API pull window (reference :313-329): ``days_back``
    / ``hours_back`` lookback with a clock-skew guard subtracted from
    the start so slightly-late remote writes aren't missed."""
    now = now or datetime.now(timezone.utc)
    span = timedelta(hours=hours_back) if hours_back else timedelta(days=days_back)
    return now - span - timedelta(hours=clock_skew_hours), now


def _fetch(
    spark: SparkSession,
    entry: IngestEntry,
    transport: Transport,
    headers: dict,
) -> DataFrame:
    """Dispatch an API entry to its fetch pattern (reference
    :461-580): options.pattern = single | paginated | fanout."""
    opts = dict(entry.source.options)
    pattern = opts.get("pattern", "single")
    if pattern == "single":
        return single_call_source(
            spark, transport, opts["url"],
            method=opts.get("method", "POST"),
            headers=headers, json_body=opts.get("body"),
        )
    if pattern == "paginated":
        return token_paginated_source(
            spark, transport, opts["begin_url"], opts["next_url"],
            headers=headers, json_body=opts.get("body"),
            max_pages=int(opts.get("max_pages", 1000)),
        )
    if pattern == "fanout":
        ids_table = opts["ids_table"]        # produced by an EARLIER entry
        ids_column = opts["ids_column"]
        ids = spark.table(ids_table).select(ids_column).distinct()
        url_template = opts["url_template"]  # e.g. ".../patient/{id}"
        return entity_fanout_source(
            spark, lambda: transport, ids,
            url_for_id=lambda i: url_template.format(id=i),
            headers=headers,
            api_delay_ms=int(opts.get("api_delay_ms", 2000)),
        )
    raise ValueError(f"unknown api pattern {pattern!r}")


def run_api_practice(
    spark: SparkSession,
    practice: Practice,
    transport: Transport,
    auth_headers_fn: Callable[[Transport], dict] | None = None,
    parent_run_id: str | None = None,
) -> ApiRunReport:
    """Run all API ingest entries for one practice, in config order,
    continue-on-error per endpoint. ``auth_headers_fn`` runs ONCE per
    practice (the reference authenticates once then reuses the token,
    :318-347)."""
    rid = parent_run_id or new_run_id()
    rpt = ApiRunReport(practice=practice.practice_name, parent_run_id=rid)

    try:
        headers = auth_headers_fn(transport) if auth_headers_fn else {}
    except Exception as e:  # auth failure skips the whole practice
        for entry in practice.ingest:
            if entry.source.kind == "http":
                rpt.endpoints.append(
                    EndpointResult(entry.name, "SKIPPED", error=f"auth: {e}"[:200])
                )
        return rpt

    for entry in practice.ingest:
        if entry.source.kind != "http":
            continue
        started = datetime.now(timezone.utc).replace(tzinfo=None)
        try:
            df = _fetch(spark, entry, transport, headers)
            if df.isEmpty():
                rpt.endpoints.append(EndpointResult(entry.name, "SUCCESS", 0))
                continue
            df = (
                df.withColumn("file_load_time", F.current_timestamp())
                .withColumn("PARENT_RUN_ID", F.lit(rid))
                .withColumn("IS_NEW", F.lit(1) if entry.refined_table else F.lit(0))
            )
            write_table(df, entry.raw_table, mode="append")
            n = spark.table(entry.raw_table).filter(
                F.col("PARENT_RUN_ID") == rid
            ).count()
            rpt.endpoints.append(EndpointResult(entry.name, "SUCCESS", n))
            append_log(
                spark, "RAW", new_run_id(), rid, practice.practice_name,
                entry.name, "SUCCESS", rows_read=n, rows_written=n,
                started_at=started,
            )
        except Exception as e:  # continue-on-error per endpoint
            rpt.endpoints.append(
                EndpointResult(entry.name, "FAILED", error=str(e)[:300])
            )
            append_log(
                spark, "RAW", new_run_id(), rid, practice.practice_name,
                entry.name, "FAILED", started_at=started,
                error_message=str(e)[:500],
            )
    return rpt
