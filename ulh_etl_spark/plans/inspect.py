"""Physical-plan introspection.

Parses ``df._jdf.queryExecution().explainString(formatted)`` — the
same text ``.explain("formatted")`` prints — into checkable facts:

- ``pushed_filters``: predicates that reached the parquet scan
  (PushedFilters). A filter NOT listed here runs post-scan and reads
  every row at 100 TB.
- ``scan_columns``: the ReadSchema projection — a scan reading all
  columns for a 2-column query is a missing-pruning bug.
- ``exchange_count``: shuffles. Every Exchange is a full network
  round of the data; algorithms should shuffle exactly as often as
  their semantics require (join+agg on the same key = 1, not 2).
- ``broadcast_join_count``: small-dimension joins that avoided a
  shuffle entirely.
- ``wholestage_codegen_spans``: fused JVM codegen regions — Python
  UDFs and exotic expressions break these.

Used by tests (tests/test_plans.py) and the plan audit tool
(tools/plan_audit.py) to keep every catalog query's plan honest.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (deduped, order kept)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        for f in m.group(1).split(","):
            f = f.strip()
            if f and f not in out:
                out.append(f)
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges (excludes BroadcastExchange —
    those are the cheap kind). Formatted mode prints each as a
    numbered ``(N) Exchange`` node."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", formatted_plan(df)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct fused codegen regions (formatted mode tags member
    operators with ``[codegen id : N]``)."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))


@dataclass
class PlanFacts:
    pushed_filters: list[str] = field(default_factory=list)
    scan_columns: list[list[str]] = field(default_factory=list)
    exchanges: int = 0
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    codegen_spans: int = 0

    def summary(self) -> dict:
        return {
            "pushed_filters": len(self.pushed_filters),
            "scans": len(self.scan_columns),
            "scan_cols": [len(c) for c in self.scan_columns],
            "exchanges": self.exchanges,
            "broadcast_joins": self.broadcast_joins,
            "sortmerge_joins": self.sortmerge_joins,
            "codegen_spans": self.codegen_spans,
        }


def plan_facts(df: DataFrame) -> PlanFacts:
    return PlanFacts(
        pushed_filters=pushed_filters(df),
        scan_columns=scan_columns(df),
        exchanges=exchange_count(df),
        broadcast_joins=broadcast_join_count(df),
        sortmerge_joins=sortmerge_join_count(df),
        codegen_spans=wholestage_codegen_spans(df),
    )
