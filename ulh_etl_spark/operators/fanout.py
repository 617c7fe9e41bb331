"""Shared under-parallelism guard for Python-kernel stages.

A small table can arrive as 1-2 parquet splits, which would run an
expensive per-row stage (per-char md5, image decode) on as many
cores. The fix is a spread-out ``repartition`` — but ONLY when the
input is actually under-parallel, and that decision must come from
PLAN METADATA, never ``df.rdd``: under AQE the rdd probe eagerly
executes every upstream stage (a full corpus scan+shuffle just to
read a partition count — at 100 TB of media bytes that is an entire
extra pass) and then reports the AQE-coalesced count, judging any
small post-shuffle frame "under-parallel".

Decision rule (zero jobs triggered):
- plan already contains an Exchange -> that shuffle spreads the data;
  leave the frame alone.
- bare scan of fewer files than cores -> repartition to
  ``defaultParallelism``.
- no file-backed input (in-memory test frames, streaming) -> leave
  alone; localRelation parallelism is driver-chosen already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input arrives under-parallel. At
    scale the input already has thousands of splits and a blanket
    repartition would force a full shuffle of the raw corpus before
    any work happens — skip it. Never touches ``df.rdd`` and never
    triggers a job (see module docstring)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        return df
    files = df.inputFiles()
    if files and len(files) < parallelism:
        return df.repartition(parallelism)
    return df
