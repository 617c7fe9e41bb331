"""Analytic catalog: sketch error bounds and plan-shape proofs for
rollup/pivot/rolling (one shuffle each, no driver-side pivot
discovery)."""

from pyspark.sql import functions as F

from ulh_etl_spark.queries.analytic import (
    q54_rollup_agg,
    q55_pivot_status,
    q56_rolling_order_total,
    q62_approx_user_counts,
)
from ulh_etl_spark.session import load_table


def test_hll_within_rsd_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.05) stays within 3x the configured
    relative error of the exact count (generous: HLL++ bias correction
    usually lands far inside)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q62_approx_user_counts(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(3, 0.15 * e), (k, approx[k], e)


def test_rollup_levels_consistent(spark, sf_dir):
    """Grand total == sum of flag-level rows == sum of leaf rows."""
    rows = q54_rollup_agg(spark, sf_dir).collect()
    leaf = [r for r in rows if r["l_returnflag"] and r["l_linestatus"]]
    mid = [r for r in rows if r["l_returnflag"] and r["l_linestatus"] is None]
    top = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(top) == 1
    assert top[0]["n_rows"] == sum(r["n_rows"] for r in leaf) == sum(r["n_rows"] for r in mid)


def test_rollup_single_shuffle(spark, sf_dir):
    plan = q54_rollup_agg(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # Expand + one hash-partitioned exchange: rollup costs the same
    # shuffle count as a flat groupBy
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pivot_no_values_discovery_job(spark, sf_dir):
    """Explicit pivot values => resolving the frame runs no extra
    distinct+collect job (implicit pivot runs one to discover the
    pivot columns before the plan exists)."""
    orders = load_table(spark, sf_dir, "orders")
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    before = jobs()
    explicit = orders.groupBy("o_orderpriority").pivot(
        "o_orderstatus", ["F", "O", "P"]
    ).agg(F.sum("o_totalprice"))
    _ = explicit.schema  # force analysis
    explicit_jobs = jobs() - before

    before = jobs()
    implicit = orders.groupBy("o_orderpriority").pivot("o_orderstatus").agg(
        F.sum("o_totalprice")
    )
    _ = implicit.schema
    implicit_jobs = jobs() - before

    assert explicit_jobs == 0
    assert implicit_jobs >= 1
    assert list(q55_pivot_status(spark, sf_dir).columns) == [
        "o_orderpriority", "F", "O", "P",
    ]


def test_rolling_window_single_shuffle(spark, sf_dir):
    plan = (
        q56_rolling_order_total(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
