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
    usually lands far inside). The raw sketch value is checked here;
    the catalog query emits the exact count + the same bound as a
    flag (pinned TRUE by the DuckDB oracle)."""
    from ulh_etl_spark.queries.analytic import HLL_RSD

    ev = load_table(spark, sf_dir, "events")
    raw = {
        r["event_type"]: (r["approx"], r["exact"])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", HLL_RSD).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for k, (a, e) in raw.items():
        assert abs(a - e) <= max(3, 0.15 * e), (k, a, e)

    flags = {
        r["event_type"]: (r["exact_users"], r["sketch_within_3rsd"])
        for r in q62_approx_user_counts(spark, sf_dir).collect()
    }
    assert set(flags) == set(raw)
    for k, (e, ok) in flags.items():
        assert e == raw[k][1] and ok is True, (k, e, ok)


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

    # Two flake sources when the whole suite runs before this test:
    # the status store EVICTS old jobs past its retention cap (so an
    # id-list length stops growing — compare max id, it's monotonic)
    # and it's fed by an ASYNC listener bus (so a just-finished job
    # may not be visible yet — poll with a deadline).
    import time

    def last_job_id():
        return max(tracker.getJobIdsForGroup(None) or [], default=-1)

    def settle(deadline=5.0):
        prev = last_job_id()
        end = time.time() + deadline
        while time.time() < end:
            time.sleep(0.1)
            cur = last_job_id()
            if cur == prev:
                return cur
            prev = cur
        return prev

    before = settle()
    explicit = orders.groupBy("o_orderpriority").pivot(
        "o_orderstatus", ["F", "O", "P"]
    ).agg(F.sum("o_totalprice"))
    _ = explicit.schema  # force analysis
    assert settle(1.0) == before  # no values-discovery job

    before = last_job_id()
    implicit = orders.groupBy("o_orderpriority").pivot("o_orderstatus").agg(
        F.sum("o_totalprice")
    )
    _ = implicit.schema
    end = time.time() + 10.0
    while last_job_id() <= before and time.time() < end:
        time.sleep(0.1)
    assert last_job_id() > before  # the distinct+collect discovery job
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


def test_approx_quartiles_near_exact(spark, sf_dir):
    """approx_percentile(accuracy=1000) must land within 1 quantity
    unit of the exact per-group quartiles (integer-valued data). The
    raw sketch is checked here; the catalog query emits the exact
    quartiles + a 10% bound flag (pinned TRUE by the oracle)."""
    from ulh_etl_spark.queries.analytic import (
        q59_quantity_quartiles,
        q77_approx_quartiles,
    )

    exact = {
        r["l_returnflag"]: (r["q25"], r["q50"], r["q75"])
        for r in q59_quantity_quartiles(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_quartiles"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)"
            ).alias("approx_quartiles")
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, (e25, e50, e75) in exact.items():
        a25, a50, a75 = approx[flag]
        for e, a in ((e25, a25), (e50, a50), (e75, a75)):
            assert abs(e - a) <= 1.0, (flag, e, a)

    cat = {
        r["l_returnflag"]: r
        for r in q77_approx_quartiles(spark, sf_dir).collect()
    }
    for flag, (e25, e50, e75) in exact.items():
        r = cat[flag]
        assert (r["exact_q1"], r["exact_median"], r["exact_q3"]) == (
            e25, e50, e75,
        )
        assert r["sketch_within_10pct"] is True


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile (range-repartition + driver offsets) must be
    bit-identical to ntile(k) OVER (ORDER BY ...) — including the
    SQL-standard uneven-bucket rule (first n mod k buckets get the
    extra row) and the n < k edge."""
    import random

    from pyspark.sql import Window

    from ulh_etl_spark.operators.rank import global_ntile

    rnd = random.Random(73)
    rows = [(i, rnd.randrange(100)) for i in range(2003)]  # heavy ties
    df = spark.createDataFrame(rows, "id long, v long")
    for k in (1, 7, 10):
        want = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        got = {
            r["id"]: r["t"]
            for r in global_ntile(df, ["v", "id"], k, out_col="t").collect()
        }
        assert got == want, f"k={k}"

    small = spark.createDataFrame([(i, i) for i in range(5)], "id long, v long")
    got = {
        r["id"]: r["t"]
        for r in global_ntile(small, ["v", "id"], 10, out_col="t").collect()
    }
    assert got == {i: i + 1 for i in range(5)}  # n < k: one row per bucket


def test_q73_plan_has_no_single_partition_exchange(spark):
    """The decile plan must never funnel the corpus through one task:
    no Exchange SinglePartition (the unpartitioned-window signature)
    anywhere in the physical plan."""
    from ulh_etl_spark.plans.inspect import formatted_plan
    from ulh_etl_spark.queries.analytic import q73_price_deciles

    plan = formatted_plan(q73_price_deciles(spark, "/root/testdata/sf0.001"))
    assert "SinglePartition" not in plan


def test_global_row_number_matches_window(spark):
    import random

    from pyspark.sql import Window

    from ulh_etl_spark.operators.rank import global_row_number

    rnd = random.Random(93)
    df = spark.createDataFrame(
        [(i, rnd.randrange(50)) for i in range(997)], "id long, v long"
    )
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["v", "id"], out_col="rn").collect()
    }
    assert got == want


def test_release_rank_caches(spark):
    """Each global rank call pins a persisted intermediate for the
    session lifetime; release_rank_caches unpersists them all and the
    registry drains (double-release is a no-op)."""
    from ulh_etl_spark.operators.rank import (
        _LIVE_CACHES,
        global_ntile,
        release_rank_caches,
    )

    release_rank_caches()
    df = spark.range(200).toDF("v")
    global_ntile(df, ["v"], 4, out_col="t").count()
    global_ntile(df, [F.col("v").desc()], 5, out_col="t").count()
    assert len(_LIVE_CACHES) == 2
    assert release_rank_caches() == 2
    assert release_rank_caches() == 0 and not _LIVE_CACHES
