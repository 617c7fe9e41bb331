"""SCD Type-2 apply: version transitions, passthroughs, and
idempotence on hand-built histories."""

import datetime as dt

from pyspark.sql import functions as F

from ulh_etl_spark.operators.scd import scd2_apply

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 6, 1)

HIST_SCHEMA = (
    "k long, attr string, valid_from timestamp, valid_to timestamp, "
    "is_current boolean"
)


def _hist(spark):
    return spark.createDataFrame(
        [
            (1, "a", T1, None, True),    # will change -> close + new
            (2, "b", T1, None, True),    # unchanged in snapshot
            (3, "c", T1, None, True),    # absent from snapshot -> kept
            # a previously-closed version must pass through untouched
            (1, "z", dt.datetime(2023, 1, 1), T1, False),
        ],
        HIST_SCHEMA,
    )


def _snap(spark):
    return spark.createDataFrame(
        [
            (1, "A2", T2),  # changed
            (2, "b", T2),   # same attrs -> no new version
            (4, "d", T2),   # new key
        ],
        "k long, attr string, eff timestamp",
    )


def test_scd2_transitions(spark):
    out = scd2_apply(
        _hist(spark), _snap(spark), keys=["k"], attr_cols=["attr"],
        eff_col="eff",
    )
    rows = {
        (r["k"], r["attr"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert rows[(1, "z")] == (dt.datetime(2023, 1, 1), T1, False)  # history kept
    assert rows[(1, "a")] == (T1, T2, False)    # closed at snapshot eff
    assert rows[(1, "A2")] == (T2, None, True)  # new open version
    assert rows[(2, "b")] == (T1, None, True)   # unchanged: keeps valid_from
    assert rows[(3, "c")] == (T1, None, True)   # absent key: untouched
    assert rows[(4, "d")] == (T2, None, True)   # new key
    assert len(rows) == 6
    # invariant: exactly one open version per live key
    opens = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_scd2_idempotent_reapply(spark):
    """Re-applying the same snapshot changes nothing (fp comparison
    sees every key unchanged)."""
    once = scd2_apply(
        _hist(spark), _snap(spark), keys=["k"], attr_cols=["attr"],
        eff_col="eff",
    )
    twice = scd2_apply(
        once, _snap(spark), keys=["k"], attr_cols=["attr"], eff_col="eff"
    )
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b


def test_scd2_single_shuffle(spark):
    out = scd2_apply(
        _hist(spark), _snap(spark), keys=["k"], attr_cols=["attr"],
        eff_col="eff",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_scd2_null_attr_transitions_detected(spark):
    """NULL-involved attribute changes must register: (NULL,'x') ->
    ('x',NULL) and NULL -> '' are CHANGES (the naive concat_ws
    fingerprint collides on both)."""
    hist = spark.createDataFrame(
        [(1, None, "x", T1, None, True), (2, None, None, T1, None, True)],
        "k long, a string, b string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    snap = spark.createDataFrame(
        [(1, "x", None, T2), (2, "", None, T2)],
        "k long, a string, b string, eff timestamp",
    )
    out = scd2_apply(hist, snap, keys=["k"], attr_cols=["a", "b"],
                     eff_col="eff")
    rows = {(r["k"], r["a"], r["b"]): r["is_current"] for r in out.collect()}
    # both keys: old version closed, new version open
    assert rows[(1, None, "x")] is False and rows[(1, "x", None)] is True
    assert rows[(2, None, None)] is False and rows[(2, "", None)] is True
