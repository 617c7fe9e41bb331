"""As-of join and bucketed range join: model-based correctness on
hand-built frames plus plan-shape proofs (no nested-loop joins, one
shuffle for the as-of union-window)."""

import datetime as dt

from pyspark.sql import functions as F

from ulh_etl_spark.operators.temporal import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 12:00:00")),
            (3, "k2", _ts("2024-01-01 09:00:00")),
            (4, "k3", _ts("2024-01-01 09:00:00")),  # no right rows at all
        ],
        "lid long, k string, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 10:00:00"), 100, 1.0),  # equal-ts: inclusive
            ("k1", _ts("2024-01-01 11:00:00"), 101, 2.0),
            ("k1", _ts("2024-01-01 11:00:00"), 102, 3.0),  # tie -> max rid wins
            ("k1", _ts("2024-01-01 13:00:00"), 103, 4.0),  # future: never matches
            ("k2", _ts("2024-01-01 09:30:00"), 200, 5.0),  # after left: no match
        ],
        "k string, rts timestamp, rid long, val double",
    )


def test_asof_join_semantics(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload=("rid", "val"),
        tiebreak="rid",
    )
    rows = {r["lid"]: r for r in out.collect()}
    assert len(rows) == 4
    # equal timestamp is inclusive (backward as-of)
    assert rows[1]["matched_rid"] == 100 and rows[1]["matched_val"] == 1.0
    # two right rows at 11:00 — deterministic max-tiebreak winner
    assert rows[2]["matched_rid"] == 102 and rows[2]["matched_val"] == 3.0
    # right row strictly after the left ts does not match
    assert rows[3]["matched_rid"] is None
    # key with no right rows survives with nulls (left outer)
    assert rows[4]["matched_rid"] is None and rows[4]["matched_val"] is None


def test_asof_join_payload_atomicity(spark):
    """All payload columns come from the SAME right row (struct pack),
    never a column-wise mix of different rows."""
    out = asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload=("rid", "val"),
        tiebreak="rid",
    ).filter(F.col("matched_rid").isNotNull())
    pairs = {(r["matched_rid"], r["matched_val"]) for r in out.collect()}
    legal = {(100, 1.0), (101, 2.0), (102, 3.0), (103, 4.0), (200, 5.0)}
    assert pairs <= legal


def test_asof_join_tolerance(spark):
    """Matches farther than the tolerance horizon are nulled out in
    the same window pass (no extra join)."""
    out = {
        r["lid"]: r["matched_rid"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts",
            right_ts="rts", right_payload=("rid",), tiebreak="rid",
            tolerance_seconds=1800,
        ).collect()
    }
    # lid=1 matches at 0s gap (keeps); lid=2 (12:00) best match is
    # 11:00 -> 3600s gap > 1800 -> nulled
    assert out[1] == 100 and out[2] is None


def test_asof_join_forward(spark):
    """direction='forward': earliest right row at-or-after each left
    row, inclusive at equal ts, greatest tiebreak on ties."""
    out = {
        r["lid"]: r["matched_rid"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts",
            right_ts="rts", right_payload=("rid",), tiebreak="rid",
            direction="forward",
        ).collect()
    }
    # lid=1 at 10:00: equal-ts row 100 (inclusive)
    # lid=2 at 12:00: next is 13:00 -> 103
    # lid=3 at 09:00: k2's 09:30 row -> 200
    # lid=4: no right rows -> None
    assert out == {1: 100, 2: 103, 3: 200, 4: None}


def test_asof_join_ansi_null_semantics(spark):
    """NULL right timestamps / keys never match (ANSI comparison
    semantics); NULL-ts left rows come through unmatched."""
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 08:00:00")),
            (2, None, _ts("2024-01-01 08:00:00")),  # null key
            (3, "k1", None),  # null left ts
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", None, 9, 9.0),  # null ts: must never backfill
            (None, _ts("2024-01-01 07:00:00"), 8, 8.0),  # null key
        ],
        "k string, rts timestamp, rid long, val double",
    )
    out = {
        r["lid"]: r["matched_rid"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=("rid", "val"), tiebreak="rid",
        ).collect()
    }
    assert out == {1: None, 2: None, 3: None}


def test_asof_join_single_shuffle(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload=("rid",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-window formulation: exactly one exchange (hash on the key),
    # and no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (i, f"k{rng.randint(0, 3)}", base + dt.timedelta(seconds=rng.randint(0, 20000)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "eid long, k string, ts timestamp")
    a = df.select("k", "ts", F.col("eid").alias("a_id"))
    b = df.select("k", "ts", F.col("eid").alias("b_id"))
    out = range_join(
        a, b, on="k", left_ts="ts", right_ts="ts", window_seconds=600,
        left_cols=("a_id",), right_cols=("b_id",),
    )
    got = {(r["a_id"], r["b_id"], r["gap_us"]) for r in out.collect()}
    naive = set()
    for i1, k1, t1 in rows:
        for i2, k2, t2 in rows:
            gap = (t2 - t1).total_seconds()
            if k1 == k2 and 0 < gap <= 600:
                naive.add((i1, i2, int(gap * 1_000_000)))
    assert got == naive


def test_range_join_no_nested_loop(spark):
    df = _left(spark).select("k", "ts", F.col("lid").alias("a_id"))
    out = range_join(
        df,
        df.withColumnRenamed("a_id", "b_id"),
        on="k",
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        left_cols=("a_id",),
        right_cols=("b_id",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_zscore_anomalies_model(spark):
    """Hand-checkable trailing-baseline z-scores (baseline=2):
    points with < 2 predecessors get NULL z and are never flagged;
    the spike after a flat baseline is flagged; the current point is
    excluded from its own baseline."""
    import math

    import pytest as _pytest

    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    rows = [("t1", 10.0), ("t2", 12.0), ("t3", 11.0), ("t4", 100.0)]
    df = spark.createDataFrame(rows, "t string, v double")
    out = {
        r.t: (r.baseline_mean, r.zscore, r.is_anomaly)
        for r in rolling_zscore_anomalies(
            df, "v", "t", baseline=2, threshold=2.0
        ).collect()
    }
    assert out["t1"] == (None, None, False)
    assert out["t2"] == (None, None, False)
    # t3 baseline {10, 12}: mean 11, std sqrt(2) -> z = 0
    assert out["t3"][0] == 11.0 and out["t3"][1] == 0.0
    assert out["t3"][2] is False
    # t4 baseline {12, 11}: mean 11.5, var 0.5 -> z = 88.5/sqrt(0.5)
    want = (100.0 - 11.5) / math.sqrt(0.5)
    assert abs(out["t4"][1] - want) < 1e-9
    assert out["t4"][2] is True

    with _pytest.raises(ValueError):
        rolling_zscore_anomalies(df, "v", "t", baseline=1)


def test_rolling_zscore_flat_baseline(spark):
    """Zero-variance trailing baseline must not divide by zero
    (hard SparkArithmeticException under Spark 4's default ANSI
    mode): flat-baseline points get NULL z, and is_anomaly is
    (x != mean) — a constant series never flags, a spike after a
    flat run does. Regression for ADVICE r7 (temporal.py:244)."""
    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    # constant series: every full window is flat; nothing flags
    rows = [(f"t{i}", 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "t string, v double")
    out = rolling_zscore_anomalies(
        df, "v", "t", baseline=3, threshold=2.0
    ).collect()
    assert all(r.zscore is None for r in out)
    assert all(r.is_anomaly is False for r in out)
    full = [r for r in out if r.baseline_mean is not None]
    assert len(full) == 3 and all(r.baseline_mean == 5.0 for r in full)

    # spike after a flat baseline: NULL z, but flagged via x != mean
    rows = [("t1", 5.0), ("t2", 5.0), ("t3", 5.0), ("t4", 9.0)]
    df = spark.createDataFrame(rows, "t string, v double")
    got = {
        r.t: (r.baseline_mean, r.zscore, r.is_anomaly)
        for r in rolling_zscore_anomalies(
            df, "v", "t", baseline=3, threshold=2.0
        ).collect()
    }
    assert got["t4"] == (5.0, None, True)


def test_rolling_zscore_noninteger_flat_baseline(spark):
    """Regression for the r9 half-fix (ADVICE r9, temporal.py:269):
    a constant NON-INTEGER baseline (all 0.1) can leave a tiny
    positive round-off residue in the closed-form variance, which
    a `var > 0`-only guard turns into a huge spurious z. The
    min==max guard must classify these frames as flat — NULL z,
    is_anomaly = (x != min) — and the DuckDB oracle twin (the
    q132/q139 guard expression) must agree row-for-row."""
    import duckdb

    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    rows = [(f"t{i}", 0.1) for i in range(1, 6)] + [("t6", 0.4)]
    df = spark.createDataFrame(rows, "t string, v double")
    got = {
        r.t: (r.zscore, r.is_anomaly)
        for r in rolling_zscore_anomalies(
            df, "v", "t", baseline=4, threshold=2.0
        ).collect()
    }
    # flat 0.1 frames: never scored, never flagged
    assert got["t5"] == (None, False)
    # spike after the flat run: NULL z, flagged via x != mn
    assert got["t6"] == (None, True)

    # Oracle twin: the exact guard shape shipped in q132/q139.
    oracle = duckdb.sql(
        """
        WITH pts(t, v) AS (VALUES
            ('t1', 0.1), ('t2', 0.1), ('t3', 0.1),
            ('t4', 0.1), ('t5', 0.1), ('t6', 0.4)
        ), w AS (
            SELECT t, v,
                   COUNT(v) OVER win AS cnt,
                   SUM(v) OVER win AS s,
                   SUM(v * v) OVER win AS sq,
                   MIN(v) OVER win AS mn,
                   MAX(v) OVER win AS mx
            FROM pts
            WINDOW win AS (ORDER BY t
                           ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
        )
        SELECT t,
               CASE WHEN cnt >= 4 AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN (v - s / cnt)
                         / sqrt((sq - s * s / cnt) / (cnt - 1))
               END AS zscore,
               CASE WHEN cnt >= 4 AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN abs((v - s / cnt)
                          / sqrt((sq - s * s / cnt) / (cnt - 1))) > 2.0
                    WHEN cnt >= 4 THEN v <> mn
                    ELSE FALSE END AS is_anomaly
        FROM w
        """
    ).fetchall()
    assert {t: (z, a) for t, z, a in oracle} == got


def test_rolling_zscore_large_magnitude_low_spread(spark):
    """ADVICE r9 cancellation backstop: baselines near 1e16 with a
    1-ulp spread make the closed-form variance cancel to exactly 0
    or negative while min != max. Without the var > 0 guard that is
    a divide-by-zero (hard error under Spark 4 default ANSI) or a
    NaN z whose abs() > threshold is TRUE under NaN ordering. Such
    rows must fall through to the x != min flat branch — no crash,
    no NaN, deterministic flags."""
    import math

    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    base = 1.0e16
    up = math.nextafter(base, math.inf)  # 1 ulp apart: min != max
    rows = [("t1", base), ("t2", up), ("t3", base), ("t4", up), ("t5", base)]
    df = spark.createDataFrame(rows, "t string, v double")
    out = rolling_zscore_anomalies(
        df, "v", "t", baseline=4, threshold=2.0
    ).collect()
    for r in out:
        assert r.zscore is None or not math.isnan(r.zscore)
    got = {r.t: r.is_anomaly for r in out}
    # t5 = base while frame-min is base -> x == mn -> not flagged
    # (when var cancels <= 0); if var survives > 0 the true z is
    # tiny, also not flagged. Either leg: False, never NaN-True.
    assert got["t5"] is False


def test_ewma_anomaly_model(spark):
    """Window=2, alpha=0.5: weights (0.5, 0.25)/0.75 — hand-checkable.
    First `window` points get NULL ewma and is_anomaly FALSE; a spike
    over mult x ewma flags; series are scored independently per key."""
    import pytest as _pytest

    from ulh_etl_spark.operators.temporal import ewma_anomaly

    rows = [("a", f"d{i}", float(v)) for i, v in enumerate([4, 4, 4, 4, 20])]
    rows += [("b", f"d{i}", 100.0) for i in range(3)]  # flat, never flags
    df = spark.createDataFrame(rows, "k string, day string, x double")
    out = {
        (r.k, r.day): r
        for r in ewma_anomaly(
            df, "x", "day", partition_col="k", alpha=0.5, window=2, mult=2.0
        ).collect()
    }
    # warmup rows: no baseline yet
    for key in [("a", "d0"), ("a", "d1"), ("b", "d0"), ("b", "d1")]:
        assert out[key].ewma is None and out[key].is_anomaly is False
    # (0.5*4 + 0.25*4) / 0.75 = 4
    assert out[("a", "d2")].ewma == 4.0 and not out[("a", "d2")].is_anomaly
    assert out[("a", "d3")].ewma == 4.0
    # spike: 20 > 2 * 4
    assert out[("a", "d4")].ewma == 4.0 and out[("a", "d4")].is_anomaly
    assert out[("b", "d2")].ewma == 100.0 and not out[("b", "d2")].is_anomaly

    with _pytest.raises(ValueError):
        ewma_anomaly(df, "x", "day", alpha=1.5)
    with _pytest.raises(ValueError):
        ewma_anomaly(df, "x", "day", window=0)


def test_gap_fill_daily_fills_and_flags(spark):
    from datetime import datetime

    from ulh_etl_spark.operators.temporal import gap_fill_daily

    rows = [
        ("a", datetime(2024, 1, 1, 5), 10.0),
        ("a", datetime(2024, 1, 1, 9), 2.5),
        # Jan 2-3 missing
        ("a", datetime(2024, 1, 4, 1), 7.0),
        ("b", datetime(2024, 1, 2, 3), 1.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        (r.event_type, r.day): (r.observed, r.day_total, r.filled)
        for r in gap_fill_daily(df, "ts", "event_type", "value").collect()
    }
    assert out[("a", "2024-01-01")] == (True, 12.5, 12.5)
    assert out[("a", "2024-01-02")] == (False, None, 12.5)
    assert out[("a", "2024-01-03")] == (False, None, 12.5)
    assert out[("a", "2024-01-04")] == (True, 7.0, 7.0)
    assert out[("b", "2024-01-02")] == (True, 1.0, 1.0)
    assert len(out) == 5  # scaffold never extends past per-key bounds


def test_gap_fill_daily_single_day_key(spark):
    from datetime import datetime

    from ulh_etl_spark.operators.temporal import gap_fill_daily

    df = spark.createDataFrame(
        [("x", datetime(2024, 6, 1), 3.0)],
        "event_type string, ts timestamp, value double",
    )
    rows = gap_fill_daily(df, "ts", "event_type", "value").collect()
    assert len(rows) == 1 and rows[0].observed and rows[0].filled == 3.0


def test_peak_concurrency_hand_intervals(spark):
    from datetime import datetime

    from ulh_etl_spark.operators.temporal import peak_concurrency_daily

    d = datetime
    rows = [
        # three overlapping on Jan 1 (peak 3), one isolated later
        (d(2024, 1, 1, 10, 0), d(2024, 1, 1, 11, 0)),
        (d(2024, 1, 1, 10, 30), d(2024, 1, 1, 12, 0)),
        (d(2024, 1, 1, 10, 45), d(2024, 1, 1, 10, 50)),
        (d(2024, 1, 1, 20, 0), d(2024, 1, 1, 20, 5)),
        # cross-midnight: active at Jan 2 00:00, ends 01:00
        (d(2024, 1, 1, 23, 0), d(2024, 1, 2, 1, 0)),
        # Jan 2 day session overlapping the carry-over
        (d(2024, 1, 2, 0, 30), d(2024, 1, 2, 0, 45)),
    ]
    df = spark.createDataFrame(
        rows, "session_start timestamp, session_end timestamp"
    )
    got = {
        r.day: (r.n_started, r.peak_concurrency)
        for r in peak_concurrency_daily(df).collect()
    }
    # Jan 1: peak 3 mid-morning; 5 sessions started
    assert got["2024-01-01"] == (5, 3)
    # Jan 2: baseline 1 (the cross-midnight session) + the 00:30 one
    assert got["2024-01-02"] == (1, 2)


def test_peak_concurrency_touching_endpoints_are_concurrent(spark):
    from datetime import datetime

    from ulh_etl_spark.operators.temporal import peak_concurrency_daily

    d = datetime
    # B starts exactly when A ends: inclusive semantics -> peak 2
    df = spark.createDataFrame(
        [
            (d(2024, 3, 1, 9, 0), d(2024, 3, 1, 10, 0)),
            (d(2024, 3, 1, 10, 0), d(2024, 3, 1, 11, 0)),
        ],
        "session_start timestamp, session_end timestamp",
    )
    rows = peak_concurrency_daily(df).collect()
    assert rows[0].peak_concurrency == 2


def test_mad_anomalies_hand_series(spark):
    from ulh_etl_spark.operators.temporal import mad_anomalies

    # series: 10,10,10,12,100 -> med 10, adevs 0,0,0,2,90 -> mad 0... 
    # use 9,10,10,11,12,100: med 10.5, adevs 1.5,.5,.5,.5,1.5,89.5
    # -> mad 1.0; threshold 3*1.4826*1.0 = 4.4478: only 100 flags
    rows = [("a", f"d{i}", v) for i, v in enumerate([9, 10, 10, 11, 12, 100])]
    daily = spark.createDataFrame(rows, "k string, day string, n long")
    got = {r.day: (r.med, r.mad, r.is_anomaly) for r in
           mad_anomalies(daily, "n", "k").collect()}
    assert got["d5"] == (10.5, 1.0, True)
    assert all(not got[f"d{i}"][2] for i in range(5))


def test_mad_anomalies_constant_series_division_free(spark):
    from ulh_etl_spark.operators.temporal import mad_anomalies

    # constant series: mad 0 -> threshold 0 -> only deviants flag,
    # and nothing NaNs/crashes (there is no division to poison)
    rows = [("k", f"d{i}", 7) for i in range(6)] + [("k", "dx", 8)]
    daily = spark.createDataFrame(rows, "k string, day string, n long")
    got = {r.day: r.is_anomaly for r in
           mad_anomalies(daily, "n", "k").collect()}
    assert got["dx"] is True
    assert all(got[f"d{i}"] is False for i in range(6))
