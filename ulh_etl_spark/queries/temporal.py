"""Temporal-join catalog queries over ``events`` x ``orders``:
as-of join (latest order at or before each event) and windowed range
self-join (event pairs within an hour). Oracle SQL uses plain ANSI
inequality joins + windows — correct but quadratic-per-key, which is
exactly why the engine side uses the union-window / bucketed shapes
(ulh_etl_spark.operators.temporal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.operators.temporal import asof_join, range_join
from ulh_etl_spark.session import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q52_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the latest order of the same customer placed at
    or before the event (backward as-of, o_orderkey tiebreak). One
    shuffle on the key via the union-window formulation."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=("o_orderkey", "o_totalprice"),
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("event_ts"),
        F.date_format("matched_o_orderdate", _TS_FMT).alias("matched_orderdate"),
        F.col("matched_o_orderkey").alias("matched_orderkey"),
        F.col("matched_o_totalprice").alias("matched_totalprice"),
    )


def q53_event_pairs_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs with the second event within (0, 1h] of
    the first — bucketed interval join (one equi-join on
    (user, hour-bucket), probe side exploded x2, exact residual
    filter)."""
    events = load_table(spark, sf_dir, "events")
    a = events.select("user_id", "ts", F.col("event_id").alias("a_event"))
    b = events.select("user_id", "ts", F.col("event_id").alias("b_event"))
    return range_join(
        a,
        b,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        left_cols=("a_event",),
        right_cols=("b_event",),
        strict_after=True,
    )


_SCD_CUTOFF = "1997-01-01"


def q81_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 versioning: build the priority history from each
    customer's latest pre-1997 order, then apply the all-time latest
    orders as a snapshot — customers whose latest priority changed get
    a closed version + a new open version; unchanged keep their
    original valid_from. One union + one window per the operator."""
    from pyspark.sql import Window

    from ulh_etl_spark.operators.scd import scd2_apply

    orders = load_table(spark, sf_dir, "orders")

    def latest(df):
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderdate"),
            )
        )

    hist = latest(orders.filter(F.col("o_orderdate") < _SCD_CUTOFF)).select(
        "custkey",
        "priority",
        F.col("o_orderdate").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    snap = latest(orders).select(
        "custkey", "priority", F.col("o_orderdate").alias("eff")
    )
    out = scd2_apply(
        hist, snap, keys=["custkey"], attr_cols=["priority"], eff_col="eff"
    )
    return out.select(
        "custkey",
        "priority",
        F.date_format("valid_from", _TS_FMT).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT).alias("valid_to"),
        "is_current",
    )


ANOM_BASELINE = 8
ANOM_THRESHOLD = 2.0


def q132_weekly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational monitoring: weekly order-revenue series scored
    against the trailing 8-week baseline (current week excluded),
    |z| > 2 flagged. The weekly rollup is one map-combined shuffle;
    the global window is calendar-bounded (345 weeks here, 52
    rows/year forever — see rolling_zscore_anomalies), and the
    rolled-up totals are rounded BEFORE the window so both engines
    fold identical doubles in identical frame order."""
    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    orders = load_table(spark, sf_dir, "orders")
    weekly = (
        orders.groupBy(
            F.date_format(
                F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd"
            ).alias("week")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    return rolling_zscore_anomalies(
        weekly, "revenue", "week",
        baseline=ANOM_BASELINE, threshold=ANOM_THRESHOLD,
    )


DAILY_BASELINE = 7


def q139_event_type_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series monitoring: daily event counts per event_type, each
    scored against ITS OWN trailing 7-day baseline — the partitioned
    form of rolling_zscore_anomalies (one shuffle on the series key;
    frames bounded by the baseline; no global window). The per-type
    split is what catches a single event family breaking while the
    total stays flat."""
    from ulh_etl_spark.operators.temporal import rolling_zscore_anomalies

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
                .alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
        .withColumn("n_events", F.col("n_events").cast("double"))
    )
    return rolling_zscore_anomalies(
        daily, "n_events", "day",
        baseline=DAILY_BASELINE, threshold=2.0,
        partition_col="event_type",
    ).withColumn("n_events", F.col("n_events").cast("long"))


_EWMA_WINDOW = 6
_EWMA_MULT = 2.0


def q164_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA spike monitoring: daily event counts per event_type, each
    point compared against the exponentially-weighted average of its
    6 prior days (alpha=0.5 — exact binary-fraction weights, so both
    engines fold identical literals), flagged when count > 2x EWMA.
    The fast-reacting companion of q139's rolling z-score: no
    variance, so no flat-baseline degeneracy; level shifts pull the
    baseline within ~1/alpha points. One shuffle on the series key,
    bounded lag frames (operators.temporal.ewma_anomaly)."""
    from ulh_etl_spark.operators.temporal import ewma_anomaly

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
                .alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
        .withColumn("n_events", F.col("n_events").cast("double"))
    )
    return ewma_anomaly(
        daily, "n_events", "day",
        partition_col="event_type",
        alpha=0.5, window=_EWMA_WINDOW, mult=_EWMA_MULT,
    ).withColumn("n_events", F.col("n_events").cast("long"))


def _ewma_oracle_sql() -> str:
    """The q164 oracle: the identical lag-sum with the identical
    weight literals (repr round-trips the exact doubles)."""
    alpha, window = 0.5, _EWMA_WINDOW
    weights = [alpha * (1.0 - alpha) ** (j - 1) for j in range(1, window + 1)]
    norm = repr(sum(weights))
    lags = ",\n                   ".join(
        f"lag(n, {j}) OVER w AS l{j}" for j in range(1, window + 1)
    )
    num = " + ".join(f"{w!r} * l{j}" for j, w in enumerate(weights, start=1))
    return f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY 1, 2
        ), lagged AS (
            SELECT event_type, day, n,
                   {lags}
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
               CASE WHEN l{window} IS NOT NULL
                    THEN ROUND(({num}) / {norm}, 6) END AS ewma,
               CASE WHEN l{window} IS NOT NULL
                    THEN n > {_EWMA_MULT!r} * (({num}) / {norm})
                    ELSE FALSE END AS is_anomaly
        FROM lagged
    """




def q178_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward-fill of the per-type daily
    value series (operators.temporal.gap_fill_daily): every day
    between a type's first and last observation gets a row; missing
    days carry the last observed total forward and are flagged. The
    prerequisite of every lag-frame monitor in the catalog —
    q132/q139/q164 silently mis-align their windows on a sparse
    series. Scaffold = sequence-explode on the per-key bounds (never
    touches event rows); fill = one ROWS window per key."""
    from ulh_etl_spark.operators.temporal import gap_fill_daily

    ev = load_table(spark, sf_dir, "events")
    return gap_fill_daily(ev, "ts", "event_type", "value")




_MAD_MULT = 3.0


def q184_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomalies per event type: median/MAD
    flags (operators.temporal.mad_anomalies) — the outlier monitor
    that outliers cannot poison (50% breakdown vs the rolling
    z-score whose mean/std the spike itself inflates). Medians of
    integer day-counts are exact binary fractions, so engine and
    oracle compute identical doubles; the operator is division-free,
    closing the whole q132 NaN class by construction."""
    from ulh_etl_spark.operators.temporal import mad_anomalies

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day"),
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    return mad_anomalies(
        daily, "n_events", "event_type", mult=_MAD_MULT
    )


_CUSUM_SLACK = 0.5
_CUSUM_H = 4.0


def q222_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential change-point detection: one-sided CUSUM (Page 1954)
    over each event type's daily value series
    (operators.temporal.cusum_changepoints) — the drift detector that
    catches a persistent small upward shift the per-point z-score
    monitors (q139/q132) miss, because CUSUM accumulates evidence
    across days instead of testing each day alone. The recursion is
    computed as the running-sum-minus-running-min prefix identity —
    two ordered windows, no driver loop — and the standardized
    series rounds to 6 before the windows, so every statistic is
    bit-exact cross-engine. Output: per event type, the max CUSUM
    statistic, the day attaining it (earliest on ties), and the
    alarm flag at h=4."""
    from ulh_etl_spark.operators.temporal import cusum_changepoints

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day"),
        )
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    return cusum_changepoints(
        daily, "x", "day", "event_type",
        slack=_CUSUM_SLACK, threshold=_CUSUM_H,
    ).select(
        "event_type",
        "n_points",
        "max_cusum",
        F.col("changepoint").alias("changepoint_day"),
        "alarm",
    )


_IAP_QS = ((0.5, "p50_us"), (0.9, "p90_us"), (0.99, "p99_us"))


def q235_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival-time profile: exact p50/p90/p99
    and max of the microsecond gaps between consecutive events of
    each type — the arrival-process characterization behind
    watermark sizing (a late-data allowance should cover the p99
    gap, not a guess) and burst detection. Percentiles are EXACT
    RANK SELECTIONS (row_number over the gap order, element at
    ceil(q*n)), not an approximate sketch, and gaps are integer
    microseconds — the only doubles are the shared ceil(q*n) rank
    expressions, computed identically in both engines.

    Scale: a naive per-type lag window collapses to |types| sort
    tasks (measured: 5 tasks x 2M rows at sf10, and the unpersisted
    gap subtree evaluated once per consumer — 35 s). The gap
    multiset is instead built EXACTLY in calendar chunks: within-day
    gaps lag over (type, day) — type x ~90-day parallelism — and the
    day-boundary gaps come from a per-(type, day) first/last
    aggregate (a tiny relation) lagged over days, so every
    consecutive pair in the global (ts, event_id) order is produced
    exactly once (same-day pairs by the chunk window, straddling
    pairs by the boundary chain). The union persists (two consumers)
    and only the type-keyed RANK window still runs per type — over
    longs, 1.5 s at sf10."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from ulh_etl_spark.cache import track
    from ulh_etl_spark.operators.temporal import _epoch_micros

    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    us = _epoch_micros(F.col("ts"), ts_type)
    evd = ev.select(
        "event_type", "event_id", us.alias("_us"),
        F.to_date(F.col("ts")).alias("_day"),
    )
    wd = Window.partitionBy("event_type", "_day").orderBy(
        "_us", "event_id"
    )
    within = evd.select(
        "event_type",
        (F.col("_us") - F.lag("_us").over(wd)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    perday = evd.groupBy("event_type", "_day").agg(
        F.min(F.struct(F.col("_us"), F.col("event_id"))).alias("_first"),
        F.max(F.struct(F.col("_us"), F.col("event_id"))).alias("_last"),
    )
    wb = Window.partitionBy("event_type").orderBy("_day")
    bound = perday.select(
        "event_type",
        (F.col("_first._us") - F.lag("_last._us").over(wb)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    g = track(
        within.unionByName(bound).persist(StorageLevel.MEMORY_AND_DISK)
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    ranked = g.withColumn("_r", F.row_number().over(wr))
    per = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("_n"),
        F.max("gap_us").cast("long").alias("max_us"),
    )
    pct = (
        ranked.join(per.select("event_type", "_n"), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("_r")
                        == F.ceil(F.lit(q) * F.col("_n")).cast("long"),
                        F.col("gap_us"),
                    )
                )
                .cast("long")
                .alias(name)
                for q, name in _IAP_QS
            ]
        )
    )
    return per.join(pct, "event_type").select(
        "event_type",
        F.col("_n").alias("n_gaps"),
        "p50_us",
        "p90_us",
        "p99_us",
        "max_us",
    )


_WML_DELAYS = (1, 5, 15)
# deterministic per-event delivery delay: md5('lat_'||id) % 30 min —
# events arrive out of event-time order the way a real ingest does,
# but exactly reproducibly (no RNG), so the curve is oracle-checkable
_WML_MAX_DELAY_US = 1_800_000_000
_WML_CHUNK_US = 3_600_000_000  # 1-hour arrival chunks


def q238_watermark_lateness_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-allowance sizing curve: for candidate lateness
    allowances D in {1, 5, 15} minutes, the exact count and fraction
    of events a streaming job would DROP — an event is late iff its
    event time is below the watermark at its arrival (max event time
    among strictly-earlier arrivals, minus D). Arrival order is the
    deterministic md5 delay model above (the raw table is perfectly
    time-sorted, so real out-of-orderness must be injected to audit
    anything); q235 sizes the allowance from inter-arrival p99, this
    curve prices each candidate allowance directly.

    Scale: the running max over the global arrival order is built in
    CALENDAR CHUNKS (the q235 pattern): within-(arrival-hour) strict
    -preceding max — hour-count parallelism — plus a prefix max over
    the tiny per-hour relation (bounded: one row per hour, the one
    deliberately-global window; at a scale where even that outgrows
    a task the same chunking applies recursively). The chunked
    basis equals the global-window basis exactly (equal arrival keys
    can't straddle an hour boundary — chunk = arr DIV H), so the
    ORACLE uses the straight global window as an independent
    formulation. Delay thresholds ride an explode; one groupBy on
    3 keys."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from ulh_etl_spark.cache import track
    from ulh_etl_spark.operators.temporal import _epoch_micros
    from ulh_etl_spark.operators.text import md5_hash32

    ev = load_table(spark, sf_dir, "events")
    us = _epoch_micros(F.col("ts"), ev.schema["ts"].dataType)
    e = ev.select("event_id", us.alias("_us")).withColumn(
        "_arr",
        F.col("_us")
        + F.pmod(
            md5_hash32(
                F.concat(F.lit("lat_"), F.col("event_id").cast("string"))
            ),
            F.lit(_WML_MAX_DELAY_US),
        ),
    ).withColumn("_chunk", F.expr(f"_arr DIV {_WML_CHUNK_US}"))
    e = track(e.persist(StorageLevel.MEMORY_AND_DISK))
    win = (
        Window.partitionBy("_chunk")
        .orderBy("_arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e2 = e.withColumn("_inmax", F.max("_us").over(win))
    cm = e.groupBy("_chunk").agg(F.max("_us").alias("_cm"))
    wc = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pm = cm.withColumn("_pm", F.max("_cm").over(wc)).select(
        "_chunk", "_pm"
    )
    basis = (
        F.when(F.col("_inmax").isNull(), F.col("_pm"))
        .when(F.col("_pm").isNull(), F.col("_inmax"))
        .when(F.col("_inmax") >= F.col("_pm"), F.col("_inmax"))
        .otherwise(F.col("_pm"))
    )
    ex = (
        e2.join(F.broadcast(pm), "_chunk")
        .withColumn("_basis", basis)
        .select(
            "_us",
            "_basis",
            F.explode(
                F.array(*[F.lit(d) for d in _WML_DELAYS])
            ).alias("delay_minutes"),
        )
    )
    late = F.when(
        F.col("_basis").isNotNull()
        & (
            F.col("_us")
            < F.col("_basis")
            - F.col("delay_minutes").cast("long") * F.lit(60_000_000)
        ),
        1,
    ).otherwise(0)
    return (
        ex.groupBy("delay_minutes")
        .agg(
            F.sum(late).cast("long").alias("n_late"),
            F.count("*").cast("long").alias("_n"),
        )
        .select(
            F.col("delay_minutes").cast("int").alias("delay_minutes"),
            "n_late",
            F.round(
                F.col("n_late").cast("double")
                / F.col("_n").cast("double"),
                6,
            ).alias("frac_late"),
        )
    )


QUERIES = {
    "q235_interarrival_profile": q235_interarrival_profile,
    "q238_watermark_lateness_curve": q238_watermark_lateness_curve,
    "q222_cusum_changepoints": q222_cusum_changepoints,
    "q184_mad_anomalies": q184_mad_anomalies,
    "q178_gap_fill_daily": q178_gap_fill_daily,
    "q132_weekly_anomalies": q132_weekly_anomalies,
    "q164_ewma_anomaly": q164_ewma_anomaly,
    "q139_event_type_anomalies": q139_event_type_anomalies,
    "q52_asof_join": q52_asof_join,
    "q53_event_pairs_within_hour": q53_event_pairs_within_hour,
    "q81_scd2_priority_history": q81_scd2_priority_history,
}

ORACLES = {
    # q238: the oracle deliberately uses the STRAIGHT global window
    # (one sort) where the engine chunks by arrival hour — an
    # independent formulation of the same basis, so a hash match
    # also proves the chunk/stitch algebra
    "q238_watermark_lateness_curve": f"""
        WITH e AS (
            SELECT event_id, epoch_us(ts) AS us,
                   epoch_us(ts)
                   + CAST('0x' || substr(md5('lat_'
                         || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
                     % {_WML_MAX_DELAY_US} AS arr
            FROM events
        ), w AS MATERIALIZED (
            SELECT us,
                   max(us) OVER (
                       ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS basis
            FROM e
        ), d AS (
            SELECT unnest([{', '.join(str(d) for d in _WML_DELAYS)}])
                AS delay_minutes
        )
        SELECT d.delay_minutes,
               CAST(SUM(CASE WHEN w.basis IS NOT NULL
                             AND w.us < w.basis
                                 - CAST(d.delay_minutes AS BIGINT)
                                   * 60000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               round(CAST(SUM(CASE WHEN w.basis IS NOT NULL
                                   AND w.us < w.basis
                                       - CAST(d.delay_minutes AS BIGINT)
                                         * 60000000
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS frac_late
        FROM w CROSS JOIN d
        GROUP BY d.delay_minutes
    """,
    "q235_interarrival_profile": """
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type
                       ORDER BY ts, event_id) AS gap_us
            FROM events
        ), gg AS MATERIALIZED (
            SELECT event_type, gap_us,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY gap_us) AS r
            FROM g WHERE gap_us IS NOT NULL
        ), per AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(gap_us) AS BIGINT) AS max_us
            FROM gg GROUP BY event_type
        ), pct AS (
            SELECT gg.event_type,
                   CAST(MAX(CASE WHEN gg.r = CAST(ceil(0.5 * per.n)
                                  AS BIGINT)
                            THEN gg.gap_us END) AS BIGINT) AS p50_us,
                   CAST(MAX(CASE WHEN gg.r = CAST(ceil(0.9 * per.n)
                                  AS BIGINT)
                            THEN gg.gap_us END) AS BIGINT) AS p90_us,
                   CAST(MAX(CASE WHEN gg.r = CAST(ceil(0.99 * per.n)
                                  AS BIGINT)
                            THEN gg.gap_us END) AS BIGINT) AS p99_us
            FROM gg JOIN per ON gg.event_type = per.event_type
            GROUP BY gg.event_type
        )
        SELECT per.event_type, per.n AS n_gaps,
               pct.p50_us, pct.p90_us, pct.p99_us, per.max_us
        FROM per JOIN pct ON per.event_type = pct.event_type
    """,
    "q222_cusum_changepoints": f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   round(SUM(value), 6) AS x
            FROM events GROUP BY 1, 2
        ), st AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   SUM(x) AS s, SUM(x * x) AS sq
            FROM daily GROUP BY 1
        ), scored AS (
            SELECT d.event_type, d.day,
                   round(CASE WHEN sqrt(greatest(
                                  st.sq / st.n
                                  - (st.s / st.n) * (st.s / st.n),
                                  0.0)) > 0
                              THEN (d.x - st.s / st.n)
                                   / sqrt(greatest(
                                         st.sq / st.n
                                         - (st.s / st.n) * (st.s / st.n),
                                         0.0))
                                   - {_CUSUM_SLACK!r}
                              ELSE -{_CUSUM_SLACK!r} END, 6) AS y
            FROM daily d JOIN st ON d.event_type = st.event_type
        ), sums AS (
            SELECT event_type, day,
                   SUM(y) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS S
            FROM scored
        ), cus AS (
            SELECT event_type, day,
                   S - least(0.0,
                             MIN(S) OVER (PARTITION BY event_type
                                          ORDER BY day
                                          ROWS UNBOUNDED PRECEDING))
                       AS c
            FROM sums
        ), ranked AS (
            SELECT event_type, day, c,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY c DESC, day) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS np
            FROM cus
        )
        SELECT event_type, CAST(np AS BIGINT) AS n_points,
               round(c, 6) AS max_cusum, day AS changepoint_day,
               c >= {_CUSUM_H!r} AS alarm
        FROM ranked WHERE rk = 1
    """,
    "q184_mad_anomalies": f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), med AS (
            SELECT event_type,
                   quantile_cont(n_events, 0.5) AS med
            FROM daily GROUP BY event_type
        ), dev AS (
            SELECT d.*, m.med,
                   ABS(CAST(d.n_events AS DOUBLE) - m.med) AS adev
            FROM daily d JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.n_events,
               ROUND(d.med, 6) AS med,
               ROUND(a.mad, 6) AS mad,
               (d.adev > {_MAD_MULT!r} * 1.4826 * a.mad) AS is_anomaly
        FROM dev d JOIN mad a USING (event_type)
    """,
    "q178_gap_fill_daily": """
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   ROUND(SUM(value), 6) AS day_total
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
            FROM daily GROUP BY event_type
        ), scaffold AS (
            SELECT b.event_type, CAST(g.d AS DATE) AS d
            FROM bounds b
            CROSS JOIN unnest(generate_series(b.mn, b.mx,
                                              INTERVAL 1 DAY)) AS g(d)
        )
        SELECT s.event_type,
               strftime(s.d, '%Y-%m-%d') AS day,
               (dl.day_total IS NOT NULL) AS observed,
               dl.day_total,
               last_value(dl.day_total IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.d
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS filled
        FROM scaffold s
        LEFT JOIN daily dl ON s.event_type = dl.event_type AND s.d = dl.d
    """,
    "q164_ewma_anomaly": _ewma_oracle_sql(),
    "q139_event_type_anomalies": f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS DOUBLE) AS n_events
            FROM events GROUP BY 1, 2
        ), w AS (
            SELECT event_type, day, n_events,
                   COUNT(n_events) OVER win AS cnt,
                   SUM(n_events) OVER win AS s,
                   SUM(n_events * n_events) OVER win AS sq,
                   MIN(n_events) OVER win AS mn,
                   MAX(n_events) OVER win AS mx
            FROM daily
            WINDOW win AS (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN {DAILY_BASELINE} PRECEDING
                                    AND 1 PRECEDING)
        )
        -- Guard mirrors operators/temporal.py rolling_zscore_anomalies:
        -- scored iff full frame AND mn <> mx (bit-stable flat check)
        -- AND closed-form var > 0 (cancellation backstop); otherwise
        -- full frames flag via n_events <> mn (exact, not s/cnt).
        SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
               CASE WHEN cnt >= {DAILY_BASELINE}
                    THEN s / cnt END AS baseline_mean,
               CASE WHEN cnt >= {DAILY_BASELINE} AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN (n_events - s / cnt)
                         / sqrt((sq - s * s / cnt) / (cnt - 1))
               END AS zscore,
               CASE WHEN cnt >= {DAILY_BASELINE} AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN abs((n_events - s / cnt)
                          / sqrt((sq - s * s / cnt) / (cnt - 1))) > 2.0
                    WHEN cnt >= {DAILY_BASELINE}
                    THEN n_events <> mn
                    ELSE FALSE END AS is_anomaly
        FROM w
    """,
    "q132_weekly_anomalies": f"""
        WITH weekly AS (
            SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
                       AS week,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        ), w AS (
            SELECT week, n_orders, revenue,
                   COUNT(revenue) OVER win AS cnt,
                   SUM(revenue) OVER win AS s,
                   SUM(revenue * revenue) OVER win AS sq,
                   MIN(revenue) OVER win AS mn,
                   MAX(revenue) OVER win AS mx
            FROM weekly
            WINDOW win AS (ORDER BY week
                           ROWS BETWEEN {ANOM_BASELINE} PRECEDING
                                    AND 1 PRECEDING)
        )
        -- Guard mirrors operators/temporal.py rolling_zscore_anomalies:
        -- scored iff full frame AND mn <> mx (bit-stable flat check)
        -- AND closed-form var > 0 (cancellation backstop); otherwise
        -- full frames flag via revenue <> mn (exact, not s/cnt).
        SELECT week, n_orders, revenue,
               CASE WHEN cnt >= {ANOM_BASELINE}
                    THEN s / cnt END AS baseline_mean,
               CASE WHEN cnt >= {ANOM_BASELINE} AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN (revenue - s / cnt)
                         / sqrt((sq - s * s / cnt) / (cnt - 1))
               END AS zscore,
               CASE WHEN cnt >= {ANOM_BASELINE} AND mn <> mx
                     AND (sq - s * s / cnt) / (cnt - 1) > 0
                    THEN abs((revenue - s / cnt)
                          / sqrt((sq - s * s / cnt) / (cnt - 1)))
                         > {ANOM_THRESHOLD}
                    WHEN cnt >= {ANOM_BASELINE}
                    THEN revenue <> mn
                    ELSE FALSE END AS is_anomaly
        FROM w
    """,
    # ANSI formulation: rank every order at-or-before the event and keep
    # the newest (orderdate desc, orderkey desc) — the textbook O(n*m)
    # shape the engine's union-window form replaces.
    "q52_asof_join": """
        WITH ranked AS (
            SELECT e.event_id, e.user_id, e.ts,
                   o.o_orderdate, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC NULLS LAST,
                                o.o_orderkey DESC NULLS LAST
                   ) AS rn
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS matched_orderdate,
               o_orderkey AS matched_orderkey,
               o_totalprice AS matched_totalprice
        FROM ranked WHERE rn = 1
    """,
    "q53_event_pairs_within_hour": """
        SELECT a.user_id,
               a.event_id AS a_event,
               b.event_id AS b_event,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 60 MINUTE
    """,
    "q81_scd2_priority_history": f"""
        WITH hist AS (
            SELECT o_custkey AS custkey, o_orderpriority AS priority,
                   o_orderdate AS valid_from
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders WHERE o_orderdate < TIMESTAMP '{_SCD_CUTOFF}'
            ) WHERE rn = 1
        ), snap AS (
            SELECT o_custkey AS custkey, o_orderpriority AS priority,
                   o_orderdate AS eff
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        ), j AS (
            SELECT COALESCE(h.custkey, s.custkey) AS custkey,
                   h.priority AS hp, h.valid_from AS hvf,
                   s.priority AS sp, s.eff AS eff
            FROM hist h FULL OUTER JOIN snap s ON h.custkey = s.custkey
        ), rows_out AS (
            SELECT custkey, hp AS priority, hvf AS valid_from,
                   CASE WHEN sp IS NOT NULL AND sp <> hp
                        THEN eff END AS valid_to,
                   NOT (sp IS NOT NULL AND sp <> hp) AS is_current
            FROM j WHERE hp IS NOT NULL
            UNION ALL
            SELECT custkey, sp, eff, NULL, TRUE
            FROM j WHERE sp IS NOT NULL AND (hp IS NULL OR sp <> hp)
        )
        SELECT custkey, priority,
               strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
               is_current
        FROM rows_out
    """,
}
