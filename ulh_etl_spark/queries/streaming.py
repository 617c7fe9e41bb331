"""Event-analytics catalog queries over ``events`` — the batch twins
of the streaming operators (ulh_etl_spark.streaming.windows). The
exact same functions run on streaming DataFrames with watermarks; the
batch form is what the DuckDB oracle can check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.session import load_table
from ulh_etl_spark.streaming.windows import sessionize, windowed_counts


def q50_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts + value sums per event type.
    One hash aggregate with map-side partials; the streaming variant
    adds only a watermark."""
    events = load_table(spark, sf_dir, "events")
    return windowed_counts(events, "ts", "1 hour", ("event_type",), "value")


def q51_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) per user: lag ->
    boundary -> running-sum session index, one shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_minutes=30)
    return s.select(
        "user_id", "session_idx",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q67_event_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1-hour/15-minute window counts per event type: each
    event lands in exactly 4 overlapping windows (explode before the
    partial agg — the replication factor IS window/slide)."""
    events = load_table(spark, sf_dir, "events")
    return windowed_counts(
        events, "ts", "1 hour", ("event_type",), "value", slide="15 minutes"
    )




def q183_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day over q51's 30-min-gap
    sessionization (operators.temporal.peak_concurrency_daily): the
    sweep-line interval aggregate, decomposed into day-partitioned
    running sums plus an O(days) midnight-baseline relation — no
    global single-partition window at any corpus size. Capacity
    answer ("how many users at once") next to q50's volume answer
    ("how many events per hour"). Integers end-to-end. Output
    covers days with at least one session boundary (a session
    fully spanning a silent day cannot exist under gap
    sessionization)."""
    from ulh_etl_spark.operators.temporal import peak_concurrency_daily

    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_minutes=30)
    return peak_concurrency_daily(s)


QUERIES = {
    "q183_peak_concurrency": q183_peak_concurrency,
    "q50_event_window_counts": q50_event_window_counts,
    "q51_event_sessionize": q51_event_sessionize,
    "q67_event_sliding_counts": q67_event_sliding_counts,
}

ORACLES = {
    "q183_peak_concurrency": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch(ts) - epoch(
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                        > 1800 THEN 1 ELSE 0 END AS new_session
            FROM events
        ), idx AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        ), sess AS (
            SELECT user_id, session_idx,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM idx GROUP BY 1, 2
        ), bounds AS (
            SELECT s AS ts, 1 AS delta,
                   strftime(date_trunc('day', s), '%Y-%m-%d') AS day
            FROM sess
            UNION ALL
            SELECT e, -1, strftime(date_trunc('day', e), '%Y-%m-%d')
            FROM sess
        ), win AS (
            SELECT day,
                   MAX(run) AS peak_within
            FROM (
                SELECT day,
                       SUM(delta) OVER (PARTITION BY day
                                        ORDER BY ts, delta DESC
                                        ROWS UNBOUNDED PRECEDING) AS run
                FROM bounds
            ) GROUP BY day
        ), starts AS (
            SELECT strftime(date_trunc('day', s), '%Y-%m-%d') AS day,
                   COUNT(*) AS ns
            FROM sess GROUP BY 1
        ), ends AS (
            SELECT strftime(date_trunc('day', e), '%Y-%m-%d') AS day,
                   COUNT(*) AS ne
            FROM sess GROUP BY 1
        ), days AS (
            SELECT w.day,
                   COALESCE(st.ns, 0) AS ns,
                   COALESCE(en.ne, 0) AS ne
            FROM win w
            LEFT JOIN starts st ON w.day = st.day
            LEFT JOIN ends en ON w.day = en.day
        ), based AS (
            SELECT day, ns,
                   (SUM(ns) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - ns)
                 - (SUM(ne) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - ne)
                   AS base
            FROM days
        )
        SELECT b.day,
               CAST(b.ns AS BIGINT) AS n_started,
               CAST(b.base + w.peak_within AS BIGINT) AS peak_concurrency
        FROM based b JOIN win w ON b.day = w.day
    """,
    # time_bucket == Spark's tumbling window for aligned fixed widths
    "q50_event_window_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "q51_event_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch(ts) - epoch(
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                        > 1800 THEN 1 ELSE 0 END AS new_session
            FROM events
        ), idx AS (
            SELECT user_id, ts,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events
        FROM idx
        GROUP BY user_id, session_idx
    """,
    # every event belongs to exactly windowDuration/slide = 4 hopping
    # windows: starts at time_bucket(15min) - k*15min, k in 0..3
    "q67_event_sliding_counts": """
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                   - (k.k * INTERVAL '15 minutes') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events, (VALUES (0), (1), (2), (3)) AS k(k)
        GROUP BY 1, 2
    """,
}
