"""Event-time operators against the REAL testdata parquet.

The driver regenerates /root/testdata between rounds and has already
changed the physical encoding of `events.ts` once (TIMESTAMP(NANOS) ->
timestamp[us] without tz, which Spark reads as TIMESTAMP_NTZ). Unit
tests that build their own in-memory frames never see that change —
round 3's bench crashed on it while the suite was green. These tests
pin the load-path contract (ts is always TimestampType after
load_table) and run every event-time operator end-to-end on the
driver-generated file, whatever its encoding.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from ulh_etl_spark.operators.temporal import asof_join, range_join
from ulh_etl_spark.session import load_table
from ulh_etl_spark.streaming.windows import sessionize, windowed_counts

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="driver testdata not present",
)


def test_load_table_normalizes_events_ts(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # Values must be the parquet file's naive micros verbatim (UTC
    # session): spot-check against pyarrow's own read.
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "ts"]
    )
    want = {
        r["event_id"]: r["ts"].replace(tzinfo=None)
        for r in tbl.slice(0, 5).to_pylist()
    }
    got = {
        r["event_id"]: r["ts"]
        for r in ev.filter(F.col("event_id").isin(*want)).collect()
    }
    assert got == want


def test_sessionize_on_testdata(spark):
    ev = load_table(spark, SF_DIR, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30)
    rows = s.limit(5).collect()
    assert rows and all(r["session_start"] <= r["session_end"] for r in rows)


def test_windowed_counts_on_testdata(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = windowed_counts(ev, "ts", "1 hour", ("event_type",), "value")
    assert out.count() > 0


def test_temporal_joins_on_testdata(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = ev.select("user_id", "ts", F.col("event_id").alias("a_event")).limit(200)
    b = ev.select("user_id", "ts", F.col("event_id").alias("b_event"))
    out = asof_join(
        a,
        b,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=("b_event",),
        tolerance_seconds=86400,
    )
    assert out.count() == 200
    rj = range_join(
        a,
        b,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        left_cols=("a_event",),
        right_cols=("b_event",),
    )
    rj.write.format("noop").mode("overwrite").save()


def test_event_ops_accept_raw_ntz(spark):
    """The operators themselves (not just the load path) must accept a
    TIMESTAMP_NTZ column: users reading their own un-normalized parquet
    hit exactly this under ANSI mode."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=5)),
        (1, base + datetime.timedelta(hours=2)),
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)

    s = sessionize(df, "user_id", "ts", gap_minutes=30).collect()
    assert {(r["user_id"], r["n_events"]) for r in s} == {(1, 2), (1, 1), (2, 1)}

    right = spark.createDataFrame(
        [(1, base + datetime.timedelta(minutes=1), "x")],
        "user_id long, ts timestamp_ntz, tag string",
    )
    got = asof_join(
        df,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=("tag",),
        tolerance_seconds=3600,
    ).collect()
    matched = {r["ts"]: r["matched_tag"] for r in got if r["user_id"] == 1}
    assert matched[base] is None  # right row is after this left row
    assert matched[base + datetime.timedelta(minutes=5)] == "x"
    assert matched[base + datetime.timedelta(hours=2)] is None  # > tolerance

    rj = range_join(
        df.select("user_id", "ts"),
        right.select("user_id", "ts", "tag"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=120,
        left_cols=(),
        right_cols=("tag",),
    ).collect()
    assert len(rj) == 1 and rj[0]["gap_us"] == 60_000_000


def test_load_table_does_not_mutate_session_timezone(spark):
    """ADVICE r4: the NTZ->LTZ normalization must be scoped to the
    cast (Cast captures its timeZoneId at analysis), not applied by
    permanently flipping spark.sql.session.timeZone — a driver-owned
    session deliberately running in another zone must keep its own
    timestamp semantics for unrelated queries."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, SF_DIR, "events")
        # 1. the session conf is untouched by the load
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        )
        # 2. the instant is still the naive parquet value read as UTC
        #    (compare epoch micros — JVM-side, conversion-ambiguity-free)
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "ts"]
        )
        first = tbl.slice(0, 1).to_pylist()[0]
        naive = first["ts"].replace(tzinfo=datetime.timezone.utc)
        want_micros = int(naive.timestamp()) * 1_000_000 + naive.microsecond
        got = (
            ev.filter(F.col("event_id") == first["event_id"])
            .select(F.unix_micros("ts").alias("um"))
            .collect()[0]["um"]
        )
        assert got == want_micros
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_q50_q51_match_oracle_on_driver_testdata(spark):
    """Full driver-gate replica for q50/q51 on the REAL testdata
    parquet (VERDICT r7 #5): their only driver-side CORRECTNESS rows
    ever are round-1 errors from the since-fixed TIMESTAMP(NANOS)
    issue, and the driver regenerates /root/testdata between rounds —
    this pins the whole path (load_table nanos/NTZ normalization ->
    event-time operator -> hash-comparable output) against the next
    encoding change, whatever it is."""
    import duckdb

    from ulh_etl_spark.queries import all_oracles, all_queries
    from ulh_etl_spark.session import TABLES, table_path

    queries, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )

    def norm(df_pandas):
        cols = sorted(df_pandas.columns)
        rows = [
            tuple(
                round(v, 9) if isinstance(v, float) else (None if v is None else str(v))
                for v in row
            )
            for row in df_pandas[cols].itertuples(index=False, name=None)
        ]
        return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

    for name in ("q50_event_window_counts", "q51_event_sessionize"):
        sdf = queries[name](spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        assert len(sdf) == len(odf) > 0, name
        assert norm(sdf) == norm(odf), name


def test_load_table_inplace_part_rewrite_invalidates_cache(spark, tmp_path):
    """The load_table plan cache keys on the NEWEST mtime inside the
    table dir (ADVICE r16): rewriting a part file in place leaves the
    DIRECTORY mtime unchanged, so the key must come from the entries'
    mtimes — and the superseded entry must be evicted, not leaked."""
    import glob
    import shutil
    import time

    from ulh_etl_spark import session as S

    base = str(tmp_path)
    pdir = os.path.join(base, "widgets.parquet")
    spark.range(3).coalesce(1).write.parquet(pdir)
    alt = os.path.join(base, "alt.parquet")
    spark.range(7).coalesce(1).write.parquet(alt)

    assert S.load_table(spark, base, "widgets").count() == 3
    n_before = len(S._TABLE_PLAN_CACHE)

    part = glob.glob(os.path.join(pdir, "part-*.parquet"))[0]
    newpart = glob.glob(os.path.join(alt, "part-*.parquet"))[0]
    dir_times = (os.path.getatime(pdir), os.path.getmtime(pdir))
    shutil.copyfile(newpart, part)  # in-place content rewrite
    # Hadoop's local ChecksumFileSystem keeps a hidden .crc sidecar
    # per part file; the rewritten bytes no longer match it. Drop it
    # (no .crc -> no verification) — the scenario under test is the
    # mtime key, not checksum recovery.
    crc = os.path.join(pdir, "." + os.path.basename(part) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    later = time.time() + 5
    os.utime(part, (later, later))
    # pin the directory mtime: the coarse-granularity scenario the
    # scandir key component exists for
    os.utime(pdir, dir_times)

    assert S.load_table(spark, base, "widgets").count() == 7
    # the superseded (session, path) entry was evicted, not leaked
    assert len(S._TABLE_PLAN_CACHE) == n_before
