"""applyInPandasWithState tests: running totals accumulate across
micro-batches AND across restarts (checkpointed state); seen-key
dedup drops replays."""

import os

from ulh_etl_spark.streaming.stateful import (
    running_totals_stream,
    seen_keys_dedup_stream,
)

SCHEMA = "user_id LONG, value DOUBLE"


def _write(path, name, rows):
    with open(os.path.join(path, name), "w") as f:
        f.write("user_id,value\n")
        for u, v in rows:
            f.write(f"{u},{v}\n")


def _drain(spark, src, ckpt, sink_name, op):
    """Drain via foreachBatch into a fresh uniquely-named table
    (memory sinks cannot recover from a checkpoint; foreachBatch can).
    A unique name per drain avoids LOCATION_ALREADY_EXISTS collisions
    with orphaned warehouse dirs from interrupted runs."""
    import uuid

    sink_name = f"{sink_name}_{uuid.uuid4().hex[:8]}"
    spark.sql(f"DROP TABLE IF EXISTS {sink_name}")
    stream = (
        spark.readStream.schema(SCHEMA).option("header", True).csv(src)
    )

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").saveAsTable(sink_name)

    q = (
        op(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = []
    if spark.catalog.tableExists(sink_name):
        rows = spark.table(sink_name).collect()
        spark.sql(f"DROP TABLE {sink_name}")
    return rows


def test_running_totals_accumulate_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(str(src), "b1.csv", [(1, 10.0), (1, 5.0), (2, 1.0)])

    rows = _drain(spark, str(src), ckpt, "totals1", running_totals_stream)
    got = {r.user_id: (r.total_events, r.total_value) for r in rows}
    assert got == {1: (2, 15.0), 2: (1, 1.0)}

    # second drain with a NEW file: state restored from checkpoint,
    # totals keep growing — the flag-free incremental model
    _write(str(src), "b2.csv", [(1, 1.0), (3, 7.0)])
    rows = _drain(spark, str(src), ckpt, "totals2", running_totals_stream)
    got = {r.user_id: (r.total_events, r.total_value) for r in rows}
    assert got[1] == (3, 16.0)   # accumulated across runs
    assert got[3] == (1, 7.0)
    assert 2 not in got          # untouched key not re-emitted


def test_seen_keys_dedup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(str(src), "b1.csv", [(100, 1.0), (100, 1.0), (200, 1.0)])
    rows = _drain(
        spark, str(src), ckpt, "dedup1",
        lambda df: seen_keys_dedup_stream(df, "user_id"),
    )
    got = {r.user_id: r.occurrences for r in rows}
    assert got == {100: 2, 200: 1}

    # replayed keys are dropped on the next drain
    _write(str(src), "b2.csv", [(100, 9.0), (300, 1.0)])
    rows = _drain(
        spark, str(src), ckpt, "dedup2",
        lambda df: seen_keys_dedup_stream(df, "user_id"),
    )
    got = {r.user_id: r.occurrences for r in rows}
    assert got == {300: 1}  # 100 already seen -> suppressed


def test_running_zscore_stream_flags_spike_across_batches(spark, tmp_path):
    """The Welford state accumulates across micro-batches: batch 1
    establishes a flat baseline (no emissions — below min_points,
    then in-band), batch 2's spike is scored against the checkpointed
    moments and emitted; the in-band value in batch 2 is not."""
    import math

    from ulh_etl_spark.streaming.stateful import running_zscore_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: 10 near-constant points for user 1 (values 10.0/10.2
    # alternating -> nonzero variance), all in-band
    _write(
        src, "b1.csv",
        [(1, 10.0 if i % 2 == 0 else 10.2) for i in range(10)],
    )
    out1 = _drain(
        spark, src, ckpt, "zs_sink",
        lambda s: running_zscore_stream(s, min_points=8, threshold=3.0),
    )
    assert out1 == []  # baseline only, nothing anomalous

    # batch 2: one spike + one in-band point
    _write(src, "b2.csv", [(1, 100.0), (1, 10.1)])
    out2 = _drain(
        spark, src, ckpt, "zs_sink",
        lambda s: running_zscore_stream(s, min_points=8, threshold=3.0),
    )
    flagged = {(r.user_id, r.value) for r in out2}
    assert (1, 100.0) in flagged
    assert (1, 10.1) not in flagged
    spike = next(r for r in out2 if r.value == 100.0)
    # model: Welford over the 10 baseline points
    vals = [10.0 if i % 2 == 0 else 10.2 for i in range(10)]
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    want = round((100.0 - mean) / math.sqrt(var), 6)
    assert abs(spike.zscore - want) < 1e-6
    assert spike.n_baseline == 10
