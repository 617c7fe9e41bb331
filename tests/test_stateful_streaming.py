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
