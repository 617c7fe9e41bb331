"""Tests for the config model, precheck validator, file sources,
table sinks, and watermark state — the pipeline layer (SURVEY §7.1)."""

import os

import pytest

from ulh_etl_spark.config import load_config
from ulh_etl_spark.sinks.logs import append_log, log_table_name
from ulh_etl_spark.sinks.tables import (
    insert_select,
    merge_upsert,
    table_exists,
    truncate_table,
    update_flag,
    write_table,
)
from ulh_etl_spark.sources.files import csv_scan, list_stage_files, move_file
from ulh_etl_spark.state import mark_consumed, new_run_id, unconsumed
from ulh_etl_spark.validate import PrecheckContract, precheck_file, strip_bom


SAMPLE_CONFIG = {
    "Practices": [
        {
            "practice_name": "adcs",
            "active": True,
            "ingest": [
                {
                    "name": "appointments",
                    "source": {
                        "kind": "file",
                        "directory": "/data/adcs/appointments",
                        "pattern": r".*\.csv$",
                        "delimiter": "|",
                    },
                    "precheck": {
                        "expected_columns": ["id", "date", "patient"],
                        "require_all_columns": True,
                        "min_row_count": 1,
                    },
                    "raw_table": "raw_adcs_appointments",
                    "transforms": [
                        {"kind": "strip", "column": "id", "chars": "{}"}
                    ],
                }
            ],
        },
        {"practice_name": "inactive_one", "active": False, "ingest": []},
    ]
}


def test_config_model_roundtrip():
    cfg = load_config(SAMPLE_CONFIG)
    assert len(cfg.practices) == 2
    p = cfg.practice("ADCS")  # case-insensitive
    assert p.active
    entries = cfg.entries("adcs", "Appointments")
    assert len(entries) == 1
    e = entries[0]
    assert e.source.delimiter == "|"
    assert e.precheck.expected_columns == ["id", "date", "patient"]
    assert e.transforms[0]["kind"] == "strip"
    with pytest.raises(KeyError):
        cfg.practice("nope")


@pytest.fixture()
def stage_dir(tmp_path):
    d = tmp_path / "inbound"
    d.mkdir()
    (d / "feed_20260813.csv").write_text("id,date,patient\n1,2026-01-01,alice\n2,2026-01-02,bob\n")
    (d / "other.txt").write_text("x\n")
    return str(d)


def test_list_stage_files_pattern(spark, stage_dir):
    files = list_stage_files(spark, stage_dir, r"FEED_.*\.csv$")
    assert [f.name for f in files] == ["feed_20260813.csv"]
    assert files[0].size > 0
    assert list_stage_files(spark, stage_dir + "/missing") == []


def test_csv_scan_provenance(spark, stage_dir):
    files = list_stage_files(spark, stage_dir, r".*\.csv$")
    df = csv_scan(spark, [f.path for f in files])
    rows = df.collect()
    assert len(rows) == 2
    assert df.columns == ["id", "date", "patient", "file_name"]
    assert all(r.file_name.endswith("feed_20260813.csv") for r in rows)


def test_precheck_pass(spark, stage_dir):
    contract = PrecheckContract(
        expected_columns=["id", "date", "patient"], min_row_count=1
    )
    f = list_stage_files(spark, stage_dir, r".*\.csv$")[0]
    rpt = precheck_file(spark, f, contract)
    assert rpt.passed
    by_check = {r.check: r.status for r in rpt.results}
    assert by_check["COLUMN_COUNT"] == "PASS"
    assert by_check["DELIMITER_CONSISTENCY"] == "PASS"


def test_precheck_failures(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    # missing column + short rows + BOM
    p = d / "bad.csv"
    p.write_bytes(b"\xef\xbb\xbfid,date\n1\n")
    f = list_stage_files(spark, str(d), r".*\.csv$")[0]
    contract = PrecheckContract(
        expected_columns=["id", "date", "patient"], min_row_count=2
    )
    rpt = precheck_file(spark, f, contract)
    assert not rpt.passed
    by_check = {r.check: r.status for r in rpt.results}
    assert by_check["BOM_CHECK"] == "WARN"
    assert by_check["MISSING_COLUMNS"] == "FAIL"
    assert by_check["MIN_ROW_COUNT"] == "FAIL"
    assert by_check["DELIMITER_CONSISTENCY"] == "FAIL"


def test_strip_bom():
    assert strip_bom("﻿id,date") == ("id,date", "UTF-8")
    assert strip_bom("id,date") == ("id,date", None)


def test_precheck_empty_file(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    (d / "e.csv").write_text("")
    f = list_stage_files(spark, str(d))[0]
    rpt = precheck_file(spark, f, PrecheckContract())
    assert not rpt.passed
    assert rpt.results[0].check == "FILE_SIZE"


def test_move_file(spark, tmp_path):
    src = tmp_path / "in" / "a.csv"
    src.parent.mkdir()
    src.write_text("x\n")
    dst = tmp_path / "archive" / "a.csv"
    assert move_file(spark, str(src), str(dst))
    assert not src.exists() and dst.exists()


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    # session-scoped spark already has a warehouse dir; just namespace tables
    yield spark
    for t in spark.catalog.listTables():
        spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_write_insert_truncate(warehouse):
    spark = warehouse
    df = spark.range(5).toDF("n")
    write_table(df, "t_base", mode="overwrite")
    assert spark.table("t_base").count() == 5
    assert insert_select(spark, "t_base", spark.range(3).toDF("n")) == 3
    assert spark.table("t_base").count() == 8
    truncate_table(spark, "t_base")
    assert spark.table("t_base").count() == 0
    assert table_exists(spark, "t_base")


def test_merge_upsert(warehouse):
    spark = warehouse
    tgt = spark.createDataFrame(
        [(1, "a", "old"), (2, "b", "old")], "k1 int, k2 string, v string"
    )
    write_table(tgt, "t_merge", mode="overwrite")
    src = spark.createDataFrame(
        [(2, "b", "new"), (3, "c", "new")], "k1 int, k2 string, v string"
    )
    stats = merge_upsert(spark, "t_merge", src, keys=["k1", "k2"])
    assert stats == {"updated": 1, "inserted": 1}
    out = {(r.k1, r.k2): r.v for r in spark.table("t_merge").collect()}
    assert out == {(1, "a"): "old", (2, "b"): "new", (3, "c"): "new"}


def test_merge_upsert_delta_mode(warehouse):
    """Native Delta MERGE path: same semantics and tallies as the
    parquet staging-swap. Skips cleanly where delta-spark is absent
    (this sandbox) — the dispatch itself is exercised either way via
    _delta_handle returning None on parquet targets."""
    import pytest

    pytest.importorskip("delta")
    spark = warehouse
    tgt = spark.createDataFrame(
        [(1, "a", "old"), (2, "b", "old")], "k1 int, k2 string, v string"
    )
    tgt.write.format("delta").mode("overwrite").saveAsTable("t_merge_delta")
    src = spark.createDataFrame(
        [(2, "b", "new"), (3, "c", "new")], "k1 int, k2 string, v string"
    )
    stats = merge_upsert(spark, "t_merge_delta", src, keys=["k1", "k2"])
    assert stats == {"updated": 1, "inserted": 1}
    out = {(r.k1, r.k2): r.v for r in spark.table("t_merge_delta").collect()}
    assert out == {(1, "a"): "old", (2, "b"): "new", (3, "c"): "new"}
    assert update_flag(spark, "t_merge_delta", "v", "new", "seen") == 2


def test_delta_handle_none_on_parquet(warehouse):
    """On a parquet table the Delta dispatch must return None whether
    or not delta-spark is installed — parquet mode stays the default."""
    from ulh_etl_spark.sinks.tables import _delta_handle

    spark = warehouse
    write_table(spark.range(3).toDF("n"), "t_plainpq", mode="overwrite")
    assert _delta_handle(spark, "t_plainpq") is None


def test_insert_select_single_job(warehouse):
    """The rows-written count must ride the write job (observe), not a
    second evaluation of the source plan."""
    spark = warehouse
    write_table(spark.range(5).toDF("n"), "t_onejob", mode="overwrite")
    sc = spark.sparkContext
    sc.setJobGroup("ins_one", "insert_select")
    assert insert_select(spark, "t_onejob", spark.range(7).toDF("n")) == 7
    sc.setJobGroup("ins_other", "")
    assert len(sc.statusTracker().getJobIdsForGroup("ins_one")) == 1


def test_merge_upsert_tiebreak_deterministic(warehouse):
    """Duplicate-key source rows: the highest tiebreak value wins and
    the updated/inserted tallies count key groups, not source rows."""
    spark = warehouse
    tgt = spark.createDataFrame(
        [(1, "a", "old", 0), (2, "b", "old", 0)],
        "k1 int, k2 string, v string, ts int",
    )
    write_table(tgt, "t_merge_tb", mode="overwrite")
    src = spark.createDataFrame(
        [(2, "b", "v1", 1), (2, "b", "v2", 2), (3, "c", "x", 1)],
        "k1 int, k2 string, v string, ts int",
    )
    stats = merge_upsert(spark, "t_merge_tb", src, keys=["k1", "k2"],
                         tiebreak_cols=["ts"])
    assert stats == {"updated": 1, "inserted": 1}
    out = {(r.k1, r.k2): r.v for r in spark.table("t_merge_tb").collect()}
    assert out == {(1, "a"): "old", (2, "b"): "v2", (3, "c"): "x"}


def test_merge_upsert_dynamic_partition_overwrite(warehouse):
    """Partitioned merge only rewrites partitions the source touches;
    untouched partitions keep their original files."""
    import glob
    import os

    from ulh_etl_spark.sinks.tables import write_partitioned

    spark = warehouse
    df = spark.createDataFrame(
        [(1, "p1", "old"), (2, "p1", "old"), (3, "p2", "keep")],
        "id int, part string, v string",
    )
    write_partitioned(df, "t_merge_dpo", ["part"])
    tbl_dir = spark.sql("DESCRIBE FORMATTED t_merge_dpo").filter(
        "col_name = 'Location'"
    ).collect()[0].data_type.replace("file:", "")
    before_p2 = sorted(glob.glob(os.path.join(tbl_dir, "part=p2", "*.parquet")))

    src = spark.createDataFrame(
        [(2, "p1", "new"), (4, "p1", "ins")], "id int, part string, v string"
    )
    stats = merge_upsert(spark, "t_merge_dpo", src, keys=["id"],
                         partition_cols=["part"])
    assert stats == {"updated": 1, "inserted": 1}
    out = {r.id: (r.part, r.v) for r in spark.table("t_merge_dpo").collect()}
    assert out == {1: ("p1", "old"), 2: ("p1", "new"),
                   3: ("p2", "keep"), 4: ("p1", "ins")}
    after_p2 = sorted(glob.glob(os.path.join(tbl_dir, "part=p2", "*.parquet")))
    assert before_p2 == after_p2  # untouched partition: same files


def test_merge_upsert_partition_mover_guard(warehouse):
    """A source row that moves a key to a different partition would
    strand the old row (dynamic-partition-overwrite caveat); the
    opt-in stability check fails fast instead of corrupting."""
    import pytest

    from ulh_etl_spark.sinks.tables import write_partitioned

    spark = warehouse
    df = spark.createDataFrame(
        [(1, "p1", "old"), (2, "p2", "old")], "id int, part string, v string"
    )
    write_partitioned(df, "t_merge_mover", ["part"])
    src = spark.createDataFrame(
        [(1, "p2", "moved")], "id int, part string, v string"
    )
    with pytest.raises(ValueError, match="change partition"):
        merge_upsert(
            spark, "t_merge_mover", src, keys=["id"],
            partition_cols=["part"], check_partition_stability=True,
        )
    # stable-partition source passes the check
    ok = spark.createDataFrame(
        [(2, "p2", "new")], "id int, part string, v string"
    )
    stats = merge_upsert(
        spark, "t_merge_mover", ok, keys=["id"],
        partition_cols=["part"], check_partition_stability=True,
    )
    assert stats == {"updated": 1, "inserted": 0}


def test_update_flag(warehouse):
    spark = warehouse
    df = spark.createDataFrame([(1, 1), (2, 1), (3, 0)], "id int, IS_NEW int")
    write_table(df, "t_flags", mode="overwrite")
    assert update_flag(spark, "t_flags", "IS_NEW", 1, 0) == 2
    assert spark.table("t_flags").filter("IS_NEW = 1").count() == 0
    assert update_flag(spark, "t_flags", "IS_NEW", 1, 0) == 0


def test_watermark_anti_join(warehouse):
    spark = warehouse
    r1, r2 = new_run_id(), new_run_id()
    df = spark.createDataFrame(
        [(1, r1), (2, r1), (3, r2)], "id int, PARENT_RUN_ID string"
    )
    # nothing consumed yet -> all rows
    assert unconsumed(spark, df, "REFINED", table="t_marks").count() == 3
    mark_consumed(spark, [r1], "REFINED", table="t_marks")
    remaining = unconsumed(spark, df, "REFINED", table="t_marks")
    assert [r.id for r in remaining.collect()] == [3]
    # other stage unaffected
    assert unconsumed(spark, df, "CURATED", table="t_marks").count() == 3


def test_append_log(warehouse):
    spark = warehouse
    append_log(
        spark, "RAW", "run1", "parent1", "adcs", "appointments", "SUCCESS",
        rows_read=10, rows_written=10,
    )
    t = spark.table(log_table_name("RAW"))
    assert t.count() == 1
    row = t.collect()[0]
    assert row.status == "SUCCESS" and row.parent_run_id == "parent1"


def test_jsonl_scan_quarantine(spark, tmp_path):
    """Typed JSONL scan: well-formed typed lines pass; malformed JSON
    AND type-mismatched lines are quarantined with the raw line."""
    from ulh_etl_spark.sources.files import jsonl_scan

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "world"}\n'
        '{"doc_id": "not_an_int", "text": "typed"}\n'
    )
    good, quar = jsonl_scan(spark, str(tmp_path), "doc_id BIGINT, text STRING")
    rows = sorted((r.doc_id, r.text) for r in good.collect())
    assert rows == [(1, "hello"), (2, "world")]
    assert "file_name" in good.columns
    bad = sorted(r.raw_line for r in quar.collect())
    assert bad == ["THIS IS NOT JSON",
                   '{"doc_id": "not_an_int", "text": "typed"}']
