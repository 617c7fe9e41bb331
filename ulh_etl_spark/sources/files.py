"""Staged-file sources (reference S1-S3).

The reference lists files in an external stage with
``LIST @stage PATTERN='regex'`` and loads each CSV via COPY-style
reads with per-feed options (RAW_ADLS_TO_RAW_SNOWFLAKE.py:662-691),
plus a raw-line file format for header/sample probing
(ADLS_FILE_PRECHECK.py:789-824). Spark equivalents: Hadoop
FileSystem listing + ``spark.read.csv`` / ``spark.read.text``.

Scale: listing uses the JVM FileSystem API (works on HDFS/S3/ABFS
URIs unchanged); CSV reads pass explicit file lists so per-file
lineage survives without per-file jobs — ``input_file_name()`` tags
every row with its source file in one distributed read.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class FileInfo:
    """Stage-listing row (name, size, last_modified) — the metadata
    tuple the reference's LIST returns."""

    path: str
    name: str
    size: int
    modification_time: int


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf), hpath, jvm


def list_stage_files(
    spark: SparkSession,
    directory: str,
    pattern: str | None = None,
    case_insensitive: bool = True,
) -> list[FileInfo]:
    """List files under ``directory``, client-side regex filter on the
    file name (reference S1: LIST + ``re.search`` with IGNORECASE,
    ADLS_FILE_PRECHECK.py:702-742). Works on any Hadoop-supported
    filesystem (local/HDFS/S3/ABFS)."""
    fs, hpath, _ = _hadoop_fs(spark, directory)
    if not fs.exists(hpath):
        return []
    rx = re.compile(pattern, re.IGNORECASE if case_insensitive else 0) if pattern else None
    out: list[FileInfo] = []
    for status in fs.listStatus(hpath):
        if not status.isFile():
            continue
        name = status.getPath().getName()
        if rx and not rx.search(name):
            continue
        out.append(
            FileInfo(
                path=status.getPath().toString(),
                name=name,
                size=status.getLen(),
                modification_time=status.getModificationTime(),
            )
        )
    return sorted(out, key=lambda f: f.name)


def csv_scan(
    spark: SparkSession,
    paths: list[str] | str,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = False,
    with_file_name: bool = True,
) -> DataFrame:
    """CSV scan with the reference's option set (S2,
    RAW_ADLS_TO_RAW_SNOWFLAKE.py:675-691): config delimiter, quoted
    fields, header, trim surrounding whitespace, tolerate malformed
    rows (PERMISSIVE). ``with_file_name`` adds per-row provenance via
    ``input_file_name()`` — replacing the reference's per-file read
    loop with one distributed scan (SURVEY §4)."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("header", header)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("mode", "PERMISSIVE")
        .option("inferSchema", infer_schema)
    )
    df = reader.csv(paths if isinstance(paths, list) else [paths])
    if with_file_name:
        df = df.withColumn("file_name", F.input_file_name())
    return df


def jsonl_scan(
    spark: SparkSession,
    paths: list[str] | str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    with_file_name: bool = True,
) -> "tuple[DataFrame, DataFrame]":
    """Typed JSON-lines scan with corrupt-record quarantine — the
    standard entry point for web-scrape training corpora (one JSON
    doc per line, schema declared up front, garbage lines preserved
    rather than silently dropped).

    Returns (good, quarantine): ``good`` has the declared schema
    (+provenance); ``quarantine`` carries the raw unparseable line and
    file for triage — mirroring the precheck suite's reject-don't-drop
    stance on CSV (SURVEY §2.8). Schema-on-read: no inference job over
    100 TB.

    Implementation: text scan + ``from_json`` carrying an in-schema
    corrupt-record column, rather than the native JSON reader's
    _corrupt_record — which Spark forbids querying on its own without
    caching the whole scan (SPARK-21610), a non-starter at corpus
    scale. Malformed JSON AND lines whose fields fail the declared
    types both land in the corrupt column (quarantined with the raw
    line preserved).
    """
    raw = spark.read.text(paths if isinstance(paths, list) else [paths])
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"{schema}, {corrupt_col} STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("_j"),
        F.col("value"),
        *([F.input_file_name().alias("file_name")] if with_file_name else []),
    )
    prov = ["file_name"] if with_file_name else []
    bad = F.col("_j").isNull() | F.col(f"_j.{corrupt_col}").isNotNull()
    good = parsed.filter(~bad).select("_j.*", *prov).drop(corrupt_col)
    quarantine = parsed.filter(bad).select(
        F.col("value").alias("raw_line"), *prov
    )
    return good, quarantine


def raw_line_scan(spark: SparkSession, path: str) -> DataFrame:
    """Raw-line scan, no field parsing (S3: FIELD_DELIMITER=NONE +
    ``SELECT $1 ... LIMIT n``) — the precheck suite's substrate.
    Handles .gz transparently (Hadoop codecs)."""
    return spark.read.text(path)


def head_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    """First ``n`` physical lines (header + sample probing,
    ADLS_FILE_PRECHECK.py:798-824)."""
    return [r[0] for r in raw_line_scan(spark, path).limit(n).collect()]


def count_lines(spark: SparkSession, path: str) -> int:
    return raw_line_scan(spark, path).count()


def head_bytes(spark: SparkSession, path: str, n: int = 4) -> bytes:
    """First ``n`` raw bytes via Hadoop FS open — needed for BOM
    detection because Spark's text/CSV readers transparently strip a
    UTF-8 BOM before the engine ever sees it."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        out = bytearray()
        for _ in range(n):
            b = stream.read()
            if b < 0:
                break
            out.append(b)
        return bytes(out)
    finally:
        stream.close()


def move_file(spark: SparkSession, src: str, dst: str, overwrite: bool = True) -> bool:
    """Archive/error file move (K8 — the reference's ADF binary
    copy+delete, archive_inbound_files.json). Uses FileSystem.rename
    when src/dst share a filesystem; creates parent dirs."""
    fs, src_path, jvm = _hadoop_fs(spark, src)
    dst_path = jvm.org.apache.hadoop.fs.Path(dst)
    fs.mkdirs(dst_path.getParent())
    if overwrite and fs.exists(dst_path):
        fs.delete(dst_path, False)
    return bool(fs.rename(src_path, dst_path))
