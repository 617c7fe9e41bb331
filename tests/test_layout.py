"""Z-order layout operators: morton model + write-path locality."""

from pyspark.sql import functions as F

from ulh_etl_spark.operators.layout import (
    morton_key,
    write_zordered,
    zorder_bucket_stats,
)


def _interleave(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_model(spark):
    vals = [(a, b) for a in (0, 1, 5, 63, 64, 1000) for b in (0, 2, 7, 255)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = {
        (r["a"], r["b"]): r["k"]
        for r in df.select("a", "b", morton_key(F.col("a"), F.col("b"), 16).alias("k")).collect()
    }
    for (a, b), k in got.items():
        assert k == _interleave(a, b, 16), (a, b)


def test_zorder_bucket_stats_bounds(spark):
    # 64x64 grid, 6-bit keys, buckets = top 2 bits of the 12-bit key
    # -> 4 buckets, each EXACTLY one 32x32 quadrant of the z-curve.
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    rows = zorder_bucket_stats(grid, "x", "y", bits=6, bucket_shift=10).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_rows"] == 1024
        assert r["max_x"] - r["min_x"] == 31
        assert r["max_y"] - r["min_y"] == 31


def test_write_zordered_files_prune_on_second_dimension(spark, tmp_path):
    """THE pruning property, asserted directly: under a filter on the
    second dimension (y < 16), a z-ordered layout lets file min/max
    statistics skip a meaningful share of files; an x-sorted layout
    can skip none (every x-stripe contains low-y rows). Per-file
    bounding boxes can straddle quadrant boundaries (sampled range
    splits), so the skip COUNT — not exact rectangles — is the stable
    invariant."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )

    def min_y_per_file(path):
        return [
            spark.read.parquet(f).agg(F.min("y").alias("m")).collect()[0]["m"]
            for f in spark.read.parquet(path).inputFiles()
        ]

    zpath = str(tmp_path / "z")
    write_zordered(grid, zpath, "x", "y", bits=6, num_files=8)
    z_mins = min_y_per_file(zpath)
    # files with min_y >= 16 are skippable for a y < 16 filter; the
    # two high-y quadrants alone give ~half the files, minus at most
    # the quadrant-straddling boundary files
    z_skippable = sum(1 for m in z_mins if m >= 16)
    assert len(z_mins) >= 6
    assert z_skippable >= 2, z_mins

    spath = str(tmp_path / "s")
    (
        grid.repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(spath)
    )
    s_mins = min_y_per_file(spath)
    assert sum(1 for m in s_mins if m >= 16) == 0, s_mins
