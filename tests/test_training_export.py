"""Training-shard export: manifest integrity, verify pass, and
corruption detection."""

from pyspark.sql import functions as F

from ulh_etl_spark.sinks.training import (
    export_training_shards,
    verify_training_shards,
)


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, ("tok " * (5 + i % 17)).strip()) for i in range(n)],
        "doc_id long, text string",
    )


def test_export_manifest_matches_data(spark, tmp_path):
    path = str(tmp_path / "exp")
    docs = _docs(spark)
    manifest = export_training_shards(docs, path, ctx_len=64, n_shards=4)
    rows = manifest.collect()
    assert {r["shard"] for r in rows} <= set(range(4))
    assert sum(r["n_docs"] for r in rows) == 60
    # token totals agree with a direct count
    total_tokens = sum(r["n_tokens"] for r in rows)
    want = docs.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("t")
    ).collect()[0]["t"]
    assert total_tokens == want
    # windows = ceil(tokens/ctx) per shard
    for r in rows:
        assert r["n_windows"] == -(-r["n_tokens"] // 64)

    # the data directory is readable per shard and ordered
    data = spark.read.parquet(f"{path}/data")
    assert data.count() == 60
    one = data.filter(F.col("shard") == rows[0]["shard"]).orderBy("start_offset")
    offs = [r["start_offset"] for r in one.collect()]
    assert offs == sorted(offs) and offs[0] == 0


def test_verify_passes_then_catches_corruption(spark, tmp_path):
    path = str(tmp_path / "exp2")
    export_training_shards(_docs(spark), path, ctx_len=64, n_shards=3)
    ok = verify_training_shards(spark, path)
    assert all(r["ok"] for r in ok.collect())

    # corrupt one shard: drop a doc and rewrite that partition dir
    import shutil

    data = spark.read.parquet(f"{path}/data")
    shard0 = data.filter(F.col("shard") == 0)
    keep = shard0.filter(F.col("doc_id") != shard0.limit(1).collect()[0]["doc_id"])
    kept = keep.drop("shard").toPandas()
    shutil.rmtree(f"{path}/data/shard=0")
    spark.createDataFrame(kept).write.parquet(f"{path}/data/shard=0")

    after = {r["shard"]: r["ok"] for r in verify_training_shards(spark, path).collect()}
    assert after[0] is False
    assert all(v for s, v in after.items() if s != 0)


def test_verify_catches_deleted_shard(spark, tmp_path):
    """A whole missing shard directory must report ok=False (not NULL,
    which ~ok filters would silently drop)."""
    import shutil

    path = str(tmp_path / "exp3")
    export_training_shards(_docs(spark), path, ctx_len=64, n_shards=3)
    shutil.rmtree(f"{path}/data/shard=1")

    rows = verify_training_shards(spark, path).collect()
    status = {r["shard"]: r["ok"] for r in rows}
    assert status[1] is False
    assert all(v for s, v in status.items() if s != 1)
    # and the not-ok filter actually surfaces it
    bad = verify_training_shards(spark, path).filter(~F.col("ok")).collect()
    assert {r["shard"] for r in bad} == {1}
