"""Runnable demo: full LLM-corpus curation -> sharded training export.

    python examples/run_curation.py [sf_dir]

Chains the engine's curation pipeline (quality/lang annotate -> exact
dedup -> MinHash-LSH near-dedup -> exact + fuzzy benchmark
decontamination -> deterministic split) into the sharded training
export with its integrity manifest, then verifies the export — the
whole path a training-data team runs, on the driver-generated
testdata."""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ulh_etl_spark.curation import CurationConfig, curate
from ulh_etl_spark.session import get_spark, load_table
from ulh_etl_spark.sinks.training import (
    export_training_shards,
    verify_training_shards,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-demo")
    docs = load_table(spark, sf_dir, "documents")

    # deterministic stand-in benchmark: every 97th doc (see q79/q85)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    cfg = CurationConfig(min_quality=0.2, minhash_rows_per_band=4)
    curated = curate(corpus, cfg, benchmark=bench)
    kept = curated.count()
    print(f"curated: {kept} of {corpus.count()} docs survive")
    print("splits:", {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    })

    out = tempfile.mkdtemp(prefix="training_export_")
    train = curated.filter(F.col("split") == "train")
    manifest = export_training_shards(
        train, out, ctx_len=512, n_shards=4
    )
    print(f"exported {train.count()} train docs to {out}")
    manifest.orderBy("shard").show(truncate=False)

    bad = verify_training_shards(spark, out).filter(~F.col("ok")).count()
    print("verify:", "OK" if bad == 0 else f"{bad} shard(s) FAILED")
    assert bad == 0


if __name__ == "__main__":
    main()
