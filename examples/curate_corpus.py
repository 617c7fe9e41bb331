#!/usr/bin/env python
"""Runnable demo: the training-corpus curation pipeline end to end
over the shipped synthetic documents table.

    python examples/curate_corpus.py [sf_dir]

Runs annotate -> quality filter -> exact dedup -> MinHash-LSH
near-dedup -> train/val/test hash split, writes the survivors
partitioned by split, prints the per-split data-card report plus the
exact near-dup cluster histogram (connected components over the LSH
pair graph).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ulh_etl_spark.curation import CurationConfig, curate, curation_report, write_curated
from ulh_etl_spark.operators.dedup import connected_components, minhash_candidate_pairs
from ulh_etl_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate-demo")
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    cfg = CurationConfig(min_quality=0.5, minhash_rows_per_band=4)
    curated = curate(docs, cfg)

    out_dir = tempfile.mkdtemp(prefix="curated_")
    write_curated(curated, out_dir)
    report = curation_report(spark.read.parquet(out_dir))

    print(f"\nraw docs: {n_raw}")
    total = sum(v["n_docs"] for v in report.values())
    print(f"curated survivors: {total} "
          f"({100.0 * total / n_raw:.1f}% kept) -> {out_dir}")
    for split in ("train", "val", "test"):
        v = report.get(split)
        if v:
            print(f"  {split:5s}  docs={v['n_docs']:5d}  "
                  f"tokens={v['n_tokens']:8d}  quality={v['mean_quality']}")

    pairs = minhash_candidate_pairs(docs, "text", "doc_id", rows_per_band=4)
    comps = connected_components(pairs)
    hist = (
        comps.groupBy("component").count()
        .groupBy("count").agg(F.count("*").alias("n_clusters"))
        .orderBy("count")
    )
    print("\nnear-dup cluster size histogram (LSH graph components):")
    for r in hist.collect():
        print(f"  size {r['count']:3d}: {r['n_clusters']} cluster(s)")

    # training-reader prep over the surviving train split: pack docs
    # into fixed 512-token context windows and report utilization
    from ulh_etl_spark.operators.text import pack_sequences, pack_utilization

    train = curated.filter(F.col("split") == "train")
    packed = pack_sequences(train, "text", "doc_id", ctx_len=512, n_shards=4)
    print("\ntrain-split packing (512-token windows, 4 shards):")
    for r in pack_utilization(packed, ctx_len=512).orderBy("shard").collect():
        print(f"  shard {r['shard']}: docs={r['n_docs']:5d} "
              f"tokens={r['total_tokens']:8d} windows={r['n_windows']:5d} "
              f"pad={100 * r['pad_frac']:.2f}%")


if __name__ == "__main__":
    main()
