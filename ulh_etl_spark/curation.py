"""End-to-end training-corpus curation: the composition layer that
chains the engine's document operators into the standard LLM-data
pipeline shape:

    annotate (quality, lang, tokens)      narrow map
    -> filter (quality / language)        pushed predicates
    -> exact dedup (fingerprint)          one uniform-hash shuffle
    -> near dedup (MinHash + LSH)         banded equality self-join
    -> train/val/test hash split          narrow map
    -> write partitionBy(split)           partition-pruned reads

Every stage is lazy — the whole pipeline is ONE Spark job graph, so
Catalyst pushes the quality/lang filters beneath the dedup shuffles
and the corpus is scanned once.

Near-dedup keep rule: a doc is dropped iff it appears as the HIGHER
id in any LSH candidate pair (keep-lowest-id). This is the standard
single-pass approximation of connected components — transitive
near-dup chains keep one doc per *edge* group rather than per
component; full CC needs an iterative graph pass (documented
non-goal here).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ulh_etl_spark.operators.dedup import minhash_candidate_pairs
from ulh_etl_spark.operators.text import (
    fingerprint,
    hash_split,
    lang_id,
    quality_score,
    token_count,
)


@dataclass(frozen=True)
class CurationConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    min_quality: float = 0.0
    langs: tuple[str, ...] | None = None  # None = keep all
    near_dedup: bool = True
    minhash_num_hashes: int = 8
    minhash_rows_per_band: int = 2
    # Exact-decontamination gram length/threshold. 24-char grams
    # (~4 words) are specific enough that only genuine benchmark
    # overlap collides; the 8-char default the q79 CORRECTNESS query
    # uses flags essentially the whole corpus on natural text (short
    # grams are common substrings) — right for exercising the
    # operator, corpus-nuking as a pipeline default.
    decontam_gram_n: int = 24
    decontam_min_shared: int = 3
    split_salt: str = "split"
    train_pct: int = 80
    val_pct: int = 10


def annotate(df: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Quality, language, token count, and content fingerprint as
    one projection (single narrow map over the corpus)."""
    text = F.col(cfg.text_col)
    return df.select(
        "*",
        quality_score(text).alias("quality"),
        lang_id(text).alias("lang_pred"),
        token_count(text).cast("long").alias("n_tokens"),
        fingerprint(text).alias("fp"),
    )


def curate(
    df: DataFrame,
    cfg: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns the surviving corpus
    annotated with (quality, lang_pred, n_tokens, split).

    ``benchmark`` (optional): a frame of held-out eval documents with
    the same text/id columns — corpus docs sharing an exact 8-gram
    overlap (>= 3 hashes) OR a MinHash-LSH band with any benchmark
    doc are dropped before the split (decontamination, both the exact
    and the paraphrase-robust fuzzy check). Both flag relations are
    id-level and tiny; the benchmark side broadcasts.

    Scale notes: the exact-dedup keep set and the LSH drop set are
    both id-level relations — joins against them are semi/anti joins
    on the doc id (hash-shuffled, no skew: ids are uniform). The LSH
    drop set is usually tiny relative to the corpus; at 100 TB both
    joins convert to broadcasts via AQE when they fit.
    """
    if benchmark is not None:
        from ulh_etl_spark.operators.dedup import lsh_contamination
        from ulh_etl_spark.operators.text import contamination_counts

        exact = contamination_counts(
            df,
            benchmark,
            cfg.text_col,
            cfg.id_col,
            n=cfg.decontam_gram_n,
            min_shared=cfg.decontam_min_shared,
        ).select(cfg.id_col)
        fuzzy = lsh_contamination(
            df,
            benchmark,
            cfg.text_col,
            cfg.id_col,
            num_hashes=cfg.minhash_num_hashes,
            rows_per_band=cfg.minhash_rows_per_band,
        ).select(cfg.id_col)
        df = df.join(exact.union(fuzzy).distinct(), cfg.id_col, "left_anti")

    ann = annotate(df, cfg)

    kept = ann.filter(F.col("quality") >= cfg.min_quality)
    if cfg.langs is not None:
        kept = kept.filter(F.col("lang_pred").isin(*cfg.langs))

    # exact dedup: keep the minimum id per fingerprint. Window form,
    # not groupBy + semi-join back: ONE shuffle on fp instead of two
    # (same uniform hash key, strictly fewer exchanges).
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(cfg.id_col)
    kept = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    if cfg.near_dedup:
        pairs = minhash_candidate_pairs(
            kept,
            cfg.text_col,
            cfg.id_col,
            num_hashes=cfg.minhash_num_hashes,
            rows_per_band=cfg.minhash_rows_per_band,
        )
        drops = pairs.select(F.col("id2").alias(cfg.id_col)).distinct()
        kept = kept.join(drops, cfg.id_col, "left_anti")

    return kept.withColumn(
        "split",
        hash_split(
            F.col(cfg.id_col),
            salt=cfg.split_salt,
            train_pct=cfg.train_pct,
            val_pct=cfg.val_pct,
        ),
    )


def curation_report(curated: DataFrame) -> dict:
    """Per-split tallies in ONE aggregation job (counts, token sums,
    mean quality) — the numbers a data card needs."""
    rows = (
        curated.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("quality"), 4).alias("mean_quality"),
        )
        .collect()
    )
    return {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "mean_quality": r["mean_quality"],
        }
        for r in rows
    }


def write_curated(curated: DataFrame, path: str) -> None:
    """Persist partitioned by split so downstream training readers
    scan only their partition (partition-pruned)."""
    curated.write.mode("overwrite").partitionBy("split").parquet(path)
