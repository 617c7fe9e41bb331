"""Corpus-curation composition: survivors, dedup rules, split
determinism, and the partitioned write."""

import pytest
from pyspark.sql import functions as F

from ulh_etl_spark.curation import (
    CurationConfig,
    curate,
    curation_report,
    write_curated,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the "
    "river in the morning light of a clear day"
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),  # exact duplicate of 0 -> dropped (keep min id)
        (2, GOOD + " epilogue"),  # near-dup of 0 -> dropped by LSH
        (3, "!!! ??? ;;; ..."),  # punctuation soup -> quality filter
        (4, "a completely different story about the sea and the wind "
            "told in the evening by the old sailor of the island"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_survivors(spark, corpus):
    cfg = CurationConfig(min_quality=0.3)
    out = curate(corpus, cfg)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids == {0, 4}
    cols = set(out.columns)
    assert {"quality", "lang_pred", "n_tokens", "split"} <= cols


def test_curate_without_near_dedup_keeps_neardup(spark, corpus):
    cfg = CurationConfig(min_quality=0.3, near_dedup=False)
    ids = {r["doc_id"] for r in curate(corpus, cfg).select("doc_id").collect()}
    assert ids == {0, 2, 4}  # exact dup 1 still dropped


def test_curate_lang_filter(spark, corpus):
    """langs=... keeps only docs whose predicted language is in the
    allowlist (corpus docs with English stopwords classify 'en')."""
    keep_en = CurationConfig(min_quality=0.0, near_dedup=False, langs=("en",))
    ids_en = {r["doc_id"] for r in curate(corpus, keep_en).select("doc_id").collect()}
    assert ids_en  # the GOOD docs are stopword-heavy English
    drop_all = CurationConfig(min_quality=0.0, near_dedup=False, langs=("fr",))
    assert curate(corpus, drop_all).count() == 0


def test_split_deterministic(spark, corpus):
    cfg = CurationConfig(min_quality=0.0, near_dedup=False)
    a = {r["doc_id"]: r["split"] for r in curate(corpus, cfg).collect()}
    b = {r["doc_id"]: r["split"] for r in curate(corpus, cfg).collect()}
    assert a == b and set(a.values()) <= {"train", "val", "test"}


def test_report_and_partitioned_write(spark, corpus, tmp_path):
    cfg = CurationConfig(min_quality=0.3)
    out = curate(corpus, cfg)
    rep = curation_report(out)
    assert sum(v["n_docs"] for v in rep.values()) == 2
    for v in rep.values():
        assert v["n_tokens"] > 0 and 0 <= v["mean_quality"] <= 1

    path = str(tmp_path / "curated")
    write_curated(out, path)
    back = spark.read.parquet(path)
    assert back.count() == 2
    # split must be a real partition column: directory layout + a
    # split-filter plan that prunes at the partition level
    import os

    subdirs = {d for d in os.listdir(path) if d.startswith("split=")}
    assert subdirs, f"expected split= partition dirs, got {os.listdir(path)}"
    a_split = sorted(subdirs)[0].split("=", 1)[1]
    one = back.filter(F.col("split") == a_split)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split(
        "PartitionFilters", 1
    )[1][:200]


def test_curate_decontaminates_against_benchmark(spark):
    from ulh_etl_spark.curation import CurationConfig, curate

    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet field until the early evening")
    corpus = spark.createDataFrame(
        [
            (1, base),                               # exact benchmark copy
            (2, base.replace("quiet", "silent")),    # near dup of benchmark
            (3, "completely unrelated text about catalyst physical plans "
                "and shuffle exchanges in distributed query engines"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, base)], "doc_id long, text string")
    cfg = CurationConfig(min_quality=0.0, near_dedup=False)
    kept_with = {r["doc_id"] for r in curate(corpus, cfg, benchmark=bench).collect()}
    kept_wo = {r["doc_id"] for r in curate(corpus, cfg).collect()}
    assert 1 not in kept_with            # exact contamination dropped
    assert 3 in kept_with                # clean doc survives
    assert kept_wo == {1, 2, 3}          # no benchmark -> no drops


def test_curate_with_benchmark_keeps_clean_corpus(spark):
    """Regression (round 5): the decontamination DEFAULTS must not
    nuke a clean corpus — with 24-char grams, docs sharing no real
    phrase with the benchmark all survive."""
    from ulh_etl_spark.curation import CurationConfig, curate

    corpus = spark.createDataFrame(
        [
            (i, f"document number {i} talks about topic {i % 7} in its "
                f"own particular way with wording variant {i * 13 % 31}")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(999, "a completely different held out evaluation prompt about "
               "orbital mechanics and spacecraft attitude control")],
        "doc_id long, text string",
    )
    cfg = CurationConfig(min_quality=0.0, near_dedup=False)
    kept = curate(corpus, cfg, benchmark=bench).count()
    assert kept == 40


def test_greedy_coverage_matches_brute_force_across_checkpoint(spark):
    """k=9 crosses the covered-set localCheckpoint (every 4 picks)
    twice — pins that lineage truncation never changes the greedy
    selection, against a brute-force set-cover replay."""
    from ulh_etl_spark.operators.dedup import greedy_max_coverage

    texts = {
        1: "abcdefgh",
        2: "efghijkl",
        3: "ijklmnop",
        4: "mnopqrst",
        5: "qrstuvwx",
        6: "uvwxyzab",
        7: "abcdijkl",
        8: "mnopuvwx",
        9: "cdefklmn",
        10: "ghijopqr",
        11: "stuvyzab",
        12: "wxyzcdef",
    }
    n = 3
    grams = {
        i: {t[j:j + n] for j in range(len(t) - n + 1)}
        for i, t in texts.items()
    }
    covered: set = set()
    want = []
    total = 0
    for pick in range(1, 10):
        best = None
        for i in sorted(grams):
            if any(i == w[1] for w in want):
                continue
            gain = len(grams[i] - covered)
            if best is None or gain > best[1]:
                best = (i, gain)
        if best is None or best[1] == 0:
            break
        covered |= grams[best[0]]
        total += best[1]
        want.append((pick, best[0], best[1], total))

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = [
        (r.pick, r.doc_id, r.gain, r.covered_total)
        for r in greedy_max_coverage(df, "text", "doc_id", k=9, n=n)
        .orderBy("pick").collect()
    ]
    assert got == want
