"""One-off profiling pass for q139's multi-round creep (VERDICT r14
what's-wrong #2): is the ~0.24 -> 0.36 drift session-aging (catalog
growth side effect inside the bench session) or a genuine plan/host
change?

Experiment, one idle-host session:
  phase A: q139 min-of-5 at session start (fresh JVM, warm cache via
           one unmeasured warm-up) + stage/partition counts + GC time
  phase B: run 40 other headline queries once each (aging load)
  phase C: q139 min-of-5 again + GC time delta

If C >> A, the creep is session aging (GC / codegen-cache / listener
state), which grows with catalog size across rounds — mechanism named,
anchor should track the suite reading, not a fresh-session ideal.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ulh_etl_spark.cache import release_persisted
from ulh_etl_spark.queries import all_queries
from ulh_etl_spark.session import get_spark

if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-local"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("profile-q139")
sc = spark.sparkContext
qs = all_queries()


def gc_time_ms() -> int:
    # total JVM GC time across the local executor = driver JVM
    bean = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(bean.get(i).getCollectionTime() for i in range(bean.size()))


def run_once(name: str) -> float:
    t0 = time.time()
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def min_of(name: str, n: int) -> list[float]:
    out = []
    for _ in range(n):
        out.append(round(run_once(name), 3))
    return out


# ---- phase A: fresh session ----
run_once("q139_event_type_anomalies")  # warm-up (codegen, page cache)
release_persisted(); spark.catalog.clearCache()
gc0 = gc_time_ms()
a = min_of("q139_event_type_anomalies", 5)
gc1 = gc_time_ms()
print(f"A fresh: runs={a} min={min(a):.3f} gc_delta_ms={gc1-gc0}")

df = qs["q139_event_type_anomalies"](spark, SF_DIR)
print("A partitions:", df.rdd.getNumPartitions())

# ---- phase B: age the session with 40 other headline queries ----
AGING = [
    "q01_pricing_summary", "q03_record_type_classify", "q05_self_join",
    "q06_composite_key_join", "q19_incremental_antijoin",
    "q31_quality_score", "q34_dedup_exact", "q36_minhash_pairs",
    "q38_ngram_jaccard_pairs", "q39_cosine_topk", "q83_top_bigrams",
    "q85_lsh_decontamination", "q87_sequence_pack", "q89_chunk_documents",
    "q90_token_budget_mix", "q91_logprob_tiles", "q93_corpus_shuffle_shards",
    "q94_duplicate_gram_fraction", "q95_zorder_clustering",
    "q96_ivf_pruned_probe", "q97_source_cap", "q98_source_gram_overlap",
    "q100_semantic_dedup", "q101_passage_dedup", "q102_neardup_collapse",
    "q104_dsir_importance", "q108_gopher_rules", "q110_boilerplate_removal",
    "q113_bloom_decontamination", "q115_bpe_merges", "q116_bpe_tokenize",
    "q118_kneser_ney_scores", "q123_zipf_slope", "q126_record_linkage",
    "q128_event_transitions", "q131_copurchase_pairs", "q133_rfm_segments",
    "q150_lang_id_ngram", "q154_hybrid_rrf", "q164_ewma_anomaly",
]
t0 = time.time()
for n in AGING:
    try:
        run_once(n)
    except Exception as ex:  # noqa: BLE001
        print("aging error", n, str(ex)[:80])
    release_persisted(); spark.catalog.clearCache()
print(f"B aging done in {time.time()-t0:.1f}s")

# ---- phase C: q139 again, aged session ----
gc2 = gc_time_ms()
c = min_of("q139_event_type_anomalies", 5)
gc3 = gc_time_ms()
print(f"C aged:  runs={c} min={min(c):.3f} gc_delta_ms={gc3-gc2}")
print(f"aging ratio min(C)/min(A) = {min(c)/min(a):.2f}")
