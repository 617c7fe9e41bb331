"""q206 session-variance root-cause harness (VERDICT r16 item 1).

q206_prefix_filter_pairs read 1.55 s in one floor-1.00 suite session
and 4.50 s in another at the SAME code — a 3x spread the floor guard
does not explain. This tool decomposes one q206 evaluation into its
sequential stages and repeats the whole evaluation N times in ONE
session, so a bimodal stage (AQE flip, broadcast-vs-sortmerge verify,
eager count) shows up as per-stage variance rather than a single
opaque wall number.

Stages timed per rep (mirrors operators/dedup.py
prefix_filter_jaccard_pairs with q206's params):
  build+count   construction of the DataFrame — includes the gram
                persist, prefix persist, and the EAGER cand.count()
                that picks the verify shape
  verify        the noop sink of the returned DataFrame (bloom stage
                + exact verify + jaccard filter)
  total         build + verify (what bench.py times)

Usage: python tools/profile_q206_var.py [reps=6]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-local"

from ulh_etl_spark.cache import release_persisted
from ulh_etl_spark.queries import all_queries
from ulh_etl_spark.session import get_spark

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-q206-var")
q = all_queries()["q206_prefix_filter_pairs"]

print(f"sf_dir={sf_dir} reps={reps}")
for rep in range(reps):
    release_persisted()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"q206 rep{rep} build")
    t0 = time.time()
    df = q(spark, sf_dir)  # runs the eager cand.count() inside
    t1 = time.time()
    spark.sparkContext.setJobDescription(f"q206 rep{rep} verify")
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(
        f"rep{rep}: build+count {t1-t0:6.3f}s  verify {t2-t1:6.3f}s  "
        f"total {t2-t0:6.3f}s",
        flush=True,
    )
release_persisted()
spark.catalog.clearCache()
