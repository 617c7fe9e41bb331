"""q206 join-strategy bimodality probe (VERDICT r16 item 1).

Hypothesis from the r17 plan capture: the prefix self-join's build
side sits right at the broadcast boundary (the persisted prefix
relation reads ~23 MiB with all columns; the projected join side
straddles the 10 MB threshold), so AQE flips BroadcastHashJoin <->
SortMergeJoin between sessions — the 1.55 s vs 4.50 s spread.

This probe times q206 in ONE session under three settings of
spark.sql.autoBroadcastJoinThreshold (runtime-settable):
  default   AQE decides (whatever this session's estimates say)
  off       -1 on both static+adaptive thresholds -> no broadcast
  wide      256 MB -> always broadcast
If 'off' reproduces the slow sessions and 'wide' the fast ones, the
variance is the join-strategy flip, not JIT.

Usage: python tools/profile_q206_join.py [reps=3]
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

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-q206-join")
q = all_queries()["q206_prefix_filter_pairs"]

SETTINGS = [
    ("default", None),
    ("off", "-1"),
    ("wide", str(256 * 1024 * 1024)),
]
base = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

# warmup (JIT/codegen) under default
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
release_persisted()
spark.catalog.clearCache()

for name, thr in SETTINGS:
    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(key, thr if thr is not None else base)
    for rep in range(reps):
        spark.sparkContext.setJobDescription(f"q206 {name} rep{rep}")
        t0 = time.time()
        df = q(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(
            f"{name:8s} rep{rep}: build+count {t1-t0:6.3f}s "
            f"verify {t2-t1:6.3f}s total {t2-t0:6.3f}s",
            flush=True,
        )
        release_persisted()
        spark.catalog.clearCache()
for key in (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
):
    spark.conf.set(key, base)
