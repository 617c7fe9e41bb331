"""Capture .explain("formatted") output for named queries into text
files (the plans/r{N}/ before/after deliverable).

Usage: python tools/capture_plans.py <outdir> <suffix> <query> [...]
e.g.:  python tools/capture_plans.py plans/r16 before q205_nn_descent_random_init
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ulh_etl_spark.cache import release_persisted
from ulh_etl_spark.queries import all_queries
from ulh_etl_spark.session import get_spark

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
os.makedirs(outdir, exist_ok=True)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("capture-plans")
qs = all_queries()

for name in names:
    df = qs[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    release_persisted()
    spark.catalog.clearCache()
