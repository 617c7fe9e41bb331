"""Fast oracle-SQL health check: every oracle must parse and plan in
DuckDB against the real table schemas (EXPLAIN, no execution). This
catches SQL typos, bad column references, and schema drift in seconds
— without spinning up Spark — so a broken oracle never reaches the
driver's correctness gate as a mysterious failure."""

import os

import duckdb
import pytest

from ulh_etl_spark.queries import all_oracles
from ulh_etl_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata not present: {SF_DIR}")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_parses_and_plans(duck, name):
    sql = all_oracles()[name]
    try:
        duck.execute(f"EXPLAIN {sql}")
    except Exception as e:  # pragma: no cover - failure path
        pytest.fail(f"{name} oracle does not plan in DuckDB: {e}")
