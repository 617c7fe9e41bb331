"""Catalog meta-tests: the driver contract stays coherent — every
query has an oracle, names match, and the entry point exposes the
catalog unchanged."""

import __spark_entry__ as entry

from ulh_etl_spark.queries import all_oracles, all_queries


# Queries that are DELIBERATELY rows-only (the result is an
# engine-specific estimate no SQL oracle can reproduce); each must
# carry a pytest pinning its accuracy instead.
ROWS_ONLY_OK = {
    "q62_approx_user_counts",  # HLL++ sketch — bound in test_analytics
    "q77_approx_quartiles",  # t-digest sketch — bound in test_analytics
}


def test_every_query_has_an_oracle():
    """The correctness gate hash-compares each query against its
    oracle; a missing oracle silently downgrades to a rows-only check
    — keep the catalog fully checked except the declared sketch ops."""
    queries = all_queries()
    oracles = all_oracles()
    missing = sorted(set(queries) - set(oracles) - ROWS_ONLY_OK)
    assert missing == [], f"queries without oracle SQL: {missing}"


def test_no_orphan_oracles():
    orphans = sorted(set(all_oracles()) - set(all_queries()))
    assert orphans == [], f"oracles without queries: {orphans}"


def test_entry_contract_shape():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert qs == all_queries()
    assert os_ == all_oracles()
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())


def test_catalog_naming_convention():
    for name in all_queries():
        assert name[0] == "q" and name[1:3].isdigit() and name[3] == "_", name
