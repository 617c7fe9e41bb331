"""Catalog meta-tests: the driver contract stays coherent — every
query has an oracle, names match, and the entry point exposes the
catalog unchanged."""

import __spark_entry__ as entry

from ulh_etl_spark.queries import all_oracles, all_queries


# Queries that are DELIBERATELY rows-only (the result is an
# engine-specific estimate no SQL oracle can reproduce); each must
# carry a pytest pinning its accuracy instead. Since round 8 this is
# EMPTY: the sketch queries (q62/q77) emit exact companion columns
# plus an error-bound flag the oracle pins to TRUE, and the zlib
# catalog slot became the SQL-expressible distinct-gram proxy (zlib
# itself stays pytest-pinned in test_text_scoring.py) — so every
# catalog entry the driver samples is fully hash-checkable.
ROWS_ONLY_OK: set[str] = set()


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


import re


def test_catalog_naming_convention():
    for name in all_queries():
        assert re.fullmatch(r"q\d{2,3}_[a-z0-9_]+", name), name


def test_catalog_md_not_stale():
    """CATALOG.md is the committed reviewer-facing index; its query
    list must equal all_queries() so tools/gen_catalog.py can't be
    forgotten after adding a query (it went stale in round 6)."""
    import pathlib

    text = pathlib.Path(__file__).parent.parent.joinpath("CATALOG.md").read_text()
    listed = set(re.findall(r"^\| (q\d+_\w+) \|", text, flags=re.M))
    assert listed == set(all_queries())
    m = re.search(r"^(\d+) queries; (\d+) hash-checked", text, flags=re.M)
    assert m and (int(m.group(1)), int(m.group(2))) == (
        len(all_queries()),
        len(all_oracles()),
    )
