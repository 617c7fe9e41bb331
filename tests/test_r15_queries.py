"""Invariant pins for the round-15 catalog additions (q224-q232).

Exact value parity is the oracle gate's job (each query is
hash-checked against DuckDB at sf0.01); these tests pin the
STRUCTURAL invariants a refactor could silently break — conservation
(histograms sum back to their source counts), bounds (rates and
densities in range, entropy under its log2 cap), and monotonicity
(the Heaps curve never goes down).
"""

import math

from pyspark.sql import functions as F

from ulh_etl_spark.session import load_table


def test_l_diversity_conserves_classes_and_rows(spark, sf_dir):
    from ulh_etl_spark.queries.relational import (
        _KANON_BAL_BUCKET,
        q224_l_diversity_profile,
    )

    rows = q224_l_diversity_profile(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(_KANON_BAL_BUCKET)).alias("b"),
        )
        .distinct()
        .count()
    )
    assert sum(r.n_classes for r in rows) == classes
    assert sum(r.n_rows for r in rows) == cust.count()
    for r in rows:
        assert r.violates_l3 == (r.distinct_sensitive < 3)


def test_heaps_curve_is_monotone_and_ends_at_full_corpus(spark, sf_dir):
    from ulh_etl_spark.operators.text import whitespace_tokens
    from ulh_etl_spark.queries.textops import q225_heaps_vocab_growth

    rows = sorted(
        q225_heaps_vocab_growth(spark, sf_dir).collect(),
        key=lambda r: r.frac,
    )
    assert [r.frac for r in rows] == [0.1, 0.25, 0.5, 0.75, 1.0]
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs
        assert a.n_tokens <= b.n_tokens
        assert a.n_types <= b.n_types
    docs = load_table(spark, sf_dir, "documents")
    full = docs.select(
        F.explode(whitespace_tokens(F.col("text"))).alias("w")
    )
    assert rows[-1].n_types == full.select("w").distinct().count()
    assert rows[-1].n_tokens == full.count()
    assert rows[-1].n_docs == docs.count()


def test_transition_entropy_bounds(spark, sf_dir):
    from ulh_etl_spark.queries.analytic import q226_transition_entropy

    rows = q226_transition_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # H in [0, log2(#next types)]; modal prob >= uniform share
        assert -1e-9 <= r.entropy_bits <= math.log2(r.n_next_types) + 1e-9
        assert r.top_prob >= 1.0 / r.n_next_types - 1e-9
        assert r.top_prob <= 1.0


def test_dup_inflation_conserves_docs(spark, sf_dir):
    from ulh_etl_spark.queries.dedup import q228_dup_inflation_by_source

    rows = q228_dup_inflation_by_source(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.n_droppable == r.n_docs - r.n_distinct
        assert r.inflation >= 1.0


def test_simpson_bounds_and_token_conservation(spark, sf_dir):
    from ulh_etl_spark.operators.text import whitespace_tokens
    from ulh_etl_spark.queries.textops import (
        q229_simpson_lexical_diversity,
    )

    rows = q229_simpson_lexical_diversity(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.explode(whitespace_tokens(F.col("text"))).alias("w")
    ).count()
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0.0 <= r.simpson_index <= 1.0
        assert abs(r.simpson_index + r.diversity - 1.0) <= 2e-6
        assert r.n_types <= r.n_tokens


def test_lsh_bucket_histogram_conserves_band_rows(spark, sf_dir):
    from ulh_etl_spark.queries.dedup import q230_lsh_bucket_histogram

    rows = q230_lsh_bucket_histogram(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    per_band = {}
    for r in rows:
        per_band.setdefault(r.band_idx, 0)
        per_band[r.band_idx] += r.bucket_size * r.n_buckets
        assert r.candidate_pairs == (
            r.n_buckets * r.bucket_size * (r.bucket_size - 1) // 2
        )
    # every doc lands in exactly one bucket per band
    assert all(v == n for v in per_band.values()), per_band


def test_cluster_edge_density_bounds(spark, sf_dir):
    from ulh_etl_spark.queries.similarity import q231_cluster_edge_density

    rows = q231_cluster_edge_density(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_members >= 2
        # connected: at least a spanning tree; at most the clique
        assert r.n_members - 1 <= r.n_edges
        assert r.n_edges <= r.n_members * (r.n_members - 1) // 2
        assert 0.0 < r.density <= 1.0


def test_lsh_recall_curve_budget_and_rates(spark, sf_dir):
    from ulh_etl_spark.queries.dedup import q232_lsh_recall_curve

    rows = q232_lsh_recall_curve(spark, sf_dir).collect()
    total_pairs = sum(r.n_pairs for r in rows)
    # the sample is self-sizing: n_pairs == C(|S|, 2) for some |S|
    s = int((1 + math.isqrt(1 + 8 * total_pairs)) // 2)
    assert s * (s - 1) // 2 == total_pairs, (s, total_pairs)
    for r in rows:
        assert 0 <= r.n_candidates <= r.n_pairs
        assert 0.0 <= r.candidate_rate <= 1.0
    # the S-curve property that matters: the top decile is caught at
    # a (weakly) higher rate than the bottom decile
    lo = min(rows, key=lambda r: r.jac_decile)
    hi = max(rows, key=lambda r: r.jac_decile)
    assert hi.candidate_rate >= lo.candidate_rate
