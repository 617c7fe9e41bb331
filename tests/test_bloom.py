"""Bloom filter: no false negatives ever, FP rate within the
standard bound, and the composed decontamination stays exact even
with a deliberately saturated (all-FP) bitmap."""

import hashlib

import pytest

from ulh_etl_spark.operators.bloom import bloom_probe, build_bloom


def _key(i: int) -> int:
    """Deterministic well-distributed signed 64-bit key."""
    h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
    return h - (1 << 64) if h >= (1 << 63) else h


N_MEMBERS = 5000
N_PROBES = 20000
N_BITS = 1 << 17
N_HASHES = 5


def test_bloom_no_false_negatives_and_fp_bound(spark):
    members = spark.createDataFrame(
        [(_key(i),) for i in range(N_MEMBERS)], "g long"
    )
    bits = build_bloom(members, "g", n_bits=N_BITS, n_hashes=N_HASHES)
    assert len(bits) == N_BITS // 8

    probes = spark.createDataFrame(
        [(i, _key(i)) for i in range(N_MEMBERS + N_PROBES)], "i long, g long"
    )
    out = {
        r.i: r._in_bloom
        for r in bloom_probe(probes, "g", bits, N_HASHES).collect()
    }
    # every member must probe True — the Bloom contract
    assert all(out[i] for i in range(N_MEMBERS))
    # FP rate among non-members within 3x the theoretical bound
    import math

    fp = sum(out[i] for i in range(N_MEMBERS, N_MEMBERS + N_PROBES))
    p_theory = (1 - math.exp(-N_HASHES * N_MEMBERS / N_BITS)) ** N_HASHES
    assert fp / N_PROBES <= max(3 * p_theory, 0.002), (fp, p_theory)


def test_bloom_null_probes_false(spark):
    members = spark.createDataFrame([(1,)], "g long")
    bits = build_bloom(members, "g", n_bits=1 << 10, n_hashes=3)
    probes = spark.createDataFrame([(1, 1), (2, None)], "i long, g long")
    out = {
        r.i: r._in_bloom
        for r in bloom_probe(probes, "g", bits, 3).collect()
    }
    assert out == {1: True, 2: False}


def test_bloom_huge_keys_with_nulls_in_batch(spark):
    """Regression for ADVICE r7 (bloom.py:123): a NULL sharing an
    Arrow batch with keys of magnitude > 2^53 used to coerce the
    whole column to float64, round-tripping 9007199254740993 to
    ...992 — a member probing False (false negative) and a corrupt
    bitmap on build. Both sides must keep NULLs out of the batch."""
    big = [(1 << 53) + 1, (1 << 53) + 3, -((1 << 53) + 5), (1 << 62) + 7]
    members = spark.createDataFrame(
        [(k,) for k in big] + [(None,)], "g long"
    ).coalesce(1)  # one batch: nulls and big keys together
    bits = build_bloom(members, "g", n_bits=1 << 12, n_hashes=3)

    probes = spark.createDataFrame(
        [(i, k) for i, k in enumerate(big)]
        + [(99, None), (100, (1 << 53) + 2)],  # +2: float64 alias of +1/+3
        "i long, g long",
    ).coalesce(1)
    out = {
        r.i: r._in_bloom
        for r in bloom_probe(probes, "g", bits, 3).collect()
    }
    assert all(out[i] for i in range(len(big))), out  # no false negatives
    assert out[99] is False  # NULL probes False


def test_build_bloom_rejects_bad_args(spark):
    df = spark.createDataFrame([(1,)], "g long")
    with pytest.raises(ValueError):
        build_bloom(df, "g", n_bits=1000)  # not a power of two
    with pytest.raises(ValueError):
        build_bloom(df, "g", n_bits=1 << 10, n_hashes=0)


@pytest.fixture
def decon_corpus(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "quick brown fox jumps over"),  # partial overlap
            (3, "completely different words here entirely"),
        ],
        "doc_id long, text string",
    )
    return bench, corpus


def test_bloom_decontamination_matches_exact(spark, decon_corpus):
    from ulh_etl_spark.operators.text import (
        bloom_contamination_counts,
        contamination_counts,
    )

    bench, corpus = decon_corpus
    exact = sorted(
        (r.doc_id, r.n_shared)
        for r in contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3
        ).collect()
    )
    bloom = sorted(
        (r.doc_id, r.n_shared)
        for r in bloom_contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3,
            n_bits=1 << 16, n_hashes=5,
        ).collect()
    )
    assert bloom == exact
    assert exact  # non-trivial: at least one contaminated doc


def test_bloom_decontamination_self_sized_default(spark, decon_corpus):
    """n_bits=None (the r16 default) self-sizes the bitmap from a
    measured benchmark gram count (>= 10 bits/gram, pow2, floored at
    2^20 — the q177 policy) and still reproduces the exact output."""
    from ulh_etl_spark.operators.text import (
        bloom_contamination_counts,
        contamination_counts,
    )

    bench, corpus = decon_corpus
    exact = sorted(
        (r.doc_id, r.n_shared)
        for r in contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3
        ).collect()
    )
    sized = sorted(
        (r.doc_id, r.n_shared)
        for r in bloom_contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3
        ).collect()
    )
    assert sized == exact


def test_bloom_decontamination_exact_even_when_saturated(spark, decon_corpus):
    """Adversarial: an 8-bit bitmap saturates, so EVERY gram is a
    Bloom positive — the exact verify join must still kill all false
    positives and reproduce the exact output."""
    from ulh_etl_spark.operators.text import (
        bloom_contamination_counts,
        contamination_counts,
    )

    bench, corpus = decon_corpus
    exact = sorted(
        (r.doc_id, r.n_shared)
        for r in contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3
        ).collect()
    )
    saturated = sorted(
        (r.doc_id, r.n_shared)
        for r in bloom_contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3,
            n_bits=8, n_hashes=1,
        ).collect()
    )
    assert saturated == exact
