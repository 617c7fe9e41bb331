"""TF-IDF / BM25 / hyperplane-LSH: pure-Python model checks on tiny
inputs plus plan-shape proofs (signature is a narrow map — zero
shuffles)."""

import math

from pyspark.sql import functions as F

from ulh_etl_spark.operators.similarity import (
    hyperplane_signature,
    hyperplane_weights,
)
from ulh_etl_spark.operators.text import bm25_scores, tfidf

DOCS = [
    (0, "cat dog cat"),
    (1, "dog fish"),
    (2, "cat cat cat bird"),
    (3, ""),  # token-less doc must still appear with bm25=0
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tfidf_matches_model(spark):
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
        for r in tfidf(_docs_df(spark), "text", "doc_id").collect()
    }
    # model: N=4 docs; smooth idf = ln((N+1)/(df+1))
    tf = {}
    for did, text in DOCS:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df = {}
    for (did, t) in tf:
        df[t] = df.get(t, 0) + 1
    model = {
        k: (n, round(n * math.log(5.0 / (df[k[1]] + 1)), 6))
        for k, n in tf.items()
    }
    assert out == model


def test_bm25_model_and_empty_doc(spark):
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            _docs_df(spark), "text", "doc_id", ("cat", "fish")
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[3] == 0.0  # empty doc scores zero, still present
    assert out[1] > 0.0  # fish hit
    # 'cat' df=2, 'fish' df=1 — doc 1's single rare-term hit vs doc
    # 0's double common-term hit: idf(fish) > idf(cat)
    n, k1, b = 4, 1.2, 0.75
    avgdl = (3 + 2 + 4 + 0) / 4.0

    def w(tf, dfreq, dl):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[0] - round(w(2, 2, 3), 6)) < 1e-6
    assert abs(out[1] - round(w(1, 1, 2), 6)) < 1e-6
    assert abs(out[2] - round(w(3, 2, 4), 6)) < 1e-6


def test_hash_split_deterministic_and_complete(spark):
    """Same key -> same split on every evaluation; ratios roughly
    80/10/10; all three splits non-empty at n=2000."""
    from ulh_etl_spark.operators.text import hash_split

    df = spark.range(2000).select(F.col("id"))
    a = {r["id"]: r["s"] for r in df.select("id", hash_split(F.col("id")).alias("s")).collect()}
    b = {r["id"]: r["s"] for r in df.select("id", hash_split(F.col("id")).alias("s")).collect()}
    assert a == b
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert counts["val"] > 0 and counts["test"] > 0


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: two docs sharing a substring of length
    >= k + window - 1 (= 8 here) share at least one fingerprint."""
    from ulh_etl_spark.operators.text import winnow_fingerprints

    shared = "zqxwvuty"  # 8 chars, distinctive
    docs = [
        (0, f"aaaa {shared} bbbb"),
        (1, f"cccc dddd {shared}"),
        (2, "totally different content here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[0] & by_doc[1], "shared substring must share a fingerprint"
    # sanity: winnowing selects far fewer fingerprints than k-grams
    assert len(by_doc[0]) < len(docs[0][1]) - 4


def test_hyperplane_signature_matches_model(spark):
    vecs = [
        (0, [1.0, 0.0, -1.0, 0.5]),
        (1, [-1.0, 2.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> all dots 0 -> sig 0
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["hsig"]
        for r in hyperplane_signature(df, dim=4, num_planes=8).collect()
    }
    planes = hyperplane_weights(8, 4)
    for vid, v in vecs:
        sig = 0
        for p, plane in enumerate(planes):
            dot = sum(x * w for x, w in zip(v, plane))
            if dot > 0:
                sig |= 1 << p
        assert out[vid] == sig, (vid, out[vid], sig)
    assert out[2] == 0


def test_hyperplane_signature_no_shuffle(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    plan = (
        hyperplane_signature(df, dim=8, num_planes=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure narrow map


def test_lsh_pairs_similar_vectors_collide(spark):
    """Two nearly-identical vectors share all hyperplane bits, so the
    banded join must emit them as a candidate pair."""
    import random

    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 1e-6 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>",
    )
    from ulh_etl_spark.operators.similarity import hyperplane_candidate_pairs

    pairs = {
        (r["id1"], r["id2"])
        for r in hyperplane_candidate_pairs(
            df, dim=16, num_planes=16, rows_per_band=8
        ).collect()
    }
    assert (0, 1) in pairs
    # the antipodal vector flips every bit — no band can match
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_unigram_logprob_model(spark):
    import math

    from ulh_etl_spark.operators.text import unigram_logprob_scores

    docs = [(0, "a a b"), (1, "b c"), (2, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["mean_logprob"]
        for r in unigram_logprob_scores(df, "text", "doc_id").collect()
    }
    # corpus counts: a=2, b=2, c=1, total=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want0 = round((2 * math.log(p["a"]) + math.log(p["b"])) / 3, 6)
    want1 = round((math.log(p["b"]) + math.log(p["c"])) / 2, 6)
    assert abs(out[0] - want0) < 1e-6
    assert abs(out[1] - want1) < 1e-6
    assert out[2] is None  # token-less doc survives with NULL


def test_contamination_counts_model(spark):
    from ulh_etl_spark.operators.text import contamination_counts

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "xxx quick brown fox yyy"),   # shares long substring
            (2, "zzzz completely unrelated"),  # no shared 8-grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_counts(
            corpus, bench, "text", "doc_id", n=8, min_shared=3
        ).collect()
    }
    assert 1 in out and out[1] >= 3
    assert 2 not in out


def test_repetition_signals_model(spark):
    from ulh_etl_spark.operators.text import repetition_signals

    docs = [
        (0, "spam spam spam spam spam"),       # degenerate repetition
        (1, "one two three four five"),        # fully diverse
        (2, ""),                               # token-less
        (3, "single"),                         # one token: ttr only
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["ttr"], r["top_bigram_frac"])
        for r in repetition_signals(df, "text", "doc_id").collect()
    }
    assert out[0] == (0.2, 1.0)       # 1 distinct token; 'spam spam' = all bigrams
    assert out[1] == (1.0, 0.25)      # all distinct; every bigram unique (1/4)
    assert out[2] == (None, None)
    assert out[3] == (1.0, None)


def test_top_ngrams_model(spark):
    from ulh_etl_spark.operators.text import top_ngrams

    docs = [
        (0, "a b a b a b"),    # 'a b' x3, 'b a' x2
        (1, "a b c"),          # 'a b', 'b c'
        (2, "x"),              # too short: no bigrams
        (3, ""),               # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = top_ngrams(df, "text", n=2, k=3).collect()
    got = [(r["ngram"], r["n_occurrences"]) for r in rows]
    assert got == [("a b", 4), ("b a", 2), ("b c", 1)]

    # trigram path + tie cut determinism (all counts 1 -> lexicographic)
    tri = top_ngrams(df, "text", n=3, k=2).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in tri] == [
        ("a b a", 2),
        ("b a b", 2),
    ]


def test_pack_sequences_model(spark):
    from ulh_etl_spark.operators.text import pack_sequences, pack_utilization

    # one shard (n_shards=1) makes the running sum easy to check
    docs = [
        (0, "w " * 300),   # 300 tokens -> offset 0,   pack 0
        (1, "w " * 300),   # offset 300, pack 0 (straddles into 1)
        (2, "w " * 300),   # offset 600, pack 1
        (3, ""),           # 0 tokens  -> offset 900, pack 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["start_offset"], r["pack_idx"])
        for r in pack_sequences(df, "text", "doc_id", ctx_len=512, n_shards=1).collect()
    }
    assert out[0] == (0, 300, 0, 0)
    assert out[1] == (0, 300, 300, 0)
    assert out[2] == (0, 300, 600, 1)
    assert out[3] == (0, 0, 900, 1)

    util = pack_utilization(
        pack_sequences(df, "text", "doc_id", ctx_len=512, n_shards=1),
        ctx_len=512,
    ).collect()
    assert len(util) == 1
    r = util[0]
    # 900 tokens -> 2 windows of 512 = 1024 slots, 124 padded
    assert (r["n_docs"], r["total_tokens"], r["n_windows"]) == (4, 900, 2)
    assert r["pad_frac"] == round(124 / 1024, 6)


def test_pack_sequences_shard_determinism(spark):
    from ulh_etl_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id long, text string"
    )
    a = pack_sequences(df, "text", "doc_id", ctx_len=8, n_shards=4).collect()
    b = pack_sequences(df, "text", "doc_id", ctx_len=8, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shards = {r["shard"] for r in a}
    assert shards <= set(range(4)) and len(shards) > 1


def test_chunk_documents_model(spark):
    from ulh_etl_spark.operators.text import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))   # 10 tokens
    df = spark.createDataFrame(
        [(0, toks), (1, "a b"), (2, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_n_tokens"])
        )
        assert r["chunk_n_tokens"] == len(r["chunk_text"].split())
    # step=2: starts 0,2,4,6,8 -> ceil((10-2)/2)=4 chunks, starts 0,2,4,6
    assert [c[0] for c in sorted(by_doc[0])] == [0, 1, 2, 3]
    assert sorted(by_doc[0])[0][1] == "t0 t1 t2 t3"
    assert sorted(by_doc[0])[-1][1] == "t6 t7 t8 t9"
    # overlap contract: consecutive chunks share `overlap` tokens
    assert sorted(by_doc[0])[0][1].split()[2:] == sorted(by_doc[0])[1][1].split()[:2]
    # short doc -> itself whole; empty doc -> nothing
    assert by_doc[1] == [(0, "a b", 2)]
    assert 2 not in by_doc


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from ulh_etl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_token_budget_sample_model(spark):
    from ulh_etl_spark.operators.text import token_budget_sample

    # group A: three docs, budget admits greedily by quality
    docs = [
        (1, "a", "x " * 50),   # 50 tokens
        (2, "a", "y " * 60),   # 60 tokens
        (3, "a", "z " * 70),   # 70 tokens
        (4, "b", "w " * 10),   # lone doc in its group
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = token_budget_sample(df, "text", "doc_id", "source", budget_tokens=100)
    rows = {r["doc_id"]: r for r in out.collect()}
    # equal-length tokens -> quality ordered by doc length; doc 3 (70)
    # first (longest = highest length score), then 2 (60): taken 70 < 100
    # admits 2; after 130 >= 100 doc 1 is rejected.
    assert set(rows) == {3, 2, 4}
    assert rows[3]["taken_before"] == 0
    assert rows[2]["taken_before"] == 70
    assert rows[4]["taken_before"] == 0
    # budget respected up to one-doc overshoot, per group
    for r in rows.values():
        assert r["taken_before"] < 100


def test_pack_sequences_default_shards_is_cluster_parallelism(spark):
    """The n_shards default must track defaultParallelism — a fixed
    small default would cap the only shuffle's parallelism and
    silently serialize a 100 TB pack onto that many tasks."""
    from ulh_etl_spark.operators.text import pack_sequences

    dp = spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(64 * dp)], "doc_id long, text string"
    )
    shards = {r["shard"] for r in pack_sequences(df, "text", "doc_id").collect()}
    # modulus is dp: with 64*dp uniform-hashed docs every residue
    # appears (P(miss) < dp * (1-1/dp)^(64*dp), vanishing)
    assert shards == set(range(dp))


def test_pack_utilization_zero_token_shard(spark):
    """ANSI-mode guard: a shard of entirely token-less docs must
    yield pad_frac 0.0, not DIVIDE_BY_ZERO (ADVICE r4)."""
    from ulh_etl_spark.operators.text import pack_sequences, pack_utilization

    df = spark.createDataFrame([(0, ""), (1, "  ")], "doc_id long, text string")
    rows = pack_utilization(
        pack_sequences(df, "text", "doc_id", ctx_len=512, n_shards=1),
        ctx_len=512,
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["total_tokens"], rows[0]["n_windows"], rows[0]["pad_frac"]) == (
        0, 0, 0.0,
    )


def test_hashed_linear_score_model(spark):
    """Hashed bag-of-words scorer: matches a pure-Python replica, and
    tokenless/null docs land at sigmoid(0) = 0.5 instead of NULL."""
    import hashlib
    import math

    from ulh_etl_spark.operators.text import (
        hashed_linear_score,
        hashed_model_weights,
    )

    K = 8
    w = hashed_model_weights(K)

    def py_score(text):
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return 0.5
        logit = sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % K]
            for t in toks
        ) / len(toks)
        return round(1.0 / (1.0 + math.exp(-logit)), 6)

    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "spark engine"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", hashed_linear_score(F.col("text"), w).alias("s")
        ).collect()
    }
    assert out[0] == py_score("the quick brown fox")
    assert out[1] == py_score("spark engine")
    assert out[2] == 0.5 and out[3] == 0.5


def test_passage_dedup_model(spark):
    """Hand-checkable passage dedup (2-token passages): doc 1 owns
    both its passages; doc 2 repeats doc 1's first passage ('a b') at
    idx 0 -> dropped, keeps its unique tail; doc 3 repeats its OWN
    first passage -> within-doc repeat also dropped; doc 4 is
    token-less -> survives with empty clean_text."""
    from ulh_etl_spark.operators.text import passage_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "p q p q"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_passages, r.n_dropped)
        for r in passage_dedup(df, "text", "doc_id", passage_tokens=2).collect()
    }
    assert out == {
        1: ("a b c d", 2, 0),
        2: ("x y", 2, 1),
        3: ("p q", 2, 1),
        4: ("", 1, 0),
    }


def test_boilerplate_passage_filter_model(spark):
    """Hand-checkable boilerplate removal (2-token passages,
    min_docs=2): 'a b' occurs in docs 1, 2 and 3 -> stripped from ALL
    three (contrast passage_dedup, which keeps the first); doc 3's
    within-doc repeat of its own unique passage ('p q' twice) is NOT
    boilerplate (docfreq counts DISTINCT docs = 1) and survives both
    times; token-less doc 4 survives with empty clean_text."""
    from ulh_etl_spark.operators.text import boilerplate_passage_filter

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "p q p q a b"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_passages, r.n_dropped)
        for r in boilerplate_passage_filter(
            df, "text", "doc_id", passage_tokens=2, min_docs=2
        ).collect()
    }
    assert out == {
        1: ("c d", 2, 1),
        2: ("x y", 2, 1),
        3: ("p q p q", 3, 1),
        4: ("", 1, 0),
    }


def test_boilerplate_passage_filter_rejects_bad_args(spark):
    import pytest as _pytest

    from ulh_etl_spark.operators.text import boilerplate_passage_filter

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        boilerplate_passage_filter(df, "text", "doc_id", passage_tokens=0)
    with _pytest.raises(ValueError):
        boilerplate_passage_filter(df, "text", "doc_id", min_docs=1)


def test_passage_dedup_skew_robust_parity(spark):
    """Adversarial skew corpus: ONE boilerplate passage opens every
    document (the whole-corpus hot window group). The skew_robust
    min-struct-groupBy path must return byte-identical output to the
    window path — including the model corpus's within-doc repeat and
    token-less edge cases."""
    from ulh_etl_spark.operators.text import passage_dedup

    rows = [(i, f"legal boilerplate unique{i} tail{i}") for i in range(200)]
    rows += [(1000, "p q p q"), (1001, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(**kw):
        return sorted(
            (r.doc_id, r.clean_text, r.n_passages, r.n_dropped)
            for r in passage_dedup(
                df, "text", "doc_id", passage_tokens=2, **kw
            ).collect()
        )

    window_out = run()
    robust_out = run(skew_robust=True)
    assert window_out == robust_out
    # the boilerplate passage survives exactly once, in the min doc
    by_id = {t[0]: t for t in robust_out}
    assert by_id[0][1] == "legal boilerplate unique0 tail0"
    assert by_id[5][1] == "unique5 tail5" and by_id[5][3] == 1
    assert by_id[1001] == (1001, "", 1, 0)


def test_dsir_importance_model(spark):
    """Exact parity with a pure-Python replica of the DSIR arithmetic
    (hashed buckets, add-1 smoothing, natural-log ratio), plus the
    semantic sanity check: a doc made of target-domain tokens scores
    above one made of off-domain tokens."""
    import hashlib
    import math

    from ulh_etl_spark.operators.text import dsir_importance

    B = 64
    rows = [
        (1, "alpha beta alpha gamma", True),
        (2, "delta epsilon zeta", False),
        (3, "alpha beta", False),       # target-like, not in target
        (4, "delta zeta delta", False),  # off-domain
        (5, "   ", False),               # token-less -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r.doc_id: r.log_importance
        for r in dsir_importance(
            df, "text", "doc_id", "is_t", n_buckets=B
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    t_n, r_n = {}, {}
    for _, text, is_t in rows:
        for tok in text.lower().split():
            b = bucket(tok)
            r_n[b] = r_n.get(b, 0) + 1
            if is_t:
                t_n[b] = t_n.get(b, 0) + 1
    t_tot, r_tot = sum(t_n.values()), sum(r_n.values())

    def lr(b):
        return math.log((t_n.get(b, 0) + 1.0) / (t_tot + B)) - math.log(
            (r_n.get(b, 0) + 1.0) / (r_tot + B)
        )

    for doc_id, text, _ in rows:
        toks = text.lower().split()
        want = round(sum(lr(bucket(t)) for t in toks), 6) if toks else None
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    assert got[3] > got[4]  # target-like beats off-domain


def test_gopher_rules_model(spark):
    """Each rule rejects its targeted pathology and passes clean prose
    (thresholds at defaults: >=10 words, mean word len 3-10, symbol
    ratio <=0.1, alpha fraction >=0.8, >=2 distinct stopwords)."""
    from ulh_etl_spark.operators.text import gopher_rules

    clean = (
        "the quick brown fox jumps over that lazy dog and keeps "
        "running with great speed toward the distant hills have fun"
    )
    rows = [
        (1, clean),
        (2, "too short to pass"),                          # word count
        (3, "a i o u e y b c d e f g h j k l m n o p q"),  # mean len < 3
        (4, clean + " " + "# # # # # # # # # # # # # # #"),  # symbols
        (5, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),     # alpha frac
        (6, "quick brown foxes jump over lazy dogs running fast "
            "toward distant hills tonight quietly"),        # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df, "text", "doc_id").collect()}
    assert out[1].keep
    assert not out[2].word_count_ok and not out[2].keep
    assert not out[3].mean_word_len_ok and not out[3].keep
    assert not out[4].symbol_ratio_ok and not out[4].keep
    assert not out[5].alpha_frac_ok and not out[5].keep
    assert not out[6].stopwords_ok and not out[6].keep


def test_group_quantile_calibrate_model(spark):
    """Hand-checkable per-group percent_rank: group A (4 values, one
    tie) and group B (single element -> calibrated 0.0). keep marks
    the top half of EACH group regardless of the groups' raw scales
    (B's lone 0.1 is kept even though it is globally the worst)."""
    import pytest as _pytest

    from ulh_etl_spark.operators.rank import group_quantile_calibrate

    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "A", 20.0),
            (3, "A", 20.0),
            (4, "A", 40.0),
            (5, "B", 0.1),
        ],
        "doc_id long, source string, quality double",
    )
    out = {
        r.doc_id: (r.calibrated, r.keep)
        for r in group_quantile_calibrate(
            df, "quality", "source", keep_frac=0.5
        ).collect()
    }
    # ties share rank; (rank-1)/(n-1) with n=4
    assert out[1] == (0.0, False)
    assert out[2] == out[3] == (round(1 / 3, 6), False)
    assert out[4] == (1.0, True)
    # single-element group: percent_rank 0, below the 0.5 cutoff
    assert out[5] == (0.0, False)

    with _pytest.raises(ValueError):
        group_quantile_calibrate(df, "quality", "source", keep_frac=0.0)


def test_bpe_merge_steps_model(spark):
    """Classic BPE walkthrough (low/lower/newest histogram): merge 0
    is the (l,o)/(o,w) 7-7 tie broken lexicographically, merge 1
    builds 'low', merge 2 picks (e,s) from the four-way 3-3 tie."""
    from ulh_etl_spark.operators.text import bpe_merge_steps

    docs = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [
        (r.step, r.merge_left, r.merge_right, r.pair_count)
        for r in bpe_merge_steps(df, "text", n_merges=5)
        .orderBy("step")
        .collect()
    ]
    assert out == [
        (0, "l", "o", 7),
        (1, "lo", "w", 7),
        (2, "e", "s", 3),
        (3, "e", "w", 3),
        (4, "es", "t", 3),
    ]


def test_bpe_merge_overlap_counting_and_greedy(spark):
    """Overlapping occurrences count toward the pair frequency
    ('aaa' has (a,a) twice) but merge greedily left-to-right
    ('aaa' -> [aa, a], so step 1 sees (aa, a))."""
    from ulh_etl_spark.operators.text import bpe_merge_steps

    df = spark.createDataFrame([(0, "aaa aaa b")], "doc_id long, text string")
    out = [
        (r.step, r.merge_left, r.merge_right, r.pair_count)
        for r in bpe_merge_steps(df, "text", n_merges=2)
        .orderBy("step")
        .collect()
    ]
    # one distinct word 'aaa' with cnt 2: (a,a) appears at 2 positions
    # -> pair_count 4; after the greedy merge 'aaa' -> [aa, a]
    assert out[0] == (0, "a", "a", 4)
    assert out[1] == (1, "aa", "a", 2)


def test_apply_bpe_model(spark):
    """apply_bpe with an explicit merge list: 'low' after merges
    (l,o),(lo,w) is ONE symbol; 'lower' is [low,e,r] = 3; token-less
    doc survives as (0, 0); a word the merges never touch keeps its
    character count."""
    from ulh_etl_spark.operators.text import apply_bpe

    docs = [
        (0, "low low lower"),
        (1, "xyz"),
        (2, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in apply_bpe(
            df, "text", "doc_id", [("l", "o"), ("lo", "w")]
        ).collect()
    }
    assert out == {
        0: (3, 1 + 1 + 3),  # low(1) + low(1) + lower(low,e,r)
        1: (1, 3),          # untouched word stays 3 chars
        2: (0, 0),
    }


def test_apply_bpe_accepts_merge_table_df(spark):
    """End-to-end: train on the corpus, tokenize with the trained
    table — BPE counts never exceed character counts and never fall
    below the whitespace token count."""
    from ulh_etl_spark.operators.text import apply_bpe, bpe_merge_steps

    docs = [(0, "low low low low low"), (1, "lower lower"), (2, "newest newest newest")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_merge_steps(df, "text", n_merges=3)
    out = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in apply_bpe(df, "text", "doc_id", merges).collect()
    }
    for did, text in docs:
        ws = len(text.split())
        chars = sum(len(w) for w in text.split())
        assert out[did][0] == ws
        assert ws <= out[did][1] <= chars
    # after (l,o),(lo,w),(e,s): 'low' is 1 symbol -> doc 0 = 5
    assert out[0] == (5, 5)


def test_kneser_ney_bigram_model(spark):
    """Exact pure-Python KN parity on a tiny corpus, including the
    continuation-count behavior: probabilities per history sum to 1,
    and a doc with < 2 tokens survives with NULL."""
    import math

    import pytest as _pytest

    from ulh_etl_spark.operators.text import kneser_ney_bigram_scores

    docs = [(0, "a b a b"), (1, "a c"), (2, "b"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.mean_kn_logprob
        for r in kneser_ney_bigram_scores(df, "text", "doc_id").collect()
    }

    # model: bigrams doc0: (a,b),(b,a),(a,b); doc1: (a,c)
    c12 = {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    c1 = {"a": 3, "b": 1}
    n1p_fw = {"a": 2, "b": 1}
    n1p_bw = {"b": 1, "a": 1, "c": 1}
    T = 3
    d = 0.75

    def p(w1, w2):
        return max(c12[(w1, w2)] - d, 0) / c1[w1] + (
            d * n1p_fw[w1] / c1[w1]
        ) * (n1p_bw[w2] / T)

    want0 = round(
        (math.log(p("a", "b")) * 2 + math.log(p("b", "a"))) / 3, 6
    )
    want1 = round(math.log(p("a", "c")), 6)
    assert abs(out[0] - want0) < 1e-6
    assert abs(out[1] - want1) < 1e-6
    assert out[2] is None and out[3] is None

    # per-history normalization: sum_w2 P(w2|a) == 1 over the model's
    # support plus the continuation mass of unseen (a, w2) pairs
    mass = sum(p("a", w2) for w2 in ("b", "c"))
    unseen = (d * n1p_fw["a"] / c1["a"]) * (n1p_bw["a"] / T)
    assert abs(mass + unseen - 1.0) < 1e-12

    with _pytest.raises(ValueError):
        kneser_ney_bigram_scores(df, "text", "doc_id", discount=1.5)


def test_blocklist_filter_leet_folding(spark):
    """Obfuscated terms fold to their canonical form before matching:
    'sp4m', '$pam', '5pam' all hit 'spam'; occurrences are counted
    (not just presence); clean docs keep=True with empty matched."""
    import pytest as _pytest

    from ulh_etl_spark.operators.text import blocklist_filter

    docs = [
        (0, "buy SP4M now spam $pam"),
        (1, "a perfectly normal sentence"),
        (2, "SLOW s10w but fine"),  # s10w -> slow (1->l, 0->o)
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_matches, r.matched, r.keep)
        for r in blocklist_filter(
            df, "text", "doc_id", ("spam", "slow")
        ).collect()
    }
    assert out[0] == (3, "spam", False)
    assert out[1] == (0, "", True)
    assert out[2] == (2, "slow", False)
    assert out[3] == (0, "", True)

    with _pytest.raises(ValueError):
        blocklist_filter(df, "text", "doc_id", ())


def test_zipf_slope_model(spark):
    """Exact least-squares parity on a tiny vocabulary with a known
    rank-frequency curve."""
    import math

    from ulh_etl_spark.operators.text import zipf_slope

    # freq: a=4, b=2, c=1 -> ranks 1, 2, 3
    df = spark.createDataFrame(
        [(0, "a a a a b b c")], "doc_id long, text string"
    )
    row = zipf_slope(df, "text").collect()[0]
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(n) for n in (4, 2, 1)]
    m = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    want = round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
    assert row.n_terms == 3
    assert abs(row.zipf_slope - want) < 1e-6


def test_contrastive_span_pairs_model(spark):
    """Spans are non-overlapping, deterministic, and short docs are
    skipped."""
    import pytest as _pytest

    from ulh_etl_spark.operators.text import contrastive_span_pairs

    long_doc = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(0, long_doc), (1, "too short")], "doc_id long, text string"
    )
    out = contrastive_span_pairs(
        df, "text", "doc_id", span_tokens=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 0
    assert r.span_a == "w0 w1 w2 w3"
    # offset within [span, nt - span] and span_b matches the slice
    assert 4 <= r.b_offset <= 16
    toks = long_doc.split()
    assert r.span_b == " ".join(toks[r.b_offset : r.b_offset + 4])
    # deterministic across invocations
    again = contrastive_span_pairs(
        df, "text", "doc_id", span_tokens=4
    ).collect()[0]
    assert (again.span_b, again.b_offset) == (r.span_b, r.b_offset)

    with _pytest.raises(ValueError):
        contrastive_span_pairs(df, "text", "doc_id", span_tokens=0)


def test_profile_columns_model(spark):
    import pytest as _pytest

    from ulh_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, 1.0), (2, "y", None)],
        "k long, s string, v double",
    )
    out = {
        r.column: (r.n_nonnull, r.n_distinct, r.min_value, r.max_value)
        for r in profile_columns(df, ["k", "s", "v"]).collect()
    }
    assert out["k"] == (3, 2, "1", "2")
    assert out["s"] == (2, 2, "x", "y")
    assert out["v"] == (2, 2, "1.0", "2.5")

    with _pytest.raises(ValueError):
        profile_columns(df, [])
    with _pytest.raises(ValueError):
        profile_columns(df, ["nope"])


def test_compression_ratio_exact_parity_and_ordering(spark):
    """Exact parity with direct zlib on every doc; repetitive text
    compresses below natural prose; empty doc -> NULL."""
    import zlib

    import pytest as _pytest

    from ulh_etl_spark.operators.text import compression_ratio

    docs = [
        (0, "spam " * 50),
        (1, "the quick brown fox jumps over the lazy dog entirely"),
        (2, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.compression_ratio
        for r in compression_ratio(df, "text", "doc_id").collect()
    }
    for did, text in docs:
        if not text:
            assert out[did] is None
            continue
        b = text.encode()
        assert out[did] == round(len(zlib.compress(b, 6)) / len(b), 6)
    assert out[0] < out[1]  # repetition compresses more

    with _pytest.raises(ValueError):
        compression_ratio(df, "text", "doc_id", level=11)


def test_needle_insert_model(spark):
    """Needle lands at floor(frac * n_tokens), reconstruction keeps
    every original token in order, token-less docs get the needle
    alone, and the placement is deterministic across calls."""
    from ulh_etl_spark.operators.text import needle_insert

    df = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))), (1, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in needle_insert(df, "text", "doc_id").collect()}
    r0 = out[0]
    toks = r0.text_with_needle.split()
    assert r0.n_tokens == 10
    assert len(toks) == 11
    assert toks[r0.needle_pos] == "XNEEDLEX"
    assert [t for t in toks if t != "XNEEDLEX"] == [f"w{i}" for i in range(10)]
    assert 0 <= r0.needle_pos <= 10
    assert abs(r0.depth_frac * 10 - r0.needle_pos) < 1 + 1e-9

    r1 = out[1]
    assert (r1.n_tokens, r1.needle_pos, r1.text_with_needle) == (0, 0, "XNEEDLEX")

    again = {r.doc_id: r.needle_pos for r in needle_insert(df, "text", "doc_id").collect()}
    assert again == {k: v.needle_pos for k, v in out.items()}


def test_duplicate_span_removal_model(spark):
    """Hand-checkable stride-1 span dedup (k=3): overlapping
    removable windows merge into one span; the earliest doc keeps its
    copy; within-doc self-repeats are NOT removed (cross-doc policy);
    sub-window docs pass through untouched."""
    from ulh_etl_spark.operators.text import duplicate_span_removal

    rows = [
        (1, "a b c d e f"),        # first occurrence: keeps all
        (2, "x a b c d y"),        # shares 'a b c','b c d' with doc 1
        (3, "p q r s p q r s"),    # self-repeat only: untouched
        (4, "a b c"),              # fully covered by doc 1's span
        (5, "z z"),                # shorter than the window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in duplicate_span_removal(
            df, "text", "doc_id", window_tokens=3
        ).collect()
    }
    assert out[1] == (6, 0, "a b c d e f")
    # windows at pos 1 ('a b c') and 2 ('b c d') merge into span
    # [1, 5): tokens x _ _ _ _ y -> 'x y'
    assert out[2] == (6, 4, "x y")
    assert out[3] == (8, 0, "p q r s p q r s")
    assert out[4] == (3, 3, "")
    assert out[5] == (2, 0, "z z")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicate_span_removal(df, "text", "doc_id", window_tokens=0)


def test_temperature_budget_mix_model(spark):
    """alpha=0.5 mixing: targets proportional to isqrt(source token
    mass) via integer DIV — a 100x bigger source gets only ~10x the
    budget (down-weighted vs raw proportion); admission is the greedy
    best-quality prefix under each derived target."""
    import math

    from ulh_etl_spark.operators.text import temperature_budget_mix

    # source A: 100 docs x 10 tokens = 1000; source B: 1 doc x 10
    rows = [(i, "tok " * 9 + "tok", "A") for i in range(100)]
    rows.append((1000, "tok " * 9 + "tok", "B"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = temperature_budget_mix(
        df, "text", "doc_id", "source", total_budget=120
    ).collect()
    targets = {r.source: r.target_tokens for r in out}
    isq_a, isq_b = math.isqrt(1000), math.isqrt(10)
    assert targets["A"] == 120 * isq_a // (isq_a + isq_b) == 109
    assert targets["B"] == 120 * isq_b // (isq_a + isq_b) == 10
    # raw proportion would give A 1000/1010 ~ 118.8 of 120; sqrt
    # temperature hands B ~3x its raw share
    by_src = {"A": [], "B": []}
    for r in out:
        by_src[r.source].append(r)
    # greedy prefix: tokens taken before each admitted doc < target
    assert all(r.taken_before < r.target_tokens for r in out)
    # A admits ceil-ish 108/10 -> 11 docs (last overshoots by <=1 doc)
    assert len(by_src["A"]) == 11 and len(by_src["B"]) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_budget_mix(df, "text", "doc_id", "source", 0)


def test_ansi_degenerate_input_guards(spark):
    """Default-ANSI divide-by-zero audit regressions (the
    rolling_zscore class): zipf_slope on a one-term vocabulary emits
    NULL instead of crashing; weighted_sample_key with weight 0
    yields a NULL key (never sampled); range_join and pack_sequences
    reject non-positive window/ctx_len at build time."""
    import pytest as _pytest

    from ulh_etl_spark.operators.temporal import range_join
    from ulh_etl_spark.operators.text import (
        pack_sequences,
        weighted_sample_key,
        zipf_slope,
    )
    from pyspark.sql import functions as F

    one_term = spark.createDataFrame(
        [(1, "hello hello hello"), (2, "hello")],
        "doc_id long, text string",
    )
    row = zipf_slope(one_term, "text").collect()[0]
    assert row.n_terms == 1 and row.zipf_slope is None

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0)], "id long, w double"
    )
    keys = {
        r.id: r.k
        for r in df.select(
            "id", weighted_sample_key(F.col("id"), F.col("w")).alias("k")
        ).collect()
    }
    assert keys[1] is not None and keys[2] is None
    # NULL key sorts last under the descending top-k: zero-weight
    # rows are never sampled
    top = df.select(
        "id", weighted_sample_key(F.col("id"), F.col("w")).alias("k")
    ).orderBy(F.col("k").desc()).limit(1).collect()
    assert top[0].id == 1

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10)], "k long, ts string, x long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "x")
    with _pytest.raises(ValueError):
        range_join(ev, ev, on="k", left_ts="ts", right_ts="ts",
                   window_seconds=0, left_cols=(), right_cols=())
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        pack_sequences(docs, "text", "doc_id", ctx_len=0)
    with _pytest.raises(ValueError):
        pack_sequences(docs, "text", "doc_id", ctx_len=8, n_shards=0)


def test_html_to_text_model(spark):
    """Extraction semantics: script/style ELEMENTS drop wholesale
    (their content must not leak as prose), comments and tags strip,
    entities unescape with &amp; LAST, whitespace collapses."""
    from ulh_etl_spark.operators.text import html_to_text

    cases = [
        # script content must vanish, not just its tags
        ("<p>a</p><script>var leak = 'SECRET';</script><p>b</p>", "a b"),
        ("<STYLE type='x'>p{color:red}</STYLE>hi", "hi"),
        ("<!-- hidden -->shown", "shown"),
        ("line<br/>break", "line break"),
        ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &nbsp;", "<tag> & \"q\" 's'"),
        # double-escaped: &amp;lt; is the TEXT "&lt;", not a tag
        ("&amp;lt;not-a-tag&amp;gt;", "&lt;not-a-tag&gt;"),
        ("  a \n\t b  ", "a b"),
        ("<script a=1>x</script >tail", "tail"),  # spaced close tag
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    from pyspark.sql import functions as F

    out = {
        r.i: r.t
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert out[i] == want, (h, out[i], want)


def test_render_sft_pairs_model(spark):
    """The rendered template's response substring (sliced by the
    emitted offsets) must be EXACTLY the response tokens — the
    offsets are the loss mask, an off-by-one silently trains on
    template or prompt chars. Short docs yield nothing."""
    import pytest as _pytest

    from ulh_etl_spark.operators.text import render_sft_pairs

    rows = [
        (1, "a b c d e"),   # prompt 2 -> 'a b', response 'c d e'
        (2, "x  y"),        # 2 tokens: prompt 2, NO response -> drop
        (3, "only"),        # 1 token -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in render_sft_pairs(df, "text", "doc_id", prompt_tokens=2)
        .collect()
    }
    assert set(out) == {1}
    r = out[1]
    assert r.rendered == "<|user|>a b<|assistant|>c d e<|end|>"
    assert r.rendered[r.resp_char_start : r.resp_char_end] == "c d e"
    assert (r.n_prompt_tokens, r.n_response_tokens) == (2, 3)

    with _pytest.raises(ValueError):
        render_sft_pairs(df, "text", "doc_id", prompt_tokens=0)


def test_whitespace_class_parity_with_oracle_on_vertical_tab(spark):
    """Java \\s includes \\x0B; RE2 (DuckDB) \\s does not — so the
    shared patterns spell the class out explicitly (operators.text
    .WS_CLASS) and this fixture pins engine/oracle token parity on a
    document that actually CONTAINS a vertical tab (plus every other
    class member). Regression for ADVICE r8 item 5."""
    import duckdb

    from ulh_etl_spark.operators.text import (
        bpe_ish_token_count,
        html_to_text,
        whitespace_tokens,
    )
    from ulh_etl_spark.queries import _oracle_fragments as O

    nasty = "a\x0Bb\tc\nd\fe\rf  g.h\x0B\x0Bend"
    html = "<p>x\x0By</p><script >var z\x0B=1;</script\x0B>tail"
    df = spark.createDataFrame([(nasty, html)], "t string, h string")
    got = df.select(
        whitespace_tokens(F.col("t")).alias("tok"),
        bpe_ish_token_count(F.col("t")).alias("bpe"),
        html_to_text(F.col("h")).alias("txt"),
    ).collect()[0]

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT {O.ws_tokens('?')} AS tok,
               len(regexp_extract_all(?,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]'))
                   AS bpe,
               {O.html_to_text('?')} AS txt
        """,
        [nasty, nasty, html],
    ).fetchone()
    # engine splits a\x0Bb into separate tokens; oracle must agree
    assert got.tok == want[0]
    assert "a" in got.tok and "b" in got.tok  # \x0B really split
    assert got.bpe == want[1]
    assert got.txt == want[2]
    assert "var" not in got.txt  # </script\x0B> closed the element


def test_lang_id_ngram_beats_marker_toy(spark):
    """The hashed char-trigram NB profile classifier must correctly
    label French/German/Spanish prose containing NO marker words —
    exactly the inputs the q32 marker toy calls 'unknown' — plus
    English with technical vocabulary, and keep whitespace-only text
    'unknown'. (r9 verdict item 5.)"""
    from ulh_etl_spark.operators.text import lang_id, lang_id_ngram

    fixtures = [
        # marker-free prose the toy cannot classify
        ("heute morgen gehen wir zusammen einkaufen und danach kochen", "de"),
        ("buenos dias amigos como estan ustedes hoy", "es"),
        ("je ne sais pas pourquoi tu pars si tot ce soir", "fr"),
        ("nous allons voir un film ce soir avec nos amis", "fr"),
        ("das kind spielt im garten mit dem hund", "de"),
        ("el perro corre por el parque todos los dias", "es"),
        ("die besprechung wurde wegen des regens abgesagt", "de"),
        ("la reunion de manana fue cancelada por la lluvia", "es"),
        ("la reunion de demain a ete annulee a cause de la pluie", "fr"),
        # english, incl. domain vocabulary absent from the markers
        ("the cat sat on the mat and watched the rain", "en"),
        ("machine learning pipelines process large datasets", "en"),
        ("we should review the quarterly report before friday", "en"),
        # degenerate
        ("   ", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(fixtures)], "i long, t string"
    )
    out = {
        r.i: (r.ng, r.toy)
        for r in df.select(
            "i",
            lang_id_ngram(F.col("t")).alias("ng"),
            lang_id(F.col("t")).alias("toy"),
        ).collect()
    }
    marker_misses = 0
    for i, (text, want) in enumerate(fixtures):
        got_ng, got_toy = out[i]
        assert got_ng == want, (text, want, got_ng)
        marker_misses += got_toy != want
    # the upgrade must actually matter: the toy mislabels a majority
    # of the marker-free fixtures this test exists for
    assert marker_misses >= 5


def test_sq8_encode_model(spark):
    """Hand-checkable SQ8: per-dim corpus bounds, floor-quantized
    codes, midpoint-decode reconstruction error; a FLAT dimension
    (min == max) encodes 0 and contributes zero error."""
    from ulh_etl_spark.operators.similarity import sq8_bounds, sq8_encode

    rows = [
        (1, [0.0, 10.0, 7.5]),
        (2, [1.0, 20.0, 7.5]),
        (3, [2.0, 30.0, 7.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mns, mxs = sq8_bounds(df)
    assert mns == [0.0, 10.0, 7.5] and mxs == [2.0, 30.0, 7.5]
    out = {
        r.vec_id: (list(r.codes), r.recon_err)
        for r in sq8_encode(df, (mns, mxs)).collect()
    }
    # dim1 span [0,2]: 0 -> 0, 1 -> floor(127.5) = 127, 2 -> 255
    # dim2 span [10,30]: same code ladder; dim3 flat -> always 0
    assert [c for c, _ in out.values()] == [
        [0, 0, 0], [127, 127, 0], [255, 255, 0]
    ]

    def err(v, mn, mx, code):
        return (v - (mn + (code + 0.5) * (mx - mn) / 255.0)) ** 2

    import math

    for vid, vec in ((1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1])):
        codes, got = out[vid]
        want = sum(
            err(v, mn, mx, c)
            for v, mn, mx, c in zip(vec, mns, mxs, codes)
            if mx > mn
        )
        assert math.isclose(got, want, rel_tol=1e-12), (vid, got, want)
    # flat dim contributed nothing; each live dim's error is bounded
    # by half a quantization cell squared: (span / 510)^2 — vec 1
    # sits exactly at both dims' minima, so it ACHIEVES the bound
    assert out[1][1] <= (2 / 510.0) ** 2 + (20 / 510.0) ** 2 + 1e-12


def test_vocab_coverage_model(spark):
    """Deterministic top-K vocabulary (count desc, token asc) and
    per-doc OOV tally; token-less docs pass through with zero
    counts; the count-tie at the K boundary resolves lexically."""
    from ulh_etl_spark.operators.text import vocab_coverage

    docs = [
        (1, "aa aa bb zz"),   # zz ties with bb? counts: aa3 bb2 cc2 zz1
        (2, "aa bb cc"),
        (3, "cc AA"),          # lowercased -> aa
        (4, "   "),            # token-less
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # counts: aa=4, bb=2, cc=2, zz=1; K=2 -> {aa, bb} (bb < cc tie)
    out = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in vocab_coverage(df, "text", "doc_id", vocab_size=2).collect()
    }
    assert out[1] == (4, 1, 0.25)       # zz OOV
    assert out[2] == (3, 1, round(1 / 3, 6))  # cc OOV
    assert out[3] == (2, 1, 0.5)        # cc OOV, AA covered
    assert out[4] == (0, 0, 0.0)        # token-less passthrough


def test_rrf_fuse_model(spark):
    """RRF arithmetic on hand-built legs: overlapping items sum both
    reciprocal ranks, single-leg items contribute one term, ranking
    orders by rounded score then item id, topk truncates."""
    from ulh_etl_spark.operators.similarity import rrf_fuse

    dense = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, item_id long, rank int",
    )
    lex = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, item_id long, rank int",
    )
    out = {
        r.item_id: (r.rrf_score, r.rank)
        for r in rrf_fuse([dense, lex], k_const=60, topk=3).collect()
    }
    # item 11: both legs 1/62 + 1/61; item 10: dense only 1/61;
    # item 13: lex only 1/62; item 12 (1/63) falls off at topk=3
    assert out[11] == (round(1 / 62 + 1 / 61, 6), 1)
    assert out[10] == (round(1 / 61, 6), 2)
    assert out[13] == (round(1 / 62, 6), 3)
    assert 12 not in out


def test_token_overlap_topk_model(spark):
    """Deterministic lexical leg: overlap counts distinct shared
    lowercase tokens, self excluded, desc/id tiebreak."""
    from ulh_etl_spark.operators.similarity import token_overlap_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta delta"),
            (2, "ALPHA beta gamma extra"),
            (3, "omega psi"),
        ],
        "doc_id long, text string",
    )
    q = docs.filter("doc_id = 0")
    out = {
        r.item_id: (r.overlap, r.rank)
        for r in token_overlap_topk(docs, q, k=3).collect()
    }
    assert out[2] == (3, 1)   # case-folded full overlap
    assert out[1] == (2, 2)
    assert out[3] == (0, 3)   # zero overlap still ranked (k=3)


def test_rerank_topk_model(spark):
    """Two-stage rerank against the python scorer model: scores are
    the portable md5 uniform over (q_text, d_text), top-k truncates
    with rounded-score-desc/id tiebreak, and candidates missing from
    the corpus text relation drop (inner join semantics)."""
    from ulh_etl_spark.operators.similarity import (
        portable_cross_scorer,
        rerank_topk,
    )

    texts = spark.createDataFrame(
        [(i, f"document body number {i}") for i in range(6)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (0, 99)],  # 99: no text row
        "query_id long, item_id long",
    )
    got = [
        (r.item_id, r.score, r.rank)
        for r in rerank_topk(cand, texts, portable_cross_scorer, k=3)
        .orderBy("rank")
        .collect()
    ]
    q = "document body number 0"
    model = sorted(
        (
            (
                round(portable_cross_scorer(q, f"document body number {i}"), 6),
                i,
            )
            for i in (1, 2, 3, 4)
        ),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert got == [(i, s, r + 1) for r, (s, i) in enumerate(model)]
    assert all(i != 99 for i, _, _ in got)


def test_unimax_allocation_model(spark):
    """Waterfilling: small sources capped at their own mass, the rest
    split the remaining budget evenly via integer DIV; a budget over
    the cap sum caps everyone at exactly 1.0 epochs."""
    from ulh_etl_spark.operators.text import unimax_allocation

    rows = [(0, "t " * 9 + "t", "A")]                       # A: 10 tokens
    rows += [(10 + i, "t " * 9 + "t", "B") for i in range(10)]  # B: 100
    rows += [(30 + i, "t " * 9 + "t", "C") for i in range(10)]  # C: 100
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # budget = 210 * 19 DIV 20 = 199; fair share 66 -> A (10) capped,
    # B and C split (199 - 10) DIV 2 = 94
    out = {
        r.source: r
        for r in unimax_allocation(df, "text", "source").collect()
    }
    assert out["A"].alloc_tokens == 10 and out["A"].epochs == 1.0
    assert out["B"].alloc_tokens == 94 and out["C"].alloc_tokens == 94
    assert out["B"].cap_tokens == 100
    # budget >= cap sum -> everyone capped, exactly 1 epoch each
    full = {
        r.source: r
        for r in unimax_allocation(
            df, "text", "source", budget_num=2, budget_den=1
        ).collect()
    }
    assert all(full[s].alloc_tokens == full[s].cap_tokens for s in "ABC")
    assert all(full[s].epochs == 1.0 for s in "ABC")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        unimax_allocation(df, "text", "source", budget_num=0)


def test_dirichlet_qlm_model(spark):
    """Scores match the closed form ln((tf + mu*ctf/|C|)/(dl + mu))
    summed over query terms — including the token-less doc, which
    still gets the finite all-smoothing score."""
    import math

    from ulh_etl_spark.operators.text import dirichlet_qlm_scores

    docs = [(0, "cat dog cat"), (1, "dog fish"), (2, ""), (3, "dog dog dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mu = 2000.0
    out = {
        r.doc_id: r.qlm_score
        for r in dirichlet_qlm_scores(
            df, "text", "doc_id", ("cat", "fish"), mu=mu
        ).collect()
    }
    ctot = 8  # cat dog cat | dog fish | dog dog dog
    ctf = {"cat": 2, "fish": 1}
    tfs = {
        0: {"cat": 2, "fish": 0},
        1: {"cat": 0, "fish": 1},
        2: {},
        3: {},
    }
    dls = {0: 3, 1: 2, 2: 0, 3: 3}
    for d in (0, 1, 2, 3):
        want = sum(
            math.log(
                (tfs[d].get(t, 0) + mu * (ctf[t] / ctot)) / (dls[d] + mu)
            )
            for t in ("cat", "fish")
        )
        # 1e-6 tolerance, not round(want, 6) equality: Spark rounds
        # HALF_UP, Python banker's — a .xxxxxx5 boundary would differ
        assert abs(out[d] - want) < 1e-6
    # at equal length, query-term hits win (doc 0 vs the same-length
    # no-hit doc 3); and smoothing gives even hit-less docs a finite
    # score, so the ranking is total
    assert out[0] > out[3]
    assert all(v == v and v != float("-inf") for v in out.values())


def test_pmi_bigrams_hand_counts(spark):
    from math import log

    from ulh_etl_spark.operators.text import pmi_bigrams

    # "a b" appears 3x, "b c" 1x; unigrams a=3 b=3 c=1 x=1; N_uni=8,
    # N_bi=5 (doc1 emits 3 adjacent pairs, doc2 emits 2)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],  # 1-token doc guarded
        "doc_id long, text string",
    )
    # doc1 bigrams: (a,b),(b,a),(a,b); doc2: (a,b),(b,c); doc3: none
    got = {
        (r.w1, r.w2): (r.n_pair, r.pmi)
        for r in pmi_bigrams(docs, "text", min_count=2).collect()
    }
    n_uni, n_bi = 8.0, 5.0
    c = {"a": 3, "b": 3, "c": 1, "x": 1}
    want = round(log((3 * n_uni * n_uni) / (n_bi * c["a"] * c["b"])), 6)
    assert got == {("a", "b"): (3, want)}


def test_sparse_lexical_topk_finds_the_similar_pair(spark):
    from ulh_etl_spark.operators.text import sparse_lexical_topk

    docs = spark.createDataFrame(
        [
            (1, "quantum flux capacitor energy"),
            (2, "quantum flux capacitor power"),
            (3, "banana smoothie recipe"),
            (4, "banana smoothie manual"),
            (5, "the the the the"),
        ],
        "doc_id long, text string",
    )
    out = sparse_lexical_topk(
        docs, "text", "doc_id", df_min=2, df_max=4, k=2
    ).collect()
    top = {r.doc_id: r.neighbor_id for r in out if r.rank == 1}
    # rare shared terms pair 1<->2 and 3<->4; doc 5 shares nothing
    assert top[1] == 2 and top[2] == 1
    assert top[3] == 4 and top[4] == 3
    assert 5 not in top
    by_pair = {(r.doc_id, r.neighbor_id): r for r in out}
    r12 = by_pair[(1, 2)]
    assert r12.n_shared == 3  # quantum, flux, capacitor
    assert 0.0 < r12.cosine < 1.0
    # symmetric scores
    assert by_pair[(2, 1)].cosine == r12.cosine


def test_sparse_lexical_topk_identical_docs_score_one(spark):
    from ulh_etl_spark.operators.text import sparse_lexical_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta x")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.neighbor_id): r.cosine
        for r in sparse_lexical_topk(
            docs, "text", "doc_id", df_min=2, df_max=3, k=1
        ).collect()
    }
    assert out[(1, 2)] == 1.0 and out[(2, 1)] == 1.0


def _ref_unigram(texts, vocab_size, rounds, W=12, L=4):
    """Pure-Python replica of operators.text.unigram_lm_train."""
    import math
    from collections import Counter

    hist = Counter()
    for t in texts:
        for w in t.lower().split():
            hist[w] += 1
    words = {w: (c, w[:W], min(len(w), W)) for w, (c) in hist.items()}

    def spans(wt, n):
        for e in range(1, n + 1):
            for s in range(max(0, e - L), e):
                yield s, e, wt[s:e]

    c0 = Counter()
    for w, (c, wt, n) in words.items():
        for s, e, p in spans(wt, n):
            c0[p] += c
    chars = {p for p in c0 if len(p) == 1}
    multi = sorted(
        (p for p in c0 if len(p) >= 2), key=lambda p: (-c0[p], p)
    )[:vocab_size]
    vocab = {p: c0[p] for p in chars | set(multi)}

    def laplace(v):
        t, n = sum(v.values()), len(v)
        return {p: math.log((c + 1) / (t + n)) for p, c in v.items()}

    logp = laplace(vocab)

    def viterbi(wt, n, lp):
        best = [0.0] + [None] * n
        back = [None] * (n + 1)
        for e in range(1, n + 1):
            for s in range(max(0, e - L), e):
                p = wt[s:e]
                if p in lp and best[s] is not None:
                    cand = best[s] + lp[p]
                    if best[e] is None or cand > best[e]:
                        best[e], back[e] = cand, s
        pieces, pos = [], n
        while pos > 0:
            s = back[pos]
            pieces.append(wt[s:pos])
            pos = s
        return pieces

    counts = None
    for _ in range(rounds - 1):
        counts = Counter()
        for w, (c, wt, n) in words.items():
            for p in viterbi(wt, n, logp):
                counts[p] += c
        vocab = {p: counts.get(p, 0) for p in set(counts) | chars}
        logp = laplace(vocab)
    final = Counter()
    per_word = {}
    for w, (c, wt, n) in words.items():
        ps = viterbi(wt, n, logp)
        per_word[w] = len(ps)
        for p in ps:
            final[p] += c
    return (
        {
            p: (len(p), final.get(p, 0), round(lp, 6))
            for p, lp in logp.items()
        },
        per_word,
    )


def test_unigram_lm_train_matches_reference_model(spark):
    """unigram_lm_train == a pure-Python hard-EM unigram trainer on a
    small corpus (same seed, same Viterbi tie-breaks, same Laplace),
    including a word whose best split needs the DP (not greedy)."""
    from ulh_etl_spark.operators.text import unigram_lm_train

    texts = [
        "abab abab abab cd cd ababcd",
        "abc abc ab ab ab cd",
        "xy xy xyz zzz abab",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r.piece: (r.piece_len, r.viterbi_count, r.logp)
        for r in unigram_lm_train(
            df, "text", vocab_size=8, rounds=2
        ).collect()
    }
    want, _ = _ref_unigram(texts, vocab_size=8, rounds=2)
    assert got == want


def test_unigram_fertility_matches_reference_model(spark):
    from ulh_etl_spark.operators.text import unigram_fertility

    texts = ["abab cd abab", "xy zzz ababcd", "abc ab cd cd"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_unigram_tokens)
        for r in unigram_fertility(
            df, "text", "doc_id", vocab_size=8, rounds=2
        ).collect()
    }
    _, per_word = _ref_unigram(texts, vocab_size=8, rounds=2)
    want = {}
    for i, t in enumerate(texts):
        ws = t.lower().split()
        want[i] = (len(ws), sum(per_word[w] for w in ws))
    assert got == want
    # every word is segmentable: piece counts at least 1 per word
    assert all(uni >= ws for ws, uni in got.values())


def test_char_entropy_known_distributions(spark):
    """Uniform alphabet -> log2(|alphabet|); constant char -> 0;
    empty doc -> NULL; general case matches the closed form."""
    import math

    from ulh_etl_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "abcdabcdabcd"),   # uniform over 4 chars -> 2.0
            (2, "aaaaaa"),          # constant -> 0.0
            (3, ""),                # empty -> NULL
            (4, "aab"),             # 2/3, 1/3
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_chars_counted, r.entropy_bits)
        for r in char_entropy(df, "text", "doc_id").collect()
    }
    assert out[1] == (12, 2.0)
    assert out[2] == (6, 0.0)
    assert out[3] == (None, None)
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert out[4][0] == 3 and abs(out[4][1] - h) < 1e-6


def test_char_entropy_counts_code_points_not_utf16_units(spark):
    """r11 ADVICE pin: Spark's split(col, "") yields CODE POINTS on
    this engine — a non-BMP char (emoji, outside the BMP, 2 UTF-16
    units) counts as ONE character, matching DuckDB's
    string_split(text, ''). Under surrogate-half splitting this doc
    would report n=4 and a different entropy."""
    import math

    from ulh_etl_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "a\U0001F600b")], "doc_id long, text string"
    )
    out = char_entropy(df, "text", "doc_id").collect()[0]
    assert out.n_chars_counted == 3
    assert abs(out.entropy_bits - math.log2(3)) < 1e-6


def test_length_bucket_batches_shape(spark):
    """Buckets are monotone in token count, every batch holds at most
    batch_size docs, batch ids are dense from 0 per bucket."""
    from ulh_etl_spark.operators.text import length_bucket_batches

    rows = [(i, "w " * ((i % 40) + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = length_bucket_batches(
        df, "text", "doc_id", probs=(0.5,), sketch_k=500, batch_size=16
    ).collect()
    assert len(out) == 200
    assert {r.bucket for r in out} <= {0, 1}
    max_b0 = max(r.n_tokens for r in out if r.bucket == 0)
    min_b1 = min(r.n_tokens for r in out if r.bucket == 1)
    assert max_b0 <= min_b1  # monotone buckets
    from collections import Counter

    sizes = Counter((r.bucket, r.batch_id) for r in out)
    assert all(v <= 16 for v in sizes.values())
    for b in {r.bucket for r in out}:
        ids = sorted(bid for (bb, bid) in sizes if bb == b)
        assert ids == list(range(len(ids)))  # dense from 0


def test_novelty_scores_hand_counts(spark):
    """r16 restructure pin: n_novel(d) must equal the number of
    grams whose FIRST (min-id) occurrence is d, n_grams the doc's
    distinct-gram count; a doc that repeats only earlier docs' grams
    scores 0, a short text grams as its whole prefix (the
    char_ngrams contract), and a NULL text emits NO row."""
    from ulh_etl_spark.operators.text import novelty_scores

    rows = [
        (1, "abcd"),   # grams ab,bc,cd — all first here
        (2, "bcde"),   # bc(seen),cd(seen),de(new) -> 1/3
        (3, "abcd"),   # all seen -> 0/3
        (4, "x"),      # short text -> whole-prefix gram "x", novel
        (5, None),     # no grams -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in novelty_scores(df, "text", "doc_id", n=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (3, 3, 1.0)
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (3, 0, 0.0)
    assert out[4] == (1, 1, 1.0)
