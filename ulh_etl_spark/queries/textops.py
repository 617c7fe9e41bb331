"""Text-analysis catalog queries over the ``documents`` table
(engine additions per BASELINE.json: language-ID, quality scoring,
token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.operators import text as T
from ulh_etl_spark.operators.fanout import fan_out as _fan_out
from ulh_etl_spark.queries import _oracle_fragments as O
from ulh_etl_spark.session import load_table


def q30_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting. Narrow map stage; the
    regexp work is JVM-side codegen — no Python row path."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite length/stopword/punctuation quality heuristic
    (closed-form expression — measured faster than a staged
    token-array projection; see text.with_quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.with_quality_score(docs, "text").select("doc_id", "quality")


def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID + per-language scores."""
    docs = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("predicted_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in ("en", "es", "de", "fr")],
    )


def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 fingerprint per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
    )


def q57_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF per (doc, term). The vocabulary join is left
    to AQE (broadcasts here; stays a shuffle join when the vocab
    outgrows the threshold at corpus scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf(docs, "text", "doc_id")


# Fixed BM25 query bag: two common terms + one rare term ('dup',
# df ~5% of docs) so the idf spread actually exercises the formula.
BM25_QUERY = ("hash", "join", "dup")


def q58_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against BM25_QUERY; docs with
    no query-term hits score 0 (left join + coalesce)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_scores(docs, "text", "doc_id", BM25_QUERY)


STRATA_PCT = 20


def q65_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum 20% sample: salted md5 of
    (lang, doc_id) mod 100 — every stratum is sampled at the same
    rate regardless of its size, reproducibly, with no RNG and no
    extra pass to size strata (contrast sampleBy, which needs
    per-key fractions collected up front)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        T.md5_hash32(
            F.concat(
                F.lit("sample_"),
                F.col("lang"),
                F.lit("_"),
                F.col("doc_id").cast("string"),
            )
        )
        % 100
    )
    return docs.filter(bucket < STRATA_PCT).select("doc_id", "lang")


TOPK_PER_LANG = 3


def q66_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-3 documents by quality score (argmax-per-group
    pattern: rank window with a deterministic doc_id tiebreak). One
    shuffle on the group key."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = T.with_quality_score(docs, "text")
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK_PER_LANG)
        .select("lang", F.col("rnk").cast("int").alias("rnk"), "doc_id", "quality")
    )


def q63_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by salted
    md5 of the key — stable across runs and engines, no RNG, pure
    narrow map (the scalable replacement for randomSplit)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.hash_split(F.col("doc_id")).alias("split")
    )


def q64_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (k=5, window=4): the standard
    overlap-detection sketch; shared substrings >= 8 chars guarantee a
    shared fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return T.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4)


WSAMPLE_K = 100


def q82_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sample (Efraimidis-Spirakis top-k by
    u^(1/w), deterministic md5 uniforms): higher-quality docs are
    proportionally likelier to be kept. Plan: one scan +
    TakeOrderedAndProject — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    key = T.weighted_sample_key(
        F.col("doc_id"), T.quality_score(F.col("text"))
    )
    return (
        docs.select("doc_id", F.round(key, 6).alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col("doc_id"))
        .limit(WSAMPLE_K)
    )


def q78_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: per-doc mean ln p(token) under
    the corpus unigram distribution (rare-token soup scores low)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob_scores(docs, "text", "doc_id")


# Deterministic stand-in benchmark set for decontamination: every
# 97th doc. Real use: the held-out eval suites.
DECON_MOD = 97
DECON_N = 8
DECON_MIN_SHARED = 3


def q79_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 3 distinct
    8-gram hashes with the benchmark set (broadcast bench grams,
    narrow corpus explode — the shape real decontamination runs at)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    return T.contamination_counts(
        corpus, bench, "text", "doc_id",
        n=DECON_N, min_shared=DECON_MIN_SHARED,
    )


LEAK_MAX_FP_DOCS = 20


def q122_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: document pairs in DIFFERENT splits
    sharing a winnowing fingerprint (q63's splits x q64's
    fingerprints) — the QA gate that catches eval answers hiding in
    the training set even after dedup.

    Ubiquitous fingerprints (docfreq > LEAK_MAX_FP_DOCS) are DROPPED
    before pairing: a fingerprint in thousands of docs is corpus
    boilerplate, not contamination evidence, and it is also the
    quadratic scale hazard — measured on this corpus at sf0.1 the
    uncapped self-join is ~590M pair rows (hottest fingerprint in
    3,891 of 5,000 docs) vs ~12K capped; real leakage audits apply
    the same rare-fingerprint restriction for the same two reasons.
    Remaining skew is a join key (AQE skew-split); output is the
    per-split-pair count of distinct leaky doc pairs."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.81 s -> 0.70 s; no-op at real scale).
    docs = _fan_out(docs)
    splits = docs.select(
        "doc_id", T.hash_split(F.col("doc_id")).alias("split")
    )
    all_fps = T.winnow_fingerprints(
        docs, "text", "doc_id", k=5, window=4
    ).select("doc_id", "fp_hash")
    rare = (
        all_fps.groupBy("fp_hash")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= LEAK_MAX_FP_DOCS)
        .select("fp_hash")
    )
    fps = all_fps.join(rare, "fp_hash").join(splits, "doc_id")
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.split") != F.col("b.split")),
        )
        .select(
            F.least("a.split", "b.split").alias("split_1"),
            F.greatest("a.split", "b.split").alias("split_2"),
            F.col("a.doc_id").alias("_d1"),
            F.col("b.doc_id").alias("_d2"),
        )
        .distinct()
    )
    return pairs.groupBy("split_1", "split_2").agg(
        F.count("*").alias("n_leaky_pairs")
    )


SFT_PROMPT_TOKENS = 16


def q149_sft_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-data formatting: every long-enough doc becomes a
    rendered ``<|user|>prompt<|assistant|>response<|end|>`` training
    row with the response's character span attached — the loss-mask
    offsets the tokenizer stage consumes without re-parsing the
    template (operators.text.render_sft_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.render_sft_pairs(
        docs, "text", "doc_id", prompt_tokens=SFT_PROMPT_TOKENS
    )


_LANG_K = 512
_LANG_N = 3
_LANG_W = T.lang_ngram_weights(n=_LANG_N, n_buckets=_LANG_K)


def q150_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by hashed char-trigram naive-Bayes profiles — the
    production-shaped upgrade of q32's marker-word toy (which only
    sees exact stopword hits and calls everything else 'unknown'):
    per language, the doc's mean trigram log-likelihood under a
    plan-constant hashed profile (operators.text.lang_ngram_weights),
    argmax with the fixed en > es > de > fr tie-break. Pure JVM
    expression — one char_ngrams pass, four element_at folds, no
    UDF/join/shuffle; the weight arrays ride the plan exactly like
    q84's hashed linear model."""
    from ulh_etl_spark.operators.fanout import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # The md5-per-gram scoring is the whole query and the plan has no
    # exchange — a 1-split scan would run it on one core (r17
    # measured 1.80 s -> 0.60 s). Conditional fan-out; no-op at scale.
    docs = fan_out(docs)
    # three projections: bucket the grams ONCE (the md5 pass is ~all
    # the per-gram cost), fold each language's plan-constant weight
    # array over the shared bucket column, then argmax over the
    # score COLUMNS — nothing is hashed or scored twice
    bucketed = docs.select(
        "doc_id",
        "text",
        T.lang_gram_buckets(F.col("text"), _LANG_N, _LANG_K).alias("_b"),
    )
    scored = bucketed.select(
        "doc_id",
        "text",
        *[
            T.lang_score_from_buckets(F.col("_b"), _LANG_W[lang]).alias(
                f"score_{lang}"
            )
            for lang in ("en", "es", "de", "fr")
        ],
    )
    scores = {
        lang: F.col(f"score_{lang}") for lang in ("en", "es", "de", "fr")
    }
    return scored.select(
        "doc_id",
        T.lang_pred_from_scores(scores, F.col("text")).alias(
            "predicted_lang"
        ),
        "score_en",
        "score_es",
        "score_de",
        "score_fr",
    )


def q156_lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-model agreement audit: the confusion matrix of the
    documents table's declared ``lang`` column against q150's hashed
    char-trigram classifier — the check run before TRUSTING either
    side for per-language curation (q114/q140 slice by language; a
    systematic disagreement cell means one of the two is wrong for
    that slice). One narrow classification pass + one two-key
    count groupBy; output is |langs|^2-bounded."""
    from ulh_etl_spark.operators.fanout import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Same under-parallel guard as q150 — the scoring pass sits
    # before the first exchange.
    docs = fan_out(docs)
    bucketed = docs.select(
        "lang",
        T.lang_gram_buckets(F.col("text"), _LANG_N, _LANG_K).alias("_b"),
        "text",
    )
    scored = bucketed.select(
        "lang",
        "text",
        *[
            T.lang_score_from_buckets(F.col("_b"), _LANG_W[lang]).alias(
                f"score_{lang}"
            )
            for lang in ("en", "es", "de", "fr")
        ],
    )
    scores = {
        lang: F.col(f"score_{lang}") for lang in ("en", "es", "de", "fr")
    }
    return (
        scored.select(
            "lang",
            T.lang_pred_from_scores(scores, F.col("text")).alias(
                "predicted_lang"
            ),
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


_VOCAB_SIZE = 256


def q152_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit audit: per document, how much of it the corpus's
    own top-256 token vocabulary covers (n_tokens, n_oov, oov_rate) —
    the measurement run before committing a vocab, because a source
    with rising OOV shreds into unknowns and its effective sequence
    length explodes (operators.text.vocab_coverage; deterministic
    count-desc/token-asc vocabulary, so the oracle derives the
    identical set)."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.66 s -> 0.53 s; no-op at real scale).
    docs = _fan_out(docs)
    return T.vocab_coverage(docs, "text", "doc_id", _VOCAB_SIZE)


def q148_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl text extraction: each doc is wrapped in a
    deterministic HTML page (title from its source, a per-doc script
    block, style, comments, entity-bearing footer — the q147
    synthesize-then-process pattern) and ``html_to_text`` recovers
    the prose: script/style ELEMENTS dropped wholesale, tags
    stripped, entities unescaped, whitespace collapsed. Pure
    regex narrow map — the scan-shaped extraction pass every raw
    crawl runs before any text operator."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit('</title><script type="text/javascript">var id = '),
        did,
        F.lit(";</script><style>p { margin: 0; }</style></head>"),
        F.lit("<body><!-- doc "),
        did,
        F.lit(" --><p>"),
        F.col("text"),
        F.lit("</p><div>&amp; &lt;footer&gt;</div></body></html>"),
    )
    extracted = T.html_to_text(html)
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.length(extracted).cast("long").alias("n_chars_extracted"),
    )


NOVELTY_GRAM_N = 8


def q144_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty attribution: per doc, the fraction of its
    distinct 8-grams whose globally FIRST occurrence (ascending
    doc_id = ingest order) is that doc — the diversity-decay metric
    that tells a crawl when marginal documents stop adding content
    (operators.text.novelty_scores)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.novelty_scores(docs, "text", "doc_id", n=NOVELTY_GRAM_N)


TEMP_MIX_BUDGET = 5000


def q143_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source mixing: each source's
    share of a 5000-token budget is proportional to sqrt(its token
    mass) — big sources down-weighted, small sources up-weighted (the
    standard multilingual rebalancing trick) — then best-quality-
    first admission under the derived per-source target. Weights use
    integer sqrt + integer DIV so both engines derive identical
    targets (operators.text.temperature_budget_mix)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.temperature_budget_mix(
        docs, "text", "doc_id", "source", total_budget=TEMP_MIX_BUDGET
    )


SPAN_WINDOW = 16


def q142_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-1 duplicate-SPAN removal (Lee et al. 2022 substring
    dedup, the alignment-free refinement of q101's fixed passages):
    every 16-token sliding window that also occurs in an earlier doc
    marks its span; spans merge and the doc is rebuilt without them,
    keeping the earliest doc's copy. Catches shared boilerplate at
    ANY offset — q101 only catches passage-aligned repeats."""
    docs = load_table(spark, sf_dir, "documents")
    return T.duplicate_span_removal(
        docs, "text", "doc_id", window_tokens=SPAN_WINDOW
    )


_PROXY_GRAM_N = 4


def q127_gram_compression_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc compressibility proxy: distinct 4-gram ratio
    (repetitive text scores low, diverse text high — the same
    ordering signal as a zlib ratio). A pure narrow map (char_ngrams
    + array_distinct + size, zero shuffles, zero Python), and —
    unlike zlib — exactly SQL-expressible, so the driver hash-gate
    checks it end to end. The zlib variant stays available as
    ``operators.text.compression_ratio`` (Arrow-batched pandas UDF)
    with exact zlib parity pinned in tests/test_text_scoring.py —
    it is deterministic but not DuckDB-expressible, which made its
    catalog slot print a permanent ``no_oracle`` row; this proxy
    replaces it in the catalog so every sampled entry is
    hash-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.56 s -> 0.13 s; no-op at real scale).
    docs = _fan_out(docs)
    grams = T.char_ngrams(F.col("text"), _PROXY_GRAM_N)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n_grams.cast("long").alias("n_grams"),
        n_distinct.cast("long").alias("n_distinct_grams"),
        F.round(n_distinct / n_grams, 6).alias("distinct_ratio"),
    )


def q137_needle_insertion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Needle-in-a-haystack eval-data synthesis: marker inserted at a
    deterministic md5 depth per doc (uniform over depths, exactly
    reproducible across engines). Pure narrow map."""
    docs = load_table(spark, sf_dir, "documents")
    return T.needle_insert(docs, "text", "doc_id")


LEN_BUCKETS = 8


def q135_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit (the inference/serving prep
    pass): docs split into 8 equal-count token-length buckets
    (global_ntile — no unpartitioned window), reporting per bucket
    the padding waste when batching within the bucket vs padding
    everything to the GLOBAL max. The bucketed pad_frac is what a
    length-grouped batcher achieves; naive_pad_frac is the cost of
    not bucketing — the delta is the serving-throughput argument.
    Global max arrives via a broadcast 1-row agg (q71 pattern)."""
    from ulh_etl_spark.operators.rank import global_ntile

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(T.whitespace_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    b = global_ntile(
        toks, [F.col("n_tokens"), F.col("doc_id")], LEN_BUCKETS,
        out_col="bucket",
    )
    gmax = toks.agg(F.max("n_tokens").alias("_gmax"))
    per = b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        per.join(F.broadcast(gmax))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "max_tokens",
            "total_tokens",
            F.round(
                (F.col("max_tokens") * F.col("n_docs") - F.col("total_tokens"))
                / (F.col("max_tokens") * F.col("n_docs")),
                6,
            ).alias("pad_frac"),
            F.round(
                (F.col("_gmax") * F.col("n_docs") - F.col("total_tokens"))
                / (F.col("_gmax") * F.col("n_docs")),
                6,
            ).alias("naive_pad_frac"),
        )
    )


ERASE_MOD = 101


def q141_deletion_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact report: given an erasure list
    (every ERASE_MOD-th doc — stand-in for deletion requests), count
    the rows each derived artifact must purge — source documents,
    winnowing fingerprints (q64 grain), split assignments (q63
    grain), and 32-token passages (q101 grain). The report is what a
    compliance pass signs off BEFORE running the deletes; every leg
    is a broadcast semi-join against the (tiny by construction)
    erasure list, so the scan cost is one pass per artifact and
    nothing shuffles on the corpus side.

    The report is ONE LAZY PLAN — a union of four single-row
    aggregates — honoring the catalog contract that queries return
    un-executed DataFrames (no driver-side counts at construction
    time): nothing runs unless the caller executes the result, and
    bench/plan tooling sees the real four-scan plan, not a
    pre-collected local relation."""
    docs = load_table(spark, sf_dir, "documents")
    erase = docs.filter(F.col("doc_id") % ERASE_MOD == 0).select("doc_id")

    def _purged(df):
        return df.join(F.broadcast(erase), "doc_id", "left_semi")

    def _leg(df, name):
        return _purged(df).agg(F.count("*").alias("_n")).select(
            F.lit(name).alias("artifact"),
            F.col("_n").cast("long").alias("n_rows_purged"),
        )

    toks = T.whitespace_tokens(F.col("text"))
    passages = (
        _purged(
            docs.select(
                "doc_id",
                F.greatest(
                    F.ceil(F.size(toks) / F.lit(PASSAGE_TOKENS)).cast("long"),
                    F.lit(1),
                ).alias("np"),
            )
        )
        .agg(F.coalesce(F.sum("np"), F.lit(0)).alias("_n"))
        .select(
            F.lit("passages").alias("artifact"),
            F.col("_n").cast("long").alias("n_rows_purged"),
        )
    )
    return (
        _leg(docs, "documents")
        .unionAll(
            _leg(
                T.winnow_fingerprints(docs, "text", "doc_id", k=5, window=4),
                "winnow_fingerprints",
            )
        )
        .unionAll(
            _leg(
                docs.select(
                    "doc_id", T.hash_split(F.col("doc_id")).alias("s")
                ),
                "split_assignments",
            )
        )
        .unionAll(passages)
    )


GROUP_WSAMPLE_K = 20


def q140_group_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-weighted sample (top-20 per lang by the
    Efraimidis-Spirakis key) — the per-group form of q82: every
    language contributes its own quality-proportional sample
    regardless of language size, the selection pass of a
    per-language mixture build. ONE shuffle (the per-lang rank
    window); the key itself is a narrow expression, and a hot
    language is the window group — the documented escape is
    cap_per_group's salted pattern if a group outgrows a task."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.52 s -> 0.33 s; no-op at real scale).
    docs = _fan_out(docs)
    key = T.weighted_sample_key(
        F.col("doc_id"), T.quality_score(F.col("text"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "lang", F.round(key, 6).alias("sample_key")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= GROUP_WSAMPLE_K)
        .select("lang", F.col("rnk").cast("int").alias("rnk"),
                "doc_id", "sample_key")
    )


def q123_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus distribution QA: rank-frequency log-log slope (natural
    text ~ -1). Vocabulary groupBy + global_row_number ranking (no
    single-partition window) + closed-form least squares."""
    docs = load_table(spark, sf_dir, "documents")
    return T.zipf_slope(docs, "text")


SPAN_TOKENS = 16


def q124_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive (anchor, positive) span-pair generation (inverse
    cloze): doc head + salted-md5-offset second span, deterministic,
    pure narrow map; short docs yield nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return T.contrastive_span_pairs(
        docs, "text", "doc_id", span_tokens=SPAN_TOKENS
    )


BLOCKLIST = ("slow", "big", "spam")


def q120_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety blocklist prefilter with leet folding (sp4m -> spam):
    per-doc occurrence counts + matched terms + keep flag. Pure
    narrow map; the blocklist is a policy-sized array literal."""
    docs = load_table(spark, sf_dir, "documents")
    return T.blocklist_filter(docs, "text", "doc_id", BLOCKLIST)


KN_DISCOUNT = 0.75


def q118_kneser_ney_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality proxy — q78's
    pipeline one order up, with the continuation-count smoothing
    real perplexity filters use. Model relations are bigram-type-
    bounded; docs with < 2 tokens survive with NULL."""
    docs = load_table(spark, sf_dir, "documents")
    return T.kneser_ney_bigram_scores(
        docs, "text", "doc_id", discount=KN_DISCOUNT
    )


CALIB_KEEP_FRAC = 0.5


def q114_source_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-fair quality thresholding: quality percent-ranked WITHIN
    each source, keep the top half of every source — a global cutoff
    on the raw score would over-prune sources whose heuristic scores
    run low (CCNet does this per-language on perplexity). One shuffle
    on source."""
    from ulh_etl_spark.operators.rank import group_quantile_calibrate

    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.35 s -> 0.22 s; no-op at real scale).
    docs = _fan_out(docs)
    scored = T.with_quality_score(docs, "text").select(
        "doc_id", "source", "quality"
    )
    return group_quantile_calibrate(
        scored, "quality", "source", keep_frac=CALIB_KEEP_FRAC
    )


BPE_MERGES = 6


def q115_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction: the first 6 merge-table rows trained
    on the corpus word histogram (one corpus pass; every iteration
    runs on the vocab relation, bounded regardless of corpus size).
    The oracle unrolls the same iterations as CTE layers with a
    list_reduce greedy re-merge."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_merge_steps(docs, "text", n_merges=BPE_MERGES)


def q116_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the q115-trained merge table:
    per-doc whitespace vs BPE token counts — the accounting that
    feeds packing/budget passes once the tokenizer is BPE. Merges
    apply on the vocab (corpus-size-independent), docs re-join on
    the word."""
    docs = load_table(spark, sf_dir, "documents")
    merges = T.bpe_merge_steps(docs, "text", n_merges=BPE_MERGES)
    return T.apply_bpe(docs, "text", "doc_id", merges)


BLOOM_HASHES = 5


def q113_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q79's decontamination with the memory-bounded engine path: the
    benchmark grams compress to a Bloom bitmap SELF-SIZED to >= 10
    bits per measured distinct benchmark gram (floored at 128 KiB —
    the q177 policy, r16: the former fixed 2^20 bitmap would
    saturate once the benchmark stand-in outgrew ~10^5 grams and the
    prefilter would silently pass everything), broadcast once; corpus
    grams probe it vectorized, and the FP survivors shuffle-join the
    benchmark for the exact verify — identical output to q79 at ANY
    width (Bloom has no false negatives; the equality join kills
    false positives), so it shares q79's oracle body. What q113 adds
    is the physical path that still works when the benchmark gram
    set outgrows a raw broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    return T.bloom_contamination_counts(
        corpus, bench, "text", "doc_id",
        n=DECON_N, min_shared=DECON_MIN_SHARED,
        n_hashes=BLOOM_HASHES,
    )


def q236_decon_bitmap_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q113 bitmap-sizing pre-flight, as a query: the measured
    distinct benchmark gram count, the bitmap width the self-sizing
    rule picks (>= 10 bits/gram, next power of two, floored at 2^20
    — the q177 policy, r16), and the resulting bits-per-gram. This
    is the knob-inventory discipline (SCALE.md r16) made auditable:
    the width every decontamination run will actually use is itself
    an oracle-checked number, so a saturating bitmap can never hide
    — fill factor ~n_grams/n_bits stays <= 0.1 by construction.

    Exact cross-engine pow2 without float log2: smallest power of
    two >= y is ``1 << length(bin(y - 1))`` for y >= 2 — pure
    integer/string ops both engines share (the driver-literal log2
    rule doesn't apply because nothing here is a float). Counts are
    distinct RAW grams (two-hash policy: the operator's xxhash64
    compression is internal; the count is hash-invariant).

    Scale: one benchmark-sized distinct + a 1-row aggregate — the
    pre-flight is O(|benchmark|), never corpus-scale."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    agg = (
        bench.select(
            F.explode(
                F.array_distinct(T.char_ngrams(F.col("text"), DECON_N))
            ).alias("_g")
        )
        .distinct()
        .agg(F.count("*").cast("long").alias("n_bench_grams"))
    )
    sized = agg.select(
        "n_bench_grams",
        F.greatest(
            F.lit(1 << 20).cast("long"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), length(bin("
                "greatest(n_bench_grams * 10, CAST(2 AS BIGINT)) - 1)))"
            ),
        ).alias("n_bits"),
    )
    return sized.select(
        "n_bench_grams",
        "n_bits",
        F.round(
            F.col("n_bits").cast("double")
            / F.greatest(F.col("n_bench_grams"), F.lit(1)).cast("double"),
            6,
        ).alias("bits_per_gram"),
    )


TOP_NGRAM_K = 100
PACK_CTX = 512
PACK_SHARDS = 8


def q87_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic concat-then-chunk sequence packing: per-doc
    (shard, offset, pack_idx) for 512-token context windows. The only
    shuffle is the per-shard window — parallelism = shard count."""
    docs = load_table(spark, sf_dir, "documents")
    return T.pack_sequences(
        docs, "text", "doc_id", ctx_len=PACK_CTX, n_shards=PACK_SHARDS
    )


def q88_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing utilization (windows consumed, padding
    fraction) over the q87 assignment."""
    docs = load_table(spark, sf_dir, "documents")
    packed = T.pack_sequences(
        docs, "text", "doc_id", ctx_len=PACK_CTX, n_shards=PACK_SHARDS
    )
    return T.pack_utilization(packed, ctx_len=PACK_CTX)


CHUNK_TOKENS = 64
PASSAGE_TOKENS = 32
CHUNK_OVERLAP = 16
MIX_BUDGET = 1000


def q90_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing: cap each source's contribution at a 1000-token
    budget, admitting best-quality docs first (deterministic doc_id
    tiebreak). One window per source key, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    return T.token_budget_sample(
        docs, "text", "doc_id", "source", budget_tokens=MIX_BUDGET
    )


def q89_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding-prep chunking: 64-token chunks, 16-token overlap.
    Narrow map + explode — zero shuffles; each chunk is a slice of the
    once-materialized token array."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(
        docs, "text", "doc_id",
        chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP,
    )


def q101_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup with reassembly (Lee et al. 2022's
    duplicate-substring REMOVAL, at passage granularity): 32-token
    non-overlapping passages, keep the globally first occurrence of
    each distinct passage, rebuild every doc from its survivors. One
    passage-hash window shuffle + one doc-key reassembly shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return T.passage_dedup(
        docs, "text", "doc_id", passage_tokens=PASSAGE_TOKENS
    )


BOILER_MIN_DOCS = 2


def q110_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: passages occurring
    in >= BOILER_MIN_DOCS distinct documents are stripped from EVERY
    document (contrast q101, which keeps the first occurrence).
    Two-level groupBy docfreq + hash join-back + one reassembly
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return T.boilerplate_passage_filter(
        docs,
        "text",
        "doc_id",
        passage_tokens=PASSAGE_TOKENS,
        min_docs=BOILER_MIN_DOCS,
    )


def q83_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-100 word bigrams (boilerplate-phrase /
    tokenizer-stats pass). Partial-agged groupBy + TakeOrdered top-k:
    no global sort, ties cut deterministically by the bigram string."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.38 s -> 0.26 s; no-op at real scale).
    docs = _fan_out(docs)
    return T.top_ngrams(docs, "text", n=2, k=TOP_NGRAM_K)


def q80_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: type-token ratio (narrow
    array expression) + top-bigram share (explode -> partial-agged
    groupBy, linear in corpus tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_signals(docs, "text", "doc_id")


LOGPROB_TIERS = 3


def q91_logprob_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: rank the corpus by unigram
    LM score and split into head/middle/tail tiers, reporting
    per-tier size and score bounds — the pass that decides which
    slice of a crawl is worth training on. The global ranking uses
    global_ntile (operators/rank.py): range-repartition + driver
    offsets, NO unpartitioned window — exact ntile semantics at any
    corpus size."""
    from ulh_etl_spark.operators.rank import global_ntile

    docs = load_table(spark, sf_dir, "documents")
    scores = T.unigram_logprob_scores(docs, "text", "doc_id")
    tiled = global_ntile(
        scores,
        [F.col("mean_logprob").desc_nulls_last(), F.col("doc_id")],
        LOGPROB_TIERS,
        out_col="tier",
    )
    return tiled.groupBy("tier").agg(
        F.count("*").alias("n_docs"),
        F.round(F.max("mean_logprob"), 6).alias("best_logprob"),
        F.round(F.min("mean_logprob"), 6).alias("worst_logprob"),
    )


# Deterministic PII seeding for q92: every 7th doc gets a synthetic
# contact line appended so the redaction path is exercised against
# non-trivial matches (the synthetic corpus contains no natural PII).
PII_MOD = 7


EPOCH_SHARDS = 4


def q93_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training readers: order the
    corpus by md5(epoch_salt || doc_id) — a stable pseudo-random
    permutation — assign each doc its global position, and derive the
    reader shard round-robin. Every run/engine produces the identical
    epoch order (no RNG state), and the global index is the
    scale-safe global_row_number shape (range repartition + driver
    offsets, no unpartitioned window)."""
    from ulh_etl_spark.operators.rank import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch0_"), F.col("doc_id").cast("string")))
    shuffled = global_row_number(
        docs.select("doc_id", key.alias("shuffle_key")),
        ["shuffle_key", "doc_id"],
        out_col="position",
    )
    return shuffled.select(
        "doc_id",
        "position",
        ((F.col("position") - 1) % EPOCH_SHARDS).cast("int").alias("reader_shard"),
    )


def q92_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: email/SSN/phone spans replaced with typed tags plus
    the per-doc span count — the standard pre-training redaction
    stage. Pure chained regexp (JVM codegen, narrow map, zero
    shuffles at any corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % PII_MOD == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-5309"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return seeded.select(
        "doc_id",
        T.redact_pii(F.col("text")).alias("clean_text"),
        T.pii_count(F.col("text")).cast("long").alias("n_pii"),
    )


_QMODEL_K = 64
_QMODEL_W = T.hashed_model_weights(_QMODEL_K)


def q84_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: fastText-style hashed bag-of-words
    linear classifier as one JVM expression — token-hash bucket
    lookup into a plan-constant weight array, sigmoid of the mean
    logit. The deployment shape for a LEARNED filter at 100 TB (no
    UDF, no vocab join, no shuffle); the stand-in weights are
    md5-derived so the oracle computes the identical model."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.46 s -> 0.21 s; no-op at real scale).
    docs = _fan_out(docs)
    return docs.select(
        "doc_id",
        T.hashed_linear_score(F.col("text"), _QMODEL_W).alias("model_score"),
    )


_RET_THRESHOLDS = (0.3, 0.4, 0.5, 0.6, 0.7)


def q239_quality_retention_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The data-mixing decision curve behind every quality cut: for
    candidate model-score thresholds t in {0.3..0.7}, the exact doc
    and TOKEN retention (count + fraction) if the corpus were
    filtered at q84's hashed-linear quality score >= t — the Pareto
    view that picks the threshold for a token budget ("what does
    raising the bar to 0.6 cost in tokens?"). Comparisons run on the
    ROUND-6 score both engines compute bit-identically (q84's
    gate-green contract), so the curve is exact, not
    tolerance-matched.

    Scale: ONE corpus scan computes (score, token count); the
    threshold axis rides an explode (|thresholds| x corpus rows into
    a 5-key map-side-combined groupBy — no second scan, no join, no
    window). Totals come from the same aggregate (every group sees
    the full corpus), so fractions need no extra pass."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.55 s -> 0.28 s; no-op at real scale).
    docs = _fan_out(docs)
    scored = docs.select(
        T.hashed_linear_score(F.col("text"), _QMODEL_W).alias("_s"),
        F.size(T.whitespace_tokens(F.lower(F.col("text"))))
        .cast("long")
        .alias("_tok"),
    )
    ex = scored.select(
        "_s",
        "_tok",
        F.explode(
            F.array(*[F.lit(t) for t in _RET_THRESHOLDS])
        ).alias("threshold"),
    )
    kept = F.when(F.col("_s") >= F.col("threshold"), 1).otherwise(0)
    return (
        ex.groupBy("threshold")
        .agg(
            F.sum(kept).cast("long").alias("n_docs_kept"),
            F.sum(
                F.when(F.col("_s") >= F.col("threshold"), F.col("_tok"))
                .otherwise(0)
            ).cast("long").alias("n_tokens_kept"),
            F.count("*").cast("long").alias("_n"),
            F.sum("_tok").cast("long").alias("_t"),
        )
        .select(
            "threshold",
            "n_docs_kept",
            "n_tokens_kept",
            F.round(
                F.col("n_docs_kept").cast("double")
                / F.col("_n").cast("double"),
                6,
            ).alias("frac_docs"),
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("frac_tokens"),
        )
    )


_DSIR_B = 1024


def q104_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (hashed-unigram importance resampling):
    log importance weight of every document with lang='en' docs as
    the target domain — the select-web-data-that-looks-like-the-
    target recipe. One conditional-sum histogram groupBy (bounded by
    n_buckets), a broadcast log-ratio model, one per-doc sum; no
    self-join, no window, no Python (operators.text.dsir_importance)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_is_en", F.col("lang") == "en"
    )
    return T.dsir_importance(
        docs, "text", "doc_id", "_is_en", n_buckets=_DSIR_B
    )


def q108_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter: per-rule pass flags + the
    conjunctive keep, all JVM expressions over one tokenization
    (operators.text.gopher_rules). Pure narrow map — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # Under-parallel guard: the per-doc text work precedes any
    # exchange (r17 probe 0.48 s -> 0.20 s; no-op at real scale).
    docs = _fan_out(docs)
    return T.gopher_rules(docs, "text", "doc_id")


_CAP_N = 10


def q97_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency cap (the Common Crawl domain cap): keep at
    most 10 docs per source, chosen deterministically by md5-of-id
    order. Two-phase salted ranking — a hot source never funnels
    through one task (operators.text.cap_per_group); result identical
    to the single-window SQL the oracle runs."""
    docs = load_table(spark, sf_dir, "documents")
    return T.cap_per_group(docs, "source", "doc_id", _CAP_N).select(
        "doc_id", "source", F.col("cap_rank").cast("int").alias("cap_rank")
    )


_UNIMAX_NUM, _UNIMAX_DEN, _UNIMAX_EPOCHS = 19, 20, 1


def q161_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax source mixing (Chung et al. 2023): a token budget (95%
    of the corpus) spread UNIFORMLY over sources, each capped at 1
    epoch of its own mass — waterfilling, so small sources contribute
    everything and large sources split the remainder evenly. The
    uniform-with-cap counterpart of q143's temperature mixing; all
    comparisons and the waterline are integer ops (integer prefix
    sums + DIV), so both engines derive bit-identical allocations
    (operators.text.unimax_allocation). The waterfill window runs
    over the per-SOURCE relation — bounded by source count, never
    corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unimax_allocation(
        docs, "text", "source",
        budget_num=_UNIMAX_NUM, budget_den=_UNIMAX_DEN,
        epoch_cap=_UNIMAX_EPOCHS,
    )


def q162_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per language, BPE-ish tokens per
    whitespace word and characters per BPE-ish token — the standard
    measurement of how unevenly a tokenizer prices different
    languages (high fertility = more tokens per word = that
    language pays more context budget). One partial-aggregated
    groupBy over integer sums; the two ratios are single double
    divisions of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        T.token_count(F.col("text")).cast("long").alias("_ws"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("_bpe"),
        F.col("n_chars").alias("_ch"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_ws").alias("ws_tokens"),
        F.sum("_bpe").alias("bpe_tokens"),
        F.sum("_ch").alias("n_chars"),
    )
    return agg.select(
        "lang", "n_docs", "ws_tokens", "bpe_tokens", "n_chars",
        F.round(
            F.col("bpe_tokens").cast("double") / F.col("ws_tokens").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.col("bpe_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


def q195_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shannon entropy (bits/char) per document
    (operators.text.char_entropy) — the fully-SQL-checkable
    information-density quality signal next to q97's zlib proxy:
    templated text scores low, natural prose ~4 bits, noise high.
    The per-char term sum folds in sorted-character order so both
    engines accumulate identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    return T.char_entropy(docs, "text", "doc_id")


_LB_PROBS = (0.25, 0.5, 0.75)
_LB_BATCH = 32
_LB_SKETCH_K = 256


def q196_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching (operators.text.
    length_bucket_batches): bucket docs by token count at the
    quartiles, then chunk each bucket into 32-doc batches in id
    order — the padding-minimization layout for batched embedding /
    inference jobs. The quartile boundaries come from the q192
    mergeable quantile sketch over token counts, so the boundary
    pass reads k register rows, never sorts the corpus — the sketch
    family composing into a layout decision."""
    docs = load_table(spark, sf_dir, "documents")
    return T.length_bucket_batches(
        docs, "text", "doc_id",
        probs=_LB_PROBS, sketch_k=_LB_SKETCH_K, batch_size=_LB_BATCH,
    )


UNI_VOCAB = 256
UNI_ROUNDS = 2


def q190_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018 / SentencePiece's
    unigram model, hard-EM variant — operators.text.unigram_lm_train):
    seed a substring vocabulary from the word histogram, then
    alternate exact Viterbi segmentation with count re-estimation +
    pruning. Completes the tokenizer-trainer pair next to q115's BPE
    — BPE grows a vocab bottom-up by merging, unigram shrinks one
    top-down by pruning. ONE corpus-scale shuffle (the word
    histogram); every later relation is |distinct words| x 42 spans
    or FIXED-vocab-bounded, and the whole training is one lazy plan
    (no per-round driver collect, unlike BPE's top-1). The Viterbi
    DP runs as two linear F.aggregate folds; the oracle replays the
    identical program as materialized CTE layers."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_lm_train(
        docs, "text", vocab_size=UNI_VOCAB, rounds=UNI_ROUNDS
    )


def q191_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the q190-trained unigram vocabulary:
    per-doc whitespace vs unigram-piece counts — q116's exact shape,
    so the two trained tokenizers' fertility is directly comparable
    doc-for-doc. Segmentation cost is per DISTINCT word; docs
    re-join on the word (the BPE-apply pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_fertility(
        docs, "text", "doc_id", vocab_size=UNI_VOCAB, rounds=UNI_ROUNDS
    )


def q163_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit over q93's epoch shards: per reader shard,
    doc count, token mass, and skew = shard mass / ideal-even mass —
    the check that a training reader fleet gets even work (round-
    robin on a hashed permutation should land within noise of 1.0;
    a skewed shard starves its reader). Nests q93's assignment, one
    groupBy on the shard id, 1-row grand total broadcast back."""
    docs = load_table(spark, sf_dir, "documents")
    shards = q93_corpus_shuffle_shards(spark, sf_dir).select(
        "doc_id", "reader_shard"
    )
    tk = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("_t")
    )
    per = shards.join(tk, "doc_id").groupBy("reader_shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_t").alias("token_mass"),
    )
    grand = per.agg(F.sum("token_mass").alias("_tot"))
    return per.crossJoin(F.broadcast(grand)).select(
        "reader_shard", "n_docs", "token_mass",
        F.round(
            F.col("token_mass").cast("double")
            * F.lit(EPOCH_SHARDS)
            / F.col("_tot").cast("double"),
            6,
        ).alias("skew"),
    )


_QLM_MU = 2000.0


def q165_dirichlet_qlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001) against the q58 query bag — the language-modeling
    ranking function next to BM25: smoothing scores every doc
    finitely, so the ranking is total where BM25 collapses no-hit
    docs to 0. Same fixed-query-bag shape as q58: per-term tf as
    narrow array expressions, ONE 1-row stats shuffle broadcast back
    (operators.text.dirichlet_qlm_scores)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.dirichlet_qlm_scores(
        docs, "text", "doc_id", BM25_QUERY, mu=_QLM_MU
    )


_POSTING_MIN_DF = 5


def q166_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build statistics: per term (df >= 5), document
    frequency, total term frequency, and the top posting (argmax tf,
    doc_id tiebreak) — the profile that sizes posting lists and
    picks stopword cutoffs before building a lexical index. Explode
    -> partial-agged (term, doc) counts -> one window on the term
    key; work is linear in corpus tokens, keys are terms (Zipf-hot
    head handled by AQE skew splits on the first shuffle; the window
    relation is (term, doc) pairs, already collapsed)."""
    from pyspark.sql import Window

    from ulh_etl_spark.operators.fanout import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Token explode + map-side tf partial agg precede the first
    # exchange — under-parallel guard (no-op at real scale).
    docs = fan_out(docs)
    tok = docs.select(
        "doc_id",
        F.explode(
            T.whitespace_tokens(F.lower(F.col("text")))
        ).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    w = Window.partitionBy("term")
    ranked = tf.select(
        "term", "doc_id", "tf",
        F.row_number()
        .over(w.orderBy(F.col("tf").desc(), F.col("doc_id")))
        .alias("_rn"),
        F.count("*").over(w).cast("long").alias("df"),
        F.sum("tf").over(w).alias("total_tf"),
    )
    return ranked.filter(
        (F.col("_rn") == 1) & (F.col("df") >= _POSTING_MIN_DF)
    ).select(
        "term", "df", "total_tf",
        F.col("doc_id").alias("top_doc_id"),
        F.col("tf").alias("top_tf"),
    )


_TOKS = O.ws_tokens("text")
_LOW_TOKS = O.ws_tokens("lower(text)")
_BM25_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)


def _score(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_LOW_TOKS}, t -> t IN ({inlist})))"


_S = {lang: _score(m) for lang, m in T.LANG_MARKERS.items()}



_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_TOPK = 30


def q171_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency audit (operators.sketch): build a
    4 x 512 CMS over the corpus token stream, then compare the
    sketch's estimate against the exact count for the 30 most
    frequent tokens — the overcount column IS the sketch's collision
    error, surfaced. At 100 TB the exact side of this audit is run
    on a sample; the SKETCH side is the production artifact: one
    partial-aggregated groupBy whose shuffle volume is depth x width
    counters per task regardless of corpus size, mergeable across
    days the same way the algebraic-state rollup (q173) is.

    Two passes over the token stream (sketch + exact candidates) —
    deliberate: persisting an exploded token relation costs more
    than re-reading the pruned text column."""
    from ulh_etl_spark.operators import sketch as SK
    from ulh_etl_spark.operators.fanout import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Both passes' token explodes sit before their first exchange —
    # under-parallel guard (r17 measured 1.16 s -> 0.58 s).
    docs = fan_out(docs)
    toks = docs.select(
        F.explode(
            T.whitespace_tokens(F.lower(F.col("text")))
        ).alias("token")
    )
    counters = SK.cms_counters(
        toks, token_col="token", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    exact = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    cand = exact.orderBy(F.col("exact_cnt").desc(), "token").limit(_CMS_TOPK)
    est = SK.cms_estimates(
        counters,
        cand.select("token"),
        token_col="token",
        depth=_CMS_DEPTH,
        width=_CMS_WIDTH,
    )
    return cand.join(est, "token").select(
        "token",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt"))
        .cast("bigint")
        .alias("overcount"),
    )




_PMI_MIN = 5


def q179_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI of adjacent word pairs with support
    >= 5 (operators.text.pmi_bigrams) — the association statistic
    behind phrase-merging tokenizer preprocessing and boilerplate
    phrase discovery; q83 ranks bigrams by frequency, this ranks by
    how much MORE often a pair co-occurs than its parts predict.
    Integer counts end-to-end; the single ln() is written in the
    same association order in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return T.pmi_bigrams(docs, "text", min_count=_PMI_MIN)




_SPARSE_DF_MIN = 2
_SPARSE_DF_MAX = 10
_SPARSE_K = 3


def q180_sparse_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical document kNN: each doc's top-3 most TF-IDF-cosine-
    similar peers via rare-term blocking + full-overlap scoring
    (operators.text.sparse_lexical_topk) — the sparse/BoW twin of
    q159's dense kNN graph and the candidate generator for lexical
    near-dup review queues. Candidates require a shared df-in-[2,10]
    term (inverted-index pruning — stopwords generate no pairs);
    the score is the exact cosine over ALL shared terms. Ranking on
    the rounded score + id tiebreak keeps rank order engine-
    independent."""
    docs = load_table(spark, sf_dir, "documents")
    return T.sparse_lexical_topk(
        docs, "text", "doc_id",
        df_min=_SPARSE_DF_MIN, df_max=_SPARSE_DF_MAX, k=_SPARSE_K,
    )


_HEAPS_FRACS = (0.1, 0.25, 0.5, 0.75, 1.0)


def q225_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (Heaps 1978): cumulative
    distinct word types vs cumulative tokens at fixed corpus-prefix
    checkpoints (doc_id <= floor(max_id * f) for f in 10/25/50/75/
    100%) — the saturation curve a dedup/curation pipeline reads to
    see whether new data still brings new vocabulary or the corpus
    has gone stale (a flattening curve = diminishing returns, the
    empirical basis for dedup-before-train). Everything is integer
    counts plus one division rounded at the end, so the oracle is
    exact: each type's FIRST-occurrence doc id is a min-aggregate,
    and a checkpoint's type count is just |types with first <= thr|.

    Scale: one groupBy on the word (partial-agg min), one per-doc
    token count (map-side), then each relation broadcast-joins the
    5-row checkpoint table — two corpus passes total, no window, no
    sort; the checkpoint thresholds derive from a 1-row max
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(T.whitespace_tokens(F.col("text"))).alias("_w")
    )
    firsts = words.groupBy("_w").agg(F.min("doc_id").alias("_first"))
    dstats = docs.select(
        "doc_id", F.size(T.whitespace_tokens(F.col("text"))).alias("_ntok")
    )
    cps = (
        docs.agg(F.max("doc_id").alias("_mx"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f).alias("frac"),
                            F.floor(F.col("_mx") * F.lit(f))
                            .cast("long")
                            .alias("_thr"),
                        )
                        for f in _HEAPS_FRACS
                    ]
                )
            ).alias("c")
        )
        .select("c.frac", "c._thr")
    )
    types = (
        firsts.crossJoin(F.broadcast(cps))
        .filter(F.col("_first") <= F.col("_thr"))
        .groupBy("frac")
        .agg(F.count("*").cast("bigint").alias("n_types"))
    )
    toks = (
        dstats.crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") <= F.col("_thr"))
        .groupBy("frac")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_ntok").cast("bigint").alias("n_tokens"),
        )
    )
    return toks.join(types, "frac").select(
        "frac",
        "n_docs",
        "n_tokens",
        "n_types",
        F.round(
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("type_token_ratio"),
    )


def q229_simpson_lexical_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source lexical concentration via the Simpson index
    (Simpson 1949): the probability two tokens drawn WITHOUT
    replacement from a source are the same word,
    D = sum_i n_i(n_i-1) / (N(N-1)), and its complement diversity —
    the log-free companion to the entropy signals (q195/q123):
    boilerplate-heavy or template-spam sources concentrate (high D)
    long before their mean quality score moves. ENTIRELY integer
    arithmetic until one final division, so the oracle is exact with
    no float-fold discipline needed at all.

    Scale: one (source, word) groupBy with map-side partial agg,
    then a groupBy on the source — the same two-pass shape as every
    per-source profile here; sum n_i^2 <= N^2 stays far inside int64
    at any realistic per-source token count."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "source",
            F.explode(T.whitespace_tokens(F.col("text"))).alias("_w"),
        )
        .groupBy("source", "_w")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    per = wc.groupBy("source").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("_c") * (F.col("_c") - F.lit(1)))
        .cast("long")
        .alias("_rep"),
    )
    ratio = F.col("_rep").cast("double") / (
        F.col("n_tokens").cast("double")
        * (F.col("n_tokens") - F.lit(1)).cast("double")
    )
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(ratio, 6).alias("simpson_index"),
        F.round(F.lit(1.0) - ratio, 6).alias("diversity"),
    )


QUERIES = {
    "q225_heaps_vocab_growth": q225_heaps_vocab_growth,
    "q229_simpson_lexical_diversity": q229_simpson_lexical_diversity,
    "q180_sparse_lexical_topk": q180_sparse_lexical_topk,
    "q179_pmi_bigrams": q179_pmi_bigrams,
    "q171_cms_heavy_hitters": q171_cms_heavy_hitters,
    "q161_unimax_mix": q161_unimax_mix,
    "q162_token_fertility": q162_token_fertility,
    "q190_unigram_vocab": q190_unigram_vocab,
    "q191_unigram_fertility": q191_unigram_fertility,
    "q195_char_entropy": q195_char_entropy,
    "q196_length_batches": q196_length_batches,
    "q163_shard_balance": q163_shard_balance,
    "q165_dirichlet_qlm": q165_dirichlet_qlm,
    "q166_posting_stats": q166_posting_stats,
    "q30_token_counts": q30_token_counts,
    "q31_quality_score": q31_quality_score,
    "q32_lang_id": q32_lang_id,
    "q33_fingerprint": q33_fingerprint,
    "q57_tfidf": q57_tfidf,
    "q58_bm25": q58_bm25,
    "q63_hash_split": q63_hash_split,
    "q64_winnow_fingerprints": q64_winnow_fingerprints,
    "q65_stratified_sample": q65_stratified_sample,
    "q66_top_quality_per_lang": q66_top_quality_per_lang,
    "q78_unigram_logprob": q78_unigram_logprob,
    "q79_decontamination": q79_decontamination,
    "q113_bloom_decontamination": q113_bloom_decontamination,
    "q236_decon_bitmap_sizing": q236_decon_bitmap_sizing,
    "q239_quality_retention_curve": q239_quality_retention_curve,
    "q114_source_quality_calibration": q114_source_quality_calibration,
    "q115_bpe_merges": q115_bpe_merges,
    "q116_bpe_tokenize": q116_bpe_tokenize,
    "q118_kneser_ney_scores": q118_kneser_ney_scores,
    "q120_blocklist_filter": q120_blocklist_filter,
    "q122_split_leakage": q122_split_leakage,
    "q123_zipf_slope": q123_zipf_slope,
    "q127_gram_compression_proxy": q127_gram_compression_proxy,
    "q142_dup_span_removal": q142_dup_span_removal,
    "q143_temperature_mix": q143_temperature_mix,
    "q144_novelty_scores": q144_novelty_scores,
    "q148_html_extract": q148_html_extract,
    "q149_sft_render": q149_sft_render,
    "q150_lang_id_ngram": q150_lang_id_ngram,
    "q152_vocab_coverage": q152_vocab_coverage,
    "q156_lang_agreement": q156_lang_agreement,
    "q124_span_pairs": q124_span_pairs,
    "q135_length_buckets": q135_length_buckets,
    "q137_needle_insertion": q137_needle_insertion,
    "q140_group_weighted_sample": q140_group_weighted_sample,
    "q141_deletion_impact": q141_deletion_impact,
    "q80_repetition_signals": q80_repetition_signals,
    "q82_weighted_sample": q82_weighted_sample,
    "q83_top_bigrams": q83_top_bigrams,
    "q87_sequence_pack": q87_sequence_pack,
    "q88_pack_utilization": q88_pack_utilization,
    "q89_chunk_documents": q89_chunk_documents,
    "q101_passage_dedup": q101_passage_dedup,
    "q110_boilerplate_removal": q110_boilerplate_removal,
    "q90_token_budget_mix": q90_token_budget_mix,
    "q91_logprob_tiles": q91_logprob_tiles,
    "q92_pii_redact": q92_pii_redact,
    "q93_corpus_shuffle_shards": q93_corpus_shuffle_shards,
    "q84_model_quality_score": q84_model_quality_score,
    "q97_source_cap": q97_source_cap,
    "q104_dsir_importance": q104_dsir_importance,
    "q108_gopher_rules": q108_gopher_rules,
}

# Shared quality-score SQL expression (identical to operators.text
# .quality_score) so q31 and q66 oracles stay in lockstep.
_QUALITY_SQL = f"""ROUND(
                 least(CAST(length(text) AS DOUBLE), 500.0) / 500.0 * 0.5
                 + (CAST(len(list_filter(list_filter(string_split_regex(lower(text), '{O.WS}+'), t -> t <> ''),
                        t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                    / CAST(greatest(len(list_filter(string_split_regex(text, '{O.WS}+'), t -> t <> '')), 1) AS DOUBLE)) * 0.3
                 + (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                        / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.2
               , 6)"""

# q78's oracle body, shared with q91 (which tiers the same scores) so
# the two stay in lockstep by construction.
_Q78_SQL = f"""
        WITH toks AS (
            SELECT doc_id, t AS term
            FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), tot AS (
            SELECT term, COUNT(*) AS n FROM toks GROUP BY 1
        ), g AS (
            SELECT SUM(n) AS n_total FROM tot
        ), vocab AS (
            SELECT term, ln(n / n_total) AS logp FROM tot, g
        ), per AS (
            SELECT toks.doc_id, ROUND(AVG(vocab.logp), 6) AS mean_logprob
            FROM toks JOIN vocab USING (term)
            GROUP BY toks.doc_id
        )
        SELECT d.doc_id, per.mean_logprob
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""

# PII redaction/count SQL generated from the SAME pattern table the
# Spark operator uses (operators.text.PII_PATTERNS) — one source of
# truth for the regexes. 'g' flag: DuckDB's regexp_replace is
# first-match-only by default, Spark's replaces all.
_PII_REDACT_SQL = "text"
for _tag, _pat in T.PII_PATTERNS:
    _PII_REDACT_SQL = f"regexp_replace({_PII_REDACT_SQL}, '{_pat}', '{_tag}', 'g')"
_PII_COUNT_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{_pat}'))" for _tag, _pat in T.PII_PATTERNS
)

_W_SQL = "[" + ", ".join(repr(w) for w in _QMODEL_W) + "]::DOUBLE[]"

# Blocklist oracle fragments: the leet fold's from-chars (kept in
# lockstep with operators.text.LEET_FROM) and the list literal.
LEET_FROM_SQL = T.LEET_FROM
BL_SQL = "[" + ", ".join(f"'{t}'" for t in BLOCKLIST) + "]"

_LANG_SCORED_CTES = f"""w AS (
            SELECT {", ".join(
                "[" + ", ".join(repr(x) for x in _LANG_W[lang])
                + f"]::DOUBLE[] AS w_{lang}"
                for lang in ('en', 'es', 'de', 'fr')
            )}
        ), t AS (
            SELECT doc_id, lang, text,
                   {O.grams('lower(text)', _LANG_N)} AS g
            FROM documents
        ), s AS (
            SELECT doc_id, lang, text,
                   {", ".join(
                       "ROUND(list_sum(list_transform(g, t -> "
                       f"w.w_{lang}"
                       f"[CAST({O.md5h('t')} % {_LANG_K} AS INT) + 1])) "
                       f"/ CAST(len(g) AS DOUBLE), 6) AS score_{lang}"
                       for lang in ('en', 'es', 'de', 'fr')
                   )}
            FROM t, w
        )"""

_LANG_PRED_SQL = """CASE
                 WHEN length(trim(text)) = 0 THEN 'unknown'
                 WHEN score_en >= score_es AND score_en >= score_de
                      AND score_en >= score_fr THEN 'en'
                 WHEN score_es >= score_de AND score_es >= score_fr
                      THEN 'es'
                 WHEN score_de >= score_fr THEN 'de'
                 ELSE 'fr'
               END"""

# q93's full SELECT as a standalone string: q163 nests it, so the
# shard assignment and the balance audit stay in lockstep.
_Q93_SQL = f"""
        WITH keyed AS (
            SELECT doc_id,
                   md5('epoch0_' || CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents
        ), pos AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY shuffle_key, doc_id)
                       AS position
            FROM keyed
        )
        SELECT doc_id,
               CAST(position AS BIGINT) AS position,
               CAST((position - 1) % {EPOCH_SHARDS} AS INT) AS reader_shard
        FROM pos
"""

_QLM_TERM_SQL = " + ".join(
    f"""ln((CAST(tf{i} AS DOUBLE) + {_QLM_MU!r} *
            (CAST(ctf{i} AS DOUBLE) / CAST(ctot AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + {_QLM_MU!r}))"""
    for i in range(len(BM25_QUERY))
)

ORACLES = {
    "q180_sparse_lexical_topk": f"""
        WITH toks AS (
            SELECT doc_id, t AS term
            FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        w AS (
            SELECT tf.doc_id AS id, tf.term,
                   tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) AS w,
                   dfreq.df
            FROM tf JOIN dfreq USING (term), n
        ), norms AS (
            SELECT id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY id
        ), rare AS (
            SELECT id, term FROM w
            WHERE df >= {_SPARSE_DF_MIN} AND df <= {_SPARSE_DF_MAX}
        ), cand AS (
            SELECT DISTINCT a.id AS id1, b.id AS id2
            FROM rare a JOIN rare b ON a.term = b.term AND a.id < b.id
        ), scored AS (
            SELECT c.id1, c.id2,
                   CAST(COUNT(*) AS BIGINT) AS n_shared,
                   SUM(w1.w * w2.w) AS dot
            FROM cand c
            JOIN w w1 ON w1.id = c.id1
            JOIN w w2 ON w2.id = c.id2 AND w2.term = w1.term
            GROUP BY c.id1, c.id2
        ), pairs AS (
            SELECT s.id1, s.id2, s.n_shared,
                   ROUND(s.dot / (n1.nrm * n2.nrm), 6) AS cosine
            FROM scored s
            JOIN norms n1 ON n1.id = s.id1
            JOIN norms n2 ON n2.id = s.id2
        ), sym AS (
            SELECT id1, id2, n_shared, cosine FROM pairs
            UNION ALL
            SELECT id2, id1, n_shared, cosine FROM pairs
        ), ranked AS (
            SELECT id1, id2, n_shared, cosine,
                   row_number() OVER (PARTITION BY id1
                                      ORDER BY cosine DESC, id2) AS rank
            FROM sym
        )
        SELECT id1 AS doc_id, id2 AS neighbor_id, n_shared, cosine,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {_SPARSE_K}
    """,
    "q179_pmi_bigrams": f"""
        WITH t AS (
            SELECT {_LOW_TOKS} AS tk FROM documents
        ), uni AS (
            SELECT u.t AS w, COUNT(*) AS c FROM t, unnest(tk) AS u(t)
            GROUP BY 1
        ), nu AS (
            SELECT CAST(SUM(c) AS DOUBLE) AS nu FROM uni
        ), bi AS (
            SELECT tk[g.i] AS w1, tk[g.i + 1] AS w2, COUNT(*) AS n_pair
            FROM t CROSS JOIN unnest(generate_series(1, len(tk) - 1)) AS g(i)
            WHERE len(tk) >= 2
            GROUP BY 1, 2
        ), nb AS (
            SELECT CAST(SUM(n_pair) AS DOUBLE) AS nb FROM bi
        )
        SELECT b.w1, b.w2, CAST(b.n_pair AS BIGINT) AS n_pair,
               ROUND(ln((CAST(b.n_pair AS DOUBLE) * nu.nu * nu.nu)
                        / (nb.nb * CAST(u1.c AS DOUBLE)
                           * CAST(u2.c AS DOUBLE))), 6) AS pmi
        FROM bi b
        JOIN uni u1 ON b.w1 = u1.w
        JOIN uni u2 ON b.w2 = u2.w
        CROSS JOIN nu CROSS JOIN nb
        WHERE b.n_pair >= {_PMI_MIN}
    """,
    "q171_cms_heavy_hitters": f"""
        WITH toks AS (
            SELECT u.t AS token FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), exact AS (
            SELECT token, COUNT(*) AS exact_cnt FROM toks GROUP BY token
        ), cand AS (
            SELECT token, exact_cnt FROM exact
            ORDER BY exact_cnt DESC, token LIMIT {_CMS_TOPK}
        ), counters AS (
            SELECT g.r AS rw,
                   CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || '_' || token), 1, 8) AS BIGINT) % {_CMS_WIDTH} AS bucket,
                   COUNT(*) AS cnt
            FROM toks CROSS JOIN generate_series(0, {_CMS_DEPTH - 1}) AS g(r)
            GROUP BY 1, 2
        ), probes AS (
            SELECT token, exact_cnt, g.r AS rw,
                   CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || '_' || token), 1, 8) AS BIGINT) % {_CMS_WIDTH} AS bucket
            FROM cand CROSS JOIN generate_series(0, {_CMS_DEPTH - 1}) AS g(r)
        )
        SELECT p.token,
               CAST(MIN(p.exact_cnt) AS BIGINT) AS exact_cnt,
               CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_estimate,
               CAST(MIN(COALESCE(c.cnt, 0)) - MIN(p.exact_cnt) AS BIGINT) AS overcount
        FROM probes p LEFT JOIN counters c ON p.rw = c.rw AND p.bucket = c.bucket
        GROUP BY p.token
    """,
    "q161_unimax_mix": f"""
        WITH m AS (
            SELECT source,
                   CAST(SUM(len({O.ws_tokens('text')})) AS BIGINT) AS token_mass
            FROM documents GROUP BY source
        ), c AS (
            SELECT source, token_mass,
                   CAST(token_mass * {_UNIMAX_EPOCHS} AS BIGINT) AS cap_tokens
            FROM m
        ), g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS s,
                   CAST(CAST(SUM(token_mass) AS BIGINT)
                        * {_UNIMAX_NUM} // {_UNIMAX_DEN} AS BIGINT) AS b
            FROM c
        ), w AS (
            SELECT c.source, c.token_mass, c.cap_tokens, g.s, g.b,
                   CAST(row_number() OVER ord AS BIGINT) AS i,
                   CAST(SUM(cap_tokens) OVER ord AS BIGINT) AS p
            FROM c, g
            WINDOW ord AS (ORDER BY cap_tokens, source)
        ), f AS (
            SELECT *, (cap_tokens * (s - i) <= b - p) AS capped FROM w
        ), k AS (
            SELECT CAST(MAX(CASE WHEN capped THEN i ELSE 0 END) AS BIGINT) AS k,
                   CAST(MAX(CASE WHEN capped THEN p ELSE 0 END) AS BIGINT) AS pk
            FROM f
        ), a AS (
            SELECT f.source, f.token_mass, f.cap_tokens,
                   CAST(CASE WHEN f.i <= k.k THEN f.cap_tokens
                             ELSE (f.b - k.pk) // (f.s - k.k)
                        END AS BIGINT) AS alloc_tokens
            FROM f, k
        )
        SELECT source, token_mass, cap_tokens, alloc_tokens,
               ROUND(CAST(alloc_tokens AS DOUBLE)
                     / CAST(token_mass AS DOUBLE), 6) AS epochs
        FROM a
    """,
    "q162_token_fertility": f"""
        WITH per AS (
            SELECT lang,
                   len({O.ws_tokens('text')}) AS ws,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9{T.WS_CHARS}]')) AS bpe,
                   n_chars AS ch
            FROM documents
        ), agg AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(ws) AS BIGINT) AS ws_tokens,
                   CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
                   CAST(SUM(ch) AS BIGINT) AS n_chars
            FROM per GROUP BY lang
        )
        SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars,
               ROUND(CAST(bpe_tokens AS DOUBLE)
                     / CAST(ws_tokens AS DOUBLE), 6) AS fertility,
               ROUND(CAST(n_chars AS DOUBLE)
                     / CAST(bpe_tokens AS DOUBLE), 6) AS chars_per_token
        FROM agg
    """,
    "q163_shard_balance": f"""
        WITH shards AS (
            {_Q93_SQL}
        ), tk AS (
            SELECT doc_id,
                   CAST(len({O.ws_tokens('text')}) AS BIGINT) AS n_tokens
            FROM documents
        ), per AS (
            SELECT reader_shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS token_mass
            FROM shards JOIN tk USING (doc_id)
            GROUP BY reader_shard
        ), g AS (
            SELECT CAST(SUM(token_mass) AS BIGINT) AS tot FROM per
        )
        SELECT reader_shard, n_docs, token_mass,
               ROUND(CAST(token_mass AS DOUBLE) * {EPOCH_SHARDS}
                     / CAST(tot AS DOUBLE), 6) AS skew
        FROM per, g
    """,
    "q165_dirichlet_qlm": f"""
        WITH base AS (
            SELECT doc_id, len({O.ws_tokens('lower(text)')}) AS dl,
                   {", ".join(
                       f"len(list_filter({O.ws_tokens('lower(text)')}, "
                       f"t -> t = '{t}')) AS tf{i}"
                       for i, t in enumerate(BM25_QUERY)
                   )}
            FROM documents
        ), stats AS (
            SELECT CAST(SUM(dl) AS BIGINT) AS ctot,
                   {", ".join(
                       f"CAST(SUM(tf{i}) AS BIGINT) AS ctf{i}"
                       for i in range(len(BM25_QUERY))
                   )}
            FROM base
        )
        SELECT doc_id,
               ROUND(0.0 + {_QLM_TERM_SQL}, 6) AS qlm_score
        FROM base, stats
    """,
    "q166_posting_stats": f"""
        WITH tok AS (
            SELECT doc_id, unnest({O.ws_tokens('lower(text)')}) AS term
            FROM documents
        ), tf AS (
            SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY term, doc_id
        ), ranked AS (
            SELECT term, doc_id, tf,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY tf DESC, doc_id) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
                   CAST(SUM(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf
            FROM tf
        )
        SELECT term, df, total_tf, doc_id AS top_doc_id, tf AS top_tf
        FROM ranked WHERE rn = 1 AND df >= {_POSTING_MIN_DF}
    """,
    # q84: identical hashed-bucket linear model, weights inlined
    "q84_model_quality_score": f"""
        WITH t AS (
            SELECT doc_id, {_LOW_TOKS} AS toks FROM documents
        )
        SELECT doc_id,
               ROUND(1.0 / (1.0 + exp(-(CASE WHEN len(toks) > 0 THEN
                   list_sum(list_transform(toks,
                       tk -> ({_W_SQL})[CAST({O.md5h('tk')} % {_QMODEL_K} AS INT) + 1]))
                   / CAST(len(toks) AS DOUBLE)
                   ELSE 0.0 END))), 6) AS model_score
        FROM t
    """,
    # q97: the two-phase salted cap is exactly the single-window rank
    # q239: q84's exact round-6 score + token counts; the threshold
    # axis via unnest, fractions from the same aggregate. Thresholds
    # CAST AS DOUBLE (a bare 0.3 would be DECIMAL in DuckDB and the
    # >= comparison would run decimal-vs-double)
    "q239_quality_retention_curve": f"""
        WITH s AS (
            SELECT ROUND(1.0 / (1.0 + exp(-(CASE WHEN len(toks) > 0 THEN
                       list_sum(list_transform(toks,
                           tk -> ({_W_SQL})[CAST({O.md5h('tk')}
                               % {_QMODEL_K} AS INT) + 1]))
                       / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END))), 6) AS sc,
                   CAST(len(toks) AS BIGINT) AS tok
            FROM (SELECT {_LOW_TOKS} AS toks FROM documents)
        ), d AS (
            SELECT unnest([{', '.join(
                f'CAST({t} AS DOUBLE)' for t in _RET_THRESHOLDS
            )}]) AS threshold
        )
        SELECT d.threshold,
               CAST(SUM(CASE WHEN s.sc >= d.threshold
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_kept,
               CAST(SUM(CASE WHEN s.sc >= d.threshold
                             THEN s.tok ELSE 0 END) AS BIGINT)
                   AS n_tokens_kept,
               round(CAST(SUM(CASE WHEN s.sc >= d.threshold
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS frac_docs,
               round(CAST(SUM(CASE WHEN s.sc >= d.threshold
                                   THEN s.tok ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(s.tok) AS DOUBLE), 6) AS frac_tokens
        FROM s CROSS JOIN d
        GROUP BY d.threshold
    """,
    "q97_source_cap": f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS cap_rank
            FROM documents
        )
        SELECT doc_id, source, CAST(cap_rank AS INT) AS cap_rank
        FROM ranked WHERE cap_rank <= {_CAP_N}
    """,
    "q30_token_counts": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9{T.WS_CHARS}]'))
                    AS BIGINT) AS bpe_tokens
        FROM documents
    """,
    "q31_quality_score": f"""
        SELECT doc_id,
               ROUND(
                 least(CAST(length(text) AS DOUBLE), 500.0) / 500.0 * 0.5
                 + (CAST(len(list_filter({_LOW_TOKS},
                        t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                    / CAST(greatest(len({_TOKS}), 1) AS DOUBLE)) * 0.3
                 + (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                        / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.2
               , 6) AS quality
        FROM documents
    """,
    # q150/q156 shared chain: identical hashed char-trigram NB
    # profiles; the weight arrays are materialized ONCE in a 1-row
    # CTE and cross-joined — inlining a 512-element list literal
    # inside the lambda (q84's pattern, fine at K=64) makes DuckDB
    # rebuild the list per gram evaluation: measured 60 s vs 0.6 s
    # for 500 docs. The s CTE carries lang/text through so the q156
    # confusion rollup groups the SAME scored relation q150 emits.
    "q150_lang_id_ngram": f"""
        WITH {_LANG_SCORED_CTES}
        SELECT doc_id, {_LANG_PRED_SQL} AS predicted_lang,
               score_en, score_es, score_de, score_fr
        FROM s
    """,
    # q156: q150's scored relation -> declared-vs-predicted confusion
    # matrix (lockstep by shared CTE construction)
    "q156_lang_agreement": f"""
        WITH {_LANG_SCORED_CTES}
        SELECT lang, {_LANG_PRED_SQL} AS predicted_lang,
               COUNT(*) AS n_docs
        FROM s
        GROUP BY 1, 2
    """,
    # q152: identical deterministic vocabulary (count desc, token asc,
    # LIMIT K) then per-doc OOV tally; LEFT JOIN from documents keeps
    # token-less docs with n_tokens = 0 like the engine's explode_outer
    "q152_vocab_coverage": f"""
        WITH tok AS (
            SELECT doc_id, t
            FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), v AS (
            SELECT t FROM (
                SELECT t, COUNT(*) AS c FROM tok GROUP BY t
                ORDER BY c DESC, t LIMIT {_VOCAB_SIZE}
            )
        ), cov AS (
            SELECT tok.doc_id,
                   COUNT(*) AS n_tokens,
                   SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM tok LEFT JOIN v ON tok.t = v.t
            GROUP BY tok.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(cov.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(cov.n_oov, 0) AS BIGINT) AS n_oov,
               ROUND(CAST(COALESCE(cov.n_oov, 0) AS DOUBLE)
                     / CAST(GREATEST(COALESCE(cov.n_tokens, 0), 1) AS DOUBLE),
                     6) AS oov_rate
        FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
    """,
    "q32_lang_id": f"""
        SELECT doc_id,
               CASE
                 WHEN {_S['en']} >= {_S['es']} AND {_S['en']} >= {_S['de']}
                      AND {_S['en']} >= {_S['fr']} AND {_S['en']} > 0 THEN 'en'
                 WHEN {_S['es']} >= {_S['de']} AND {_S['es']} >= {_S['fr']}
                      AND {_S['es']} > 0 THEN 'es'
                 WHEN {_S['de']} >= {_S['fr']} AND {_S['de']} > 0 THEN 'de'
                 WHEN {_S['fr']} > 0 THEN 'fr'
                 ELSE 'unknown'
               END AS predicted_lang,
               CAST({_S['en']} AS BIGINT) AS score_en,
               CAST({_S['es']} AS BIGINT) AS score_es,
               CAST({_S['de']} AS BIGINT) AS score_de,
               CAST({_S['fr']} AS BIGINT) AS score_fr
        FROM documents
    """,
    "q33_fingerprint": f"""
        SELECT doc_id, md5({O.norm_text('text')}) AS fp
        FROM documents
    """,
    "q57_tfidf": f"""
        WITH toks AS (
            SELECT doc_id, t AS term
            FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf,
               ROUND(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6)
                   AS tfidf
        FROM tf JOIN dfreq USING (term), n
    """,
    # Float-parity note: constants are written exactly as the engine's
    # Python expression tree folds them ((1.2 + 1.0), (0.25 + 0.75*x))
    # so both engines evaluate identical double operations.
    "q58_bm25": f"""
        WITH toks AS (
            SELECT doc_id, t AS term
            FROM documents, unnest({_LOW_TOKS}) AS u(t)
        ), qtf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE term IN ({_BM25_IN}) GROUP BY 1, 2
        ), qdf AS (
            SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1
        ), dl AS (
            SELECT doc_id, len({_LOW_TOKS}) AS dl FROM documents
        ), stats AS (
            SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
        )
        SELECT d.doc_id,
               ROUND(COALESCE(SUM(
                   ln(1.0 + (stats.n_docs - qdf.df + 0.5) / (qdf.df + 0.5))
                   * ((qtf.tf * (1.2 + 1.0))
                      / (qtf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / stats.avgdl)))
               ), 0.0), 6) AS bm25
        FROM documents d
        LEFT JOIN qtf ON qtf.doc_id = d.doc_id
        LEFT JOIN qdf ON qdf.term = qtf.term
        LEFT JOIN dl ON dl.doc_id = d.doc_id
        CROSS JOIN stats
        GROUP BY d.doc_id
    """,
    "q63_hash_split": f"""
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   {O.md5h("'split_' || CAST(doc_id AS VARCHAR)")} % 100 AS b
            FROM documents
        )
    """,
    "q64_winnow_fingerprints": f"""
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(h) - 3, 1)),
                   i -> list_min(h[i:i+3])))) AS fp_hash
        FROM (
            SELECT doc_id,
                   list_transform({O.grams('text', 5)},
                                  g -> {O.md5h('g')}) AS h
            FROM documents
        )
    """,
    "q65_stratified_sample": f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {O.md5h("'sample_' || lang || '_' || CAST(doc_id AS VARCHAR)")}
              % 100 < {STRATA_PCT}
    """,
    "q66_top_quality_per_lang": f"""
        WITH scored AS (
            SELECT lang, doc_id, {_QUALITY_SQL} AS quality
            FROM documents
        ), ranked AS (
            SELECT lang, doc_id, quality,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY quality DESC, doc_id) AS rnk
            FROM scored
        )
        SELECT lang, CAST(rnk AS INT) AS rnk, doc_id, quality
        FROM ranked WHERE rnk <= {TOPK_PER_LANG}
    """,
    "q78_unigram_logprob": _Q78_SQL,
    # identical integer counts + double divisions as the Spark
    # expressions, so every flag lands on the same side
    "q108_gopher_rules": f"""
        WITH t AS (
            SELECT doc_id,
                   {_TOKS} AS toks,
                   {_LOW_TOKS} AS low,
                   len(regexp_extract_all(text, '\\.\\.\\.|#')) AS n_symbols
            FROM documents
        ), m AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   CAST(GREATEST(len(toks), 1) AS DOUBLE) AS n_safe,
                   COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS tok_chars,
                   len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
                   len(list_intersect(list_distinct(low),
                       ['the','be','to','of','and','that','have','with'])) AS n_stop,
                   n_symbols
            FROM t
        ), f AS (
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                   n_words >= 10 AND n_words <= 100000 AS word_count_ok,
                   CAST(tok_chars AS DOUBLE) / n_safe >= 3.0
                       AND CAST(tok_chars AS DOUBLE) / n_safe <= 10.0
                       AS mean_word_len_ok,
                   CAST(n_symbols AS DOUBLE) / n_safe <= 0.1 AS symbol_ratio_ok,
                   CAST(n_alpha AS DOUBLE) / n_safe >= 0.8 AS alpha_frac_ok,
                   n_stop >= 2 AS stopwords_ok
            FROM m
        )
        SELECT *,
               word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
                   AND alpha_frac_ok AND stopwords_ok AS keep
        FROM f
    """,
    # add-1-smoothed hashed-unigram models; natural logs; token-less
    # docs NULL via the left join — identical arithmetic to
    # operators.text.dsir_importance
    "q104_dsir_importance": f"""
        WITH ex AS (
            SELECT doc_id, lang = 'en' AS t,
                   {O.md5h("term")} % {_DSIR_B} AS b
            FROM (SELECT doc_id, lang, u.t AS term
                  FROM documents, unnest({_LOW_TOKS}) AS u(t))
        ), hist AS (
            SELECT b,
                   SUM(CASE WHEN t THEN 1 ELSE 0 END) AS t_n,
                   COUNT(*) AS r_n
            FROM ex GROUP BY b
        ), tot AS (
            SELECT SUM(t_n) AS t_tot, SUM(r_n) AS r_tot FROM hist
        ), ratio AS (
            SELECT b,
                   ln((t_n + 1.0) / (t_tot + {_DSIR_B}.0))
                   - ln((r_n + 1.0) / (r_tot + {_DSIR_B}.0)) AS lr
            FROM hist, tot
        ), per AS (
            SELECT ex.doc_id, ROUND(SUM(ratio.lr), 6) AS log_importance
            FROM ex JOIN ratio USING (b)
            GROUP BY ex.doc_id
        )
        SELECT d.doc_id, per.log_importance
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
    "q91_logprob_tiles": f"""
        WITH per AS ({_Q78_SQL}), tiled AS (
            SELECT doc_id, mean_logprob,
                   ntile({LOGPROB_TIERS}) OVER (
                       ORDER BY mean_logprob DESC NULLS LAST, doc_id
                   ) AS tier
            FROM per
        )
        SELECT CAST(tier AS INT) AS tier,
               COUNT(*) AS n_docs,
               ROUND(MAX(mean_logprob), 6) AS best_logprob,
               ROUND(MIN(mean_logprob), 6) AS worst_logprob
        FROM tiled GROUP BY tier
    """,
    "q93_corpus_shuffle_shards": _Q93_SQL,
    "q92_pii_redact": f"""
        WITH seeded AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {PII_MOD} = 0
                        THEN text || ' contact: user'
                             || CAST(doc_id AS VARCHAR)
                             || '@example.com or 555-867-5309'
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               {_PII_REDACT_SQL} AS clean_text,
               CAST({_PII_COUNT_SQL} AS BIGINT) AS n_pii
        FROM seeded
    """,
    "q79_decontamination": f"""
        WITH g AS (
            SELECT doc_id,
                   unnest(list_distinct({O.grams('text', DECON_N)})) AS h
            FROM documents
        ), b AS (
            SELECT DISTINCT h FROM g WHERE doc_id % {DECON_MOD} = 0
        ), c AS (
            SELECT doc_id, h FROM g WHERE doc_id % {DECON_MOD} <> 0
        )
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM c JOIN b USING (h)
        GROUP BY c.doc_id
        HAVING COUNT(*) >= {DECON_MIN_SHARED}
    """,
    "q115_bpe_merges": None,  # filled below by _bpe_oracle_sql
    "q141_deletion_impact": f"""
        WITH erase AS (
            SELECT doc_id FROM documents WHERE doc_id % {ERASE_MOD} = 0
        ), fp AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(h) - 3, 1)),
                       i -> list_min(h[i:i+3])))) AS fp_hash
            FROM (
                SELECT doc_id,
                       list_transform({O.grams('text', 5)},
                                      g -> {O.md5h('g')}) AS h
                FROM documents
            )
        )
        SELECT 'documents' AS artifact,
               CAST((SELECT COUNT(*) FROM erase) AS BIGINT) AS n_rows_purged
        UNION ALL SELECT 'winnow_fingerprints',
               CAST((SELECT COUNT(*) FROM fp
                     WHERE fp.doc_id IN (SELECT doc_id FROM erase))
                    AS BIGINT)
        UNION ALL SELECT 'split_assignments',
               CAST((SELECT COUNT(*) FROM erase) AS BIGINT)
        UNION ALL SELECT 'passages',
               CAST((SELECT COALESCE(SUM(greatest(
                         CAST(ceil(len({_TOKS}) / {{pt}}.0) AS BIGINT), 1)), 0)
                     FROM documents
                     WHERE doc_id IN (SELECT doc_id FROM erase))
                    AS BIGINT)
    """.replace("{pt}", str(PASSAGE_TOKENS)),
    "q137_needle_insertion": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ), p AS (
            SELECT doc_id, tk, len(tk) AS nt,
                   ({O.md5h("'needle_' || CAST(doc_id AS VARCHAR)")} % 1000)
                       / 1000.0 AS frac
            FROM t
        ), q AS (
            SELECT doc_id, tk, nt, frac,
                   CAST(floor(frac * nt) AS INT) AS pos
            FROM p
        )
        SELECT doc_id,
               CAST(nt AS BIGINT) AS n_tokens,
               ROUND(frac, 3) AS depth_frac,
               pos AS needle_pos,
               array_to_string(
                   tk[1:pos] || ['XNEEDLEX'] || tk[pos+1:nt], ' ')
                   AS text_with_needle
        FROM q
    """,
    "q135_length_buckets": f"""
        WITH t AS (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), b AS (
            SELECT doc_id, n_tokens,
                   ntile({LEN_BUCKETS}) OVER (ORDER BY n_tokens, doc_id)
                       AS bucket
            FROM t
        ), g AS (
            SELECT MAX(n_tokens) AS gmax FROM t
        ), per AS (
            SELECT bucket, COUNT(*) AS n_docs,
                   MAX(n_tokens) AS max_tokens,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM b GROUP BY bucket
        )
        SELECT CAST(bucket AS INT) AS bucket, n_docs, max_tokens,
               total_tokens,
               ROUND((max_tokens * n_docs - total_tokens)
                     / (max_tokens * n_docs * 1.0), 6) AS pad_frac,
               ROUND((g.gmax * n_docs - total_tokens)
                     / (g.gmax * n_docs * 1.0), 6) AS naive_pad_frac
        FROM per CROSS JOIN g
    """,
    "q123_zipf_slope": f"""
        WITH v AS (
            SELECT w, COUNT(*) AS n
            FROM (SELECT unnest({_LOW_TOKS}) AS w FROM documents)
            GROUP BY w
        ), r AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rnk FROM v
        ), s AS (
            SELECT COUNT(*) AS m,
                   SUM(ln(rnk)) AS sx, SUM(ln(n)) AS sy,
                   SUM(ln(rnk) * ln(n)) AS sxy,
                   SUM(ln(rnk) * ln(rnk)) AS sxx
            FROM r
        )
        SELECT CAST(m AS BIGINT) AS n_terms,
               CASE WHEN m * sxx - sx * sx <> 0
                    THEN ROUND((m * sxy - sx * sy)
                               / (m * sxx - sx * sx), 6)
               END AS zipf_slope
        FROM s
    """,
    # Same semantics as the engine: stride-1 k-token windows, a
    # window is removable iff its text occurs in a SMALLER doc_id,
    # removable windows merge into spans (new span iff pos >= running
    # max prior pos + k), rebuild from uncovered tokens. The nested
    # list lambdas capture the outer position var (tested capability).
    "q142_dup_span_removal": f"""
        WITH toks AS (
            SELECT doc_id, {O.ws_tokens('text')} AS tk FROM documents
        ), wins AS (
            SELECT doc_id, CAST(p AS BIGINT) AS pos,
                   md5(array_to_string(tk[CAST(p AS INT) + 1 :
                                          CAST(p AS INT) + {SPAN_WINDOW}],
                                       ' ')) AS h
            FROM toks,
                 UNNEST(range(greatest(len(tk) - {SPAN_WINDOW} + 1, 0)))
                     AS u(p)
        ), firsts AS (
            SELECT h, min(doc_id) AS fd FROM wins GROUP BY h
        ), rem AS (
            SELECT w.doc_id, w.pos
            FROM wins w JOIN firsts f ON w.h = f.h
            WHERE w.doc_id > f.fd
        ), flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN max(pos) OVER prior IS NULL
                             OR pos >= max(pos) OVER prior + {SPAN_WINDOW}
                        THEN 1 ELSE 0 END AS new_span
            FROM rem
            WINDOW prior AS (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
        ), islands AS (
            SELECT doc_id, pos,
                   SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS isl
            FROM flagged
        ), spans AS (
            SELECT doc_id, isl,
                   CAST(min(pos) AS BIGINT) AS s,
                   CAST(max(pos) + {SPAN_WINDOW} AS BIGINT) AS e
            FROM islands GROUP BY doc_id, isl
        ), per_doc AS (
            SELECT doc_id,
                   list_sort(list({{'s': s, 'e': e}})) AS isl_list
            FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(
                   (SELECT SUM(e - s) FROM spans sp
                    WHERE sp.doc_id = t.doc_id), 0) AS BIGINT)
                   AS n_removed,
               coalesce(array_to_string(
                   list_transform(
                       list_filter(
                           range(len(t.tk)),
                           p -> len(list_filter(
                                    coalesce(p2.isl_list, []),
                                    sp -> p >= sp.s AND p < sp.e)) = 0
                       ),
                       p -> t.tk[p + 1]
                   ), ' '), '') AS clean_text
        FROM toks t LEFT JOIN per_doc p2 ON t.doc_id = p2.doc_id
    """,
    "q127_gram_compression_proxy": f"""
        WITH g AS (
            SELECT doc_id, {O.grams('text', _PROXY_GRAM_N)} AS gs
            FROM documents
        )
        SELECT doc_id,
               CAST(len(gs) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct_grams,
               ROUND(len(list_distinct(gs)) * 1.0 / len(gs), 6)
                   AS distinct_ratio
        FROM g
    """,
    "q124_span_pairs": f"""
        WITH t AS (
            SELECT doc_id, {_LOW_TOKS} AS tk FROM documents
        ), e AS (
            SELECT doc_id, tk, len(tk) AS nt FROM t
            WHERE len(tk) >= 32
        ), o AS (
            SELECT doc_id, tk,
                   16 + {O.md5h("'span_' || CAST(doc_id AS VARCHAR)")}
                       % (nt - 32 + 1) AS off
            FROM e
        )
        SELECT doc_id,
               array_to_string(tk[1:16], ' ') AS span_a,
               array_to_string(tk[off + 1 : off + 16], ' ') AS span_b,
               CAST(off AS BIGINT) AS b_offset
        FROM o
    """,
    "q122_split_leakage": f"""
        WITH f AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(h) - 3, 1)),
                       i -> list_min(h[i:i+3])))) AS fp_hash
            FROM (
                SELECT doc_id,
                       list_transform({O.grams('text', 5)},
                                      g -> {O.md5h('g')}) AS h
                FROM documents
            )
        ), s AS (
            SELECT doc_id,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id,
                       {O.md5h("'split_' || CAST(doc_id AS VARCHAR)")} % 100 AS b
                FROM documents
            )
        ), rare AS (
            SELECT fp_hash FROM f GROUP BY fp_hash
            HAVING COUNT(*) <= {LEAK_MAX_FP_DOCS}
        ), j AS (
            SELECT f.doc_id, f.fp_hash, s.split
            FROM f
            JOIN rare r ON f.fp_hash = r.fp_hash
            JOIN s ON f.doc_id = s.doc_id
        ), p AS (
            SELECT DISTINCT
                   least(a.split, b.split) AS split_1,
                   greatest(a.split, b.split) AS split_2,
                   a.doc_id AS d1, b.doc_id AS d2
            FROM j a JOIN j b
              ON a.fp_hash = b.fp_hash
             AND a.doc_id < b.doc_id
             AND a.split <> b.split
        )
        SELECT split_1, split_2, COUNT(*) AS n_leaky_pairs
        FROM p GROUP BY split_1, split_2
    """,
    "q120_blocklist_filter": f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(
                       translate(lower(text), '{LEET_FROM_SQL}', 'oalessat'),
                       '{O.WS}+'), x -> x <> '') AS tk
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(list_filter(tk,
                       x -> list_contains({BL_SQL}, x))) AS BIGINT)
                       AS n_matches,
                   COALESCE(array_to_string(list_sort(list_intersect(
                       list_distinct(tk), {BL_SQL})), ','), '') AS matched
            FROM t
        )
        SELECT doc_id, n_matches, matched, n_matches = 0 AS keep FROM m
    """,
    "q118_kneser_ney_scores": f"""
        WITH t AS (
            SELECT doc_id, {_LOW_TOKS} AS tk FROM documents
        ), bg AS (
            SELECT doc_id, tk[i.i] AS w1, tk[i.i + 1] AS w2
            FROM t, unnest(generate_series(1, len(tk) - 1)) AS i(i)
        ), bc AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
        ), fw AS (
            SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p_fw
            FROM bc GROUP BY w1
        ), bw AS (
            SELECT w2, COUNT(*) AS n1p_bw FROM bc GROUP BY w2
        ), ty AS (
            SELECT COUNT(*) AS n_types FROM bc
        ), model AS (
            SELECT bc.w1, bc.w2,
                   ln(greatest(bc.c12 - {KN_DISCOUNT}, 0.0) / fw.c1
                      + ({KN_DISCOUNT} * fw.n1p_fw / fw.c1)
                        * (bw.n1p_bw / ty.n_types)) AS logp
            FROM bc
            JOIN fw ON bc.w1 = fw.w1
            JOIN bw ON bc.w2 = bw.w2
            CROSS JOIN ty
        ), s AS (
            SELECT bg.doc_id, ROUND(AVG(m.logp), 6) AS mean_kn_logprob
            FROM bg JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
            GROUP BY bg.doc_id
        )
        SELECT d.doc_id, s.mean_kn_logprob
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    "q114_source_quality_calibration": f"""
        WITH s AS (
            SELECT doc_id, source, {{quality}} AS quality FROM documents
        ), c AS (
            SELECT doc_id, source, quality,
                   ROUND(percent_rank() OVER (PARTITION BY source
                                              ORDER BY quality), 6)
                       AS calibrated
            FROM s
        )
        SELECT doc_id, source, quality, calibrated,
               calibrated >= 1.0 - {CALIB_KEEP_FRAC} AS keep
        FROM c
    """.format(quality=_QUALITY_SQL),
    # q113 is q79 with a Bloom-prefilter engine path; the composed
    # result is exact (no false negatives + equality verify join), so
    # the exact formulation IS its oracle — same sharing as q96/q42.
    "q113_bloom_decontamination": f"""
        WITH g AS (
            SELECT doc_id,
                   unnest(list_distinct({O.grams('text', DECON_N)})) AS h
            FROM documents
        ), b AS (
            SELECT DISTINCT h FROM g WHERE doc_id % {DECON_MOD} = 0
        ), c AS (
            SELECT doc_id, h FROM g WHERE doc_id % {DECON_MOD} <> 0
        )
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM c JOIN b USING (h)
        GROUP BY c.doc_id
        HAVING COUNT(*) >= {DECON_MIN_SHARED}
    """,
    # q236: the self-sizing arithmetic replayed exactly — the pow2
    # rule is pure integer/string ops (1 << length(bin(y-1))), so no
    # float-literal portability caveat applies
    "q236_decon_bitmap_sizing": f"""
        WITH g AS (
            SELECT DISTINCT gram FROM (
                SELECT unnest({O.grams('text', DECON_N)}) AS gram
                FROM documents WHERE doc_id % {DECON_MOD} = 0
            )
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_bench_grams FROM g
        ), s AS (
            SELECT n_bench_grams,
                   greatest(CAST({1 << 20} AS BIGINT),
                            CAST(1 AS BIGINT) << length(bin(
                                greatest(n_bench_grams * 10,
                                         CAST(2 AS BIGINT)) - 1)))
                       AS n_bits
            FROM n
        )
        SELECT n_bench_grams, n_bits,
               round(CAST(n_bits AS DOUBLE)
                     / CAST(greatest(n_bench_grams, 1) AS DOUBLE), 6)
                   AS bits_per_gram
        FROM s
    """,
    "q80_repetition_signals": f"""
        SELECT doc_id,
               CASE WHEN len(toks) > 0 THEN
                   ROUND(CAST(len(list_distinct(toks)) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE), 6) END AS ttr,
               CASE WHEN len(toks) > 1 THEN
                   ROUND(CAST(list_max(list_transform(list_distinct(bgs),
                             g -> len(list_filter(bgs, x -> x = g))))
                             AS DOUBLE)
                         / CAST(len(bgs) AS DOUBLE), 6) END
                   AS top_bigram_frac
        FROM (
            SELECT doc_id, {_LOW_TOKS} AS toks,
                   list_transform(
                       generate_series(1, len({_LOW_TOKS}) - 1),
                       i -> {_LOW_TOKS}[i] || ' ' || {_LOW_TOKS}[i+1]) AS bgs
            FROM documents
        )
    """,
    "q140_group_weighted_sample": f"""
        WITH keyed AS (
            SELECT doc_id, lang, ROUND(pow(u, 1.0 / q), 6) AS sample_key
            FROM (
                SELECT doc_id, lang,
                       ({O.md5h("'ws_' || CAST(doc_id AS VARCHAR)")} + 1.0)
                           / 4294967297.0 AS u,
                       {_QUALITY_SQL} AS q
                FROM documents
            )
        ), ranked AS (
            SELECT lang, doc_id, sample_key,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY sample_key DESC, doc_id) AS rnk
            FROM keyed
        )
        SELECT lang, CAST(rnk AS INT) AS rnk, doc_id, sample_key
        FROM ranked WHERE rnk <= {GROUP_WSAMPLE_K}
    """,
    "q82_weighted_sample": f"""
        SELECT doc_id, ROUND(pow(u, 1.0 / q), 6) AS sample_key
        FROM (
            SELECT doc_id,
                   ({O.md5h("'ws_' || CAST(doc_id AS VARCHAR)")} + 1.0)
                       / 4294967297.0 AS u,
                   {_QUALITY_SQL} AS q
            FROM documents
        )
        ORDER BY sample_key DESC, doc_id
        LIMIT {WSAMPLE_K}
    """,
    "q149_sft_render": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ), parts AS (
            SELECT doc_id,
                   len(tk) AS nt,
                   array_to_string(tk[1:{SFT_PROMPT_TOKENS}], ' ') AS p,
                   array_to_string(tk[{SFT_PROMPT_TOKENS} + 1:len(tk)], ' ')
                       AS r
            FROM t WHERE len(tk) > {SFT_PROMPT_TOKENS}
        )
        SELECT doc_id,
               '<|user|>' || p || '<|assistant|>' || r || '<|end|>'
                   AS rendered,
               CAST(8 + length(p) + 13 AS BIGINT) AS resp_char_start,
               CAST(8 + length(p) + 13 + length(r) AS BIGINT)
                   AS resp_char_end,
               CAST({SFT_PROMPT_TOKENS} AS BIGINT) AS n_prompt_tokens,
               CAST(nt - {SFT_PROMPT_TOKENS} AS BIGINT)
                   AS n_response_tokens
        FROM parts
    """,
    "q148_html_extract": f"""
        WITH h AS (
            SELECT doc_id,
                   '<html><head><title>' || source
                   || '</title><script type="text/javascript">var id = '
                   || CAST(doc_id AS VARCHAR)
                   || ';</script><style>p {{ margin: 0; }}</style></head>'
                   || '<body><!-- doc ' || CAST(doc_id AS VARCHAR)
                   || ' --><p>' || text
                   || '</p><div>&amp; &lt;footer&gt;</div></body></html>'
                       AS html
            FROM documents
        )
        SELECT doc_id,
               {O.html_to_text('html')} AS extracted,
               CAST(length({O.html_to_text('html')}) AS BIGINT)
                   AS n_chars_extracted
        FROM h
    """,
    # The engine hashes grams (xxhash64, internal compression only —
    # two-hash policy, text.gram_hash64); the oracle counts RAW
    # distinct grams, so only counts/ratios cross the compare.
    "q144_novelty_scores": f"""
        WITH g AS (
            SELECT doc_id,
                   unnest(list_distinct({O.grams('text', NOVELTY_GRAM_N)}))
                       AS gr
            FROM documents
        ), firsts AS (
            SELECT gr, min(doc_id) AS fd FROM g GROUP BY gr
        )
        SELECT a.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN a.doc_id = f.fd THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               ROUND(SUM(CASE WHEN a.doc_id = f.fd THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) AS novelty
        FROM g a JOIN firsts f ON a.gr = f.gr
        GROUP BY a.doc_id
    """,
    # Same bit-stable weight math as the engine: integer sqrt of each
    # source's token total, integer DIV for the target — no float
    # summation order anywhere.
    "q143_temperature_mix": f"""
        WITH ann AS (
            SELECT doc_id, source,
                   {_QUALITY_SQL} AS quality,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), totals AS (
            SELECT source,
                   CAST(floor(sqrt(SUM(n_tokens))) AS BIGINT) AS isq
            FROM ann GROUP BY source
        ), grand AS (
            SELECT SUM(isq) AS isq_sum FROM totals
        ), targets AS (
            SELECT source,
                   CAST({TEMP_MIX_BUDGET} * isq // isq_sum AS BIGINT)
                       AS target_tokens
            FROM totals, grand
        ), w AS (
            SELECT a.doc_id, a.source, a.quality, a.n_tokens,
                   t.target_tokens,
                   CAST(SUM(a.n_tokens) OVER (PARTITION BY a.source
                       ORDER BY a.quality DESC, a.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - a.n_tokens AS BIGINT) AS taken_before
            FROM ann a JOIN targets t ON a.source = t.source
        )
        SELECT doc_id, source, quality, n_tokens, taken_before,
               target_tokens
        FROM w WHERE taken_before < target_tokens
    """,
    "q90_token_budget_mix": f"""
        WITH ann AS (
            SELECT doc_id, source,
                   {_QUALITY_SQL} AS quality,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), w AS (
            SELECT doc_id, source, quality, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS BIGINT) AS taken_before
            FROM ann
        )
        SELECT doc_id, source, quality, n_tokens, taken_before
        FROM w WHERE taken_before < {MIX_BUDGET}
    """,
    "q89_chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ), c AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(0,
                           CAST(greatest(ceil((len(tk) - {CHUNK_OVERLAP})
                                / {CHUNK_TOKENS - CHUNK_OVERLAP}.0), 1)
                               AS BIGINT) - 1),
                       i -> struct_pack(
                           chunk_idx := i,
                           chunk_text := array_to_string(
                               tk[i*{CHUNK_TOKENS - CHUNK_OVERLAP}+1 :
                                  i*{CHUNK_TOKENS - CHUNK_OVERLAP}+{CHUNK_TOKENS}],
                               ' '),
                           chunk_n := least(len(tk)
                                - i*{CHUNK_TOKENS - CHUNK_OVERLAP},
                                {CHUNK_TOKENS}))
                   )) AS ch
            FROM t WHERE len(tk) > 0
        )
        SELECT doc_id,
               ch.chunk_idx AS chunk_idx,
               ch.chunk_text AS chunk_text,
               CAST(ch.chunk_n AS BIGINT) AS chunk_n_tokens
        FROM c
    """,
    "q101_passage_dedup": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ), p AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(0,
                           CAST(greatest(ceil(len(tk) / {PASSAGE_TOKENS}.0), 1)
                               AS BIGINT) - 1),
                       i -> struct_pack(
                           idx := i,
                           passage := array_to_string(
                               tk[i*{PASSAGE_TOKENS}+1 : (i+1)*{PASSAGE_TOKENS}],
                               ' '))
                   )) AS ps
            FROM t
        ), ranked AS (
            SELECT doc_id, ps.idx AS idx, ps.passage AS passage,
                   row_number() OVER (PARTITION BY ps.passage
                                      ORDER BY doc_id, ps.idx) AS rn
            FROM p
        )
        SELECT doc_id,
               COALESCE(string_agg(passage, ' ' ORDER BY idx)
                            FILTER (rn = 1), '') AS clean_text,
               COUNT(*) AS n_passages,
               CAST(COUNT(*) FILTER (rn > 1) AS BIGINT) AS n_dropped
        FROM ranked
        GROUP BY doc_id
    """,
    "q110_boilerplate_removal": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ), p AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(0,
                           CAST(greatest(ceil(len(tk) / {PASSAGE_TOKENS}.0), 1)
                               AS BIGINT) - 1),
                       i -> struct_pack(
                           idx := i,
                           passage := array_to_string(
                               tk[i*{PASSAGE_TOKENS}+1 : (i+1)*{PASSAGE_TOKENS}],
                               ' '))
                   )) AS ps
            FROM t
        ), pp AS (
            SELECT doc_id, ps.idx AS idx, ps.passage AS passage FROM p
        ), boiler AS (
            SELECT passage FROM pp
            GROUP BY passage
            HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
        ), marked AS (
            SELECT pp.doc_id, pp.idx, pp.passage,
                   b.passage IS NOT NULL AS is_boiler
            FROM pp LEFT JOIN boiler b ON pp.passage = b.passage
        )
        SELECT doc_id,
               COALESCE(string_agg(passage, ' ' ORDER BY idx)
                            FILTER (NOT is_boiler), '') AS clean_text,
               COUNT(*) AS n_passages,
               CAST(COUNT(*) FILTER (is_boiler) AS BIGINT) AS n_dropped
        FROM marked
        GROUP BY doc_id
    """,
    "q87_sequence_pack": f"""
        WITH t AS (
            SELECT doc_id,
                   {O.md5h("'pack_' || CAST(doc_id AS VARCHAR)")}
                       % {PACK_SHARDS} AS shard,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), w AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS BIGINT) AS start_offset
            FROM t
        )
        SELECT doc_id, shard, n_tokens, start_offset,
               CAST(floor(start_offset / {PACK_CTX}.0) AS BIGINT) AS pack_idx
        FROM w
    """,
    "q88_pack_utilization": f"""
        WITH t AS (
            SELECT doc_id,
                   {O.md5h("'pack_' || CAST(doc_id AS VARCHAR)")}
                       % {PACK_SHARDS} AS shard,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), s AS (
            SELECT shard, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM t GROUP BY shard
        )
        SELECT shard, n_docs, total_tokens,
               CAST(ceil(total_tokens / {PACK_CTX}.0) AS BIGINT) AS n_windows,
               ROUND(
                   CAST(CAST(ceil(total_tokens / {PACK_CTX}.0) AS BIGINT)
                        * {PACK_CTX} - total_tokens AS DOUBLE)
                   / CAST(CAST(ceil(total_tokens / {PACK_CTX}.0) AS BIGINT)
                        * {PACK_CTX} AS DOUBLE),
               6) AS pad_frac
        FROM s
    """,
    "q83_top_bigrams": f"""
        WITH t AS (
            SELECT {_LOW_TOKS} AS tk FROM documents
        ), g AS (
            SELECT unnest(list_transform(
                       generate_series(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1])) AS ngram
            FROM t WHERE len(tk) >= 2
        )
        SELECT ngram, COUNT(*) AS n_occurrences
        FROM g GROUP BY 1
        ORDER BY n_occurrences DESC, ngram
        LIMIT {TOP_NGRAM_K}
    """,
}


def _bpe_cte_chain(n_merges: int, with_final_vocab: bool) -> list:
    """Unrolled BPE training as static SQL CTE layers: per merge,
    pair counts -> top-1 -> list_reduce greedy re-merge, mirroring
    operators.text.bpe_merge_steps exactly — including the greedy
    left-to-right merge (list_reduce's running accumulator is the
    U+001F-joined symbol string; its last element is checked with an
    exact ends_with because symbols never contain the separator).
    ``with_final_vocab`` also materializes w{n_merges}, the vocab
    after ALL merges (the apply-BPE chain needs it; the merge-table
    query does not)."""
    ctes = [
        f"""w0 AS (
            SELECT w, COUNT(*) AS cnt, string_split(w, '') AS syms
            FROM (SELECT unnest({_LOW_TOKS}) AS w FROM documents)
            GROUP BY w
        )"""
    ]
    for i in range(n_merges):
        ctes.append(
            f"""p{i} AS (
            SELECT l, r, SUM(cnt) AS pc FROM (
                SELECT w.cnt, w.syms[t.pi] AS l, w.syms[t.pi + 1] AS r
                FROM w{i} w,
                     unnest(generate_series(1, len(w.syms) - 1)) AS t(pi)
            ) GROUP BY l, r
        )"""
        )
        ctes.append(
            f"""b{i} AS (
            SELECT l, r, pc FROM p{i} ORDER BY pc DESC, l, r LIMIT 1
        )"""
        )
        if i + 1 < n_merges or with_final_vocab:
            ctes.append(
                f"""w{i + 1} AS (
            SELECT w.w, w.cnt,
                   string_split(
                       list_reduce(w.syms, (acc, s) -> CASE
                           WHEN (acc = b.l
                                 OR ends_with(acc, chr(31) || b.l))
                                AND s = b.r
                           THEN substr(acc, 1,
                                       length(acc) - length(b.l))
                                || b.l || b.r
                           ELSE acc || chr(31) || s END),
                       chr(31)) AS syms
            FROM w{i} w CROSS JOIN b{i} b
        )"""
            )
    return ctes


def _bpe_oracle_sql(n_merges: int) -> str:
    ctes = _bpe_cte_chain(n_merges, with_final_vocab=False)
    selects = [
        f"SELECT CAST({i} AS INT) AS step, l AS merge_left, "
        f"r AS merge_right, CAST(pc AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    ]
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + "\n        "
        + "\n        UNION ALL ".join(selects)
    )


def _bpe_apply_oracle_sql(n_merges: int) -> str:
    """apply_bpe oracle: train the same merge chain, then re-join
    every document's tokens against the final vocab's symbol counts."""
    ctes = _bpe_cte_chain(n_merges, with_final_vocab=True)
    ctes.append(
        f"""tok AS (
            SELECT doc_id, unnest({_LOW_TOKS}) AS w FROM documents
        )"""
    )
    ctes.append(
        f"""agg AS (
            SELECT t.doc_id, COUNT(*) AS n_ws, SUM(len(v.syms)) AS n_bpe
            FROM tok t JOIN w{n_merges} v ON t.w = v.w
            GROUP BY t.doc_id
        )"""
    )
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + """
        SELECT d.doc_id,
               CAST(COALESCE(a.n_ws, 0) AS BIGINT) AS n_ws_tokens,
               CAST(COALESCE(a.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """
    )


ORACLES["q115_bpe_merges"] = _bpe_oracle_sql(BPE_MERGES)
ORACLES["q116_bpe_tokenize"] = _bpe_apply_oracle_sql(BPE_MERGES)


def _unigram_cte_chain(vocab_size: int, rounds: int) -> str:
    """The unigram-LM trainer unrolled as DuckDB CTE layers — the
    exact program of operators.text.unigram_lm_train: word histogram
    -> span grid -> Laplace seed -> per round (pivot lp columns ->
    12 DP layers -> 12 backtrace layers -> counts -> refresh).
    Every DP/backtrace layer is AS MATERIALIZED: best_e is referenced
    by up to 4 later candidates plus the back CASE, and DuckDB's
    default CTE inlining would re-expand the whole prefix per
    reference (the r10 graph-oracle lesson); the layers are
    |distinct words| rows, so materializing all of them is free.
    Ends with cnt{rounds} (final Viterbi counts) and v{rounds - 1}
    (the final vocabulary) in scope."""
    from ulh_etl_spark.operators.text import (
        _UNI_L,
        _UNI_SPAN_COMBOS,
        _UNI_W,
    )

    combos_sql = ", ".join(f"({s}, {e})" for s, e in _UNI_SPAN_COMBOS)
    ctes = [
        f"""wh AS MATERIALIZED (
            SELECT w, COUNT(*) AS cnt, substr(w, 1, {_UNI_W}) AS wt,
                   least(length(w), {_UNI_W}) AS n
            FROM (SELECT unnest({_LOW_TOKS}) AS w FROM documents)
            GROUP BY w
        )""",
        f"""sp AS MATERIALIZED (
            SELECT wh.w, wh.cnt, wh.wt, wh.n, sv.s, sv.e,
                   substr(wh.wt, sv.s + 1, sv.e - sv.s) AS piece
            FROM wh, (VALUES {combos_sql}) AS sv(s, e)
            WHERE sv.e <= wh.n
        )""",
        """c0 AS (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c
            FROM sp GROUP BY piece
        )""",
        f"""seed AS MATERIALIZED (
            SELECT piece, c FROM c0 WHERE length(piece) = 1
            UNION ALL
            SELECT piece, c FROM (
                SELECT piece, c FROM c0 WHERE length(piece) >= 2
                ORDER BY c DESC, piece LIMIT {vocab_size}
            ) AS tm
        )""",
        """v0 AS MATERIALIZED (
            SELECT piece, c,
                   ln(CAST(c + 1 AS DOUBLE)
                      / CAST(t._t + t._v AS DOUBLE)) AS logp
            FROM seed CROSS JOIN (
                SELECT CAST(SUM(c) AS BIGINT) AS _t,
                       CAST(COUNT(*) AS BIGINT) AS _v FROM seed) t
        )""",
        """chars AS MATERIALIZED (
            SELECT DISTINCT piece FROM sp WHERE length(piece) = 1
        )""",
    ]
    back_list = "list_value(" + ", ".join(
        f"back_{e}" for e in range(1, _UNI_W + 1)
    ) + ")"
    pc_list = "[" + ", ".join(
        f"pc_{i}" for i in range(1, _UNI_W + 1)
    ) + "]"
    for r in range(1, rounds + 1):
        lp_cols = ",\n                   ".join(
            f"MAX(CASE WHEN sp.s = {s} AND sp.e = {e} "
            f"THEN v.logp END) AS lp_{s}_{e}"
            for s, e in _UNI_SPAN_COMBOS
        )
        ctes.append(
            f"""g{r} AS MATERIALIZED (
            SELECT sp.w, sp.cnt, sp.wt, sp.n,
                   {lp_cols}
            FROM sp JOIN v{r - 1} v ON sp.piece = v.piece
            GROUP BY sp.w, sp.cnt, sp.wt, sp.n
        )"""
        )
        prev = f"g{r}"
        for e in range(1, _UNI_W + 1):
            cands = []
            for s in range(max(0, e - _UNI_L), e):
                base = "0.0" if s == 0 else f"best_{s}"
                cands.append(f"({base} + lp_{s}_{e})")
            best = (
                cands[0]
                if len(cands) == 1
                else "greatest(" + ", ".join(cands) + ")"
            )
            whens = " ".join(
                f"WHEN {cand} = best_{e} THEN {s}"
                for cand, s in zip(
                    cands, range(max(0, e - _UNI_L), e)
                )
            )
            ctes.append(
                f"""d{r}_{e} AS MATERIALIZED (
            SELECT *, {best} AS best_{e},
                   CAST(CASE {whens} END AS INT) AS back_{e}
            FROM {prev}
        )"""
            )
            prev = f"d{r}_{e}"
        ctes.append(
            f"""bt{r}_0 AS (
            SELECT *, CAST(n AS INT) AS pos_0 FROM d{r}_{_UNI_W}
        )"""
        )
        for i in range(1, _UNI_W + 1):
            ctes.append(
                f"""bt{r}_{i} AS MATERIALIZED (
            SELECT *,
                   CASE WHEN pos_{i - 1} > 0
                        THEN {back_list}[pos_{i - 1}] END AS s_{i},
                   CASE WHEN pos_{i - 1} > 0
                        THEN substr(wt, s_{i} + 1, pos_{i - 1} - s_{i})
                   END AS pc_{i},
                   CAST(CASE WHEN pos_{i - 1} > 0 THEN s_{i}
                             ELSE pos_{i - 1} END AS INT) AS pos_{i}
            FROM bt{r}_{i - 1}
        )"""
            )
        ctes.append(
            f"""cnt{r} AS MATERIALIZED (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM (
                SELECT cnt,
                       unnest(list_filter({pc_list},
                              x -> x IS NOT NULL)) AS piece
                FROM bt{r}_{_UNI_W}
            ) GROUP BY piece
        )"""
        )
        if r < rounds:
            ctes.append(
                f"""b{r} AS MATERIALIZED (
            SELECT COALESCE(cn.piece, ch.piece) AS piece,
                   CAST(COALESCE(cn.c, 0) AS BIGINT) AS c
            FROM cnt{r} cn FULL OUTER JOIN chars ch
              ON cn.piece = ch.piece
        )"""
            )
            ctes.append(
                f"""v{r} AS MATERIALIZED (
            SELECT piece, c,
                   ln(CAST(c + 1 AS DOUBLE)
                      / CAST(t._t + t._v AS DOUBLE)) AS logp
            FROM b{r} CROSS JOIN (
                SELECT CAST(SUM(c) AS BIGINT) AS _t,
                       CAST(COUNT(*) AS BIGINT) AS _v FROM b{r}) t
        )"""
            )
    return "WITH " + ",\n        ".join(ctes)


def _unigram_vocab_oracle_sql(vocab_size: int, rounds: int) -> str:
    chain = _unigram_cte_chain(vocab_size, rounds)
    return f"""
        {chain}
        SELECT v.piece, CAST(length(v.piece) AS INT) AS piece_len,
               CAST(COALESCE(c2.c, 0) AS BIGINT) AS viterbi_count,
               ROUND(v.logp, 6) AS logp
        FROM v{rounds - 1} v LEFT JOIN cnt{rounds} c2
          ON v.piece = c2.piece
    """


def _unigram_fertility_oracle_sql(vocab_size: int, rounds: int) -> str:
    from ulh_etl_spark.operators.text import _UNI_W

    chain = _unigram_cte_chain(vocab_size, rounds)
    pc_list = "[" + ", ".join(
        f"pc_{i}" for i in range(1, _UNI_W + 1)
    ) + "]"
    return f"""
        {chain},
        pw AS (
            SELECT w, CAST(len(list_filter({pc_list},
                           x -> x IS NOT NULL)) AS BIGINT) AS np
            FROM bt{rounds}_{_UNI_W}
        ), tok AS (
            SELECT doc_id, unnest({_LOW_TOKS}) AS w FROM documents
        ), agg AS (
            SELECT t.doc_id, COUNT(*) AS ws, SUM(p.np) AS uni
            FROM tok t JOIN pw p ON t.w = p.w GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.ws, 0) AS BIGINT) AS n_ws_tokens,
               CAST(COALESCE(a.uni, 0) AS BIGINT) AS n_unigram_tokens
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """


ORACLES["q190_unigram_vocab"] = _unigram_vocab_oracle_sql(
    UNI_VOCAB, UNI_ROUNDS
)
ORACLES["q191_unigram_fertility"] = _unigram_fertility_oracle_sql(
    UNI_VOCAB, UNI_ROUNDS
)


ORACLES["q195_char_entropy"] = """
        WITH ch AS (
            SELECT doc_id, u.c AS ch
            FROM documents, unnest(string_split(text, '')) AS u(c)
            WHERE u.c <> ''
        ), cnts AS (
            SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
            FROM ch GROUP BY doc_id, ch
        ), per AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                   list_sum(list_transform(
                       list({'ch': ch, 'c': c} ORDER BY ch, c),
                       s -> CAST(s.c AS DOUBLE)
                            * log2(CAST(s.c AS DOUBLE)))) AS ts
            FROM cnts GROUP BY doc_id
        )
        SELECT d.doc_id, p.n AS n_chars_counted,
               ROUND(log2(CAST(p.n AS DOUBLE))
                     - p.ts / CAST(p.n AS DOUBLE), 6) AS entropy_bits
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""

_LB_PROBS_SQL = ", ".join(f"(CAST({p!r} AS DOUBLE))" for p in _LB_PROBS)

ORACLES["q196_length_batches"] = f"""
        WITH per AS MATERIALIZED (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), reg AS MATERIALIZED (
            SELECT CAST('0x' || substr(md5('qs_' ||
                        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h,
                   CAST(doc_id AS BIGINT) AS key,
                   CAST(n_tokens AS DOUBLE) AS value
            FROM per ORDER BY h, key LIMIT {_LB_SKETCH_K}
        ), m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m FROM reg
        ), ranked AS (
            SELECT value, row_number() OVER (ORDER BY value, key) AS r
            FROM reg
        ), probs(p) AS (
            VALUES {_LB_PROBS_SQL}
        ), est AS MATERIALIZED (
            SELECT pr.p, rk.value AS estimate
            FROM probs pr CROSS JOIN m
            JOIN ranked rk
              ON rk.r = greatest(CAST(ceil(pr.p * m.m) AS BIGINT), 1)
        ), b AS (
            SELECT per.doc_id, per.n_tokens,
                   CAST(SUM(CASE WHEN CAST(per.n_tokens AS DOUBLE)
                                      > e.estimate
                                 THEN 1 ELSE 0 END) AS INT) AS bucket
            FROM per CROSS JOIN est e
            GROUP BY per.doc_id, per.n_tokens
        )
        SELECT doc_id, n_tokens, bucket,
               CAST((row_number() OVER (PARTITION BY bucket
                                        ORDER BY doc_id) - 1)
                    // {_LB_BATCH} AS BIGINT) AS batch_id
        FROM b
"""

_HEAPS_FRACS_SQL = ", ".join(f"({f!r})" for f in _HEAPS_FRACS)
ORACLES["q225_heaps_vocab_growth"] = f"""
        WITH words AS MATERIALIZED (
            SELECT doc_id, unnest({O.ws_tokens('text')}) AS w
            FROM documents
        ), firsts AS (
            SELECT w, MIN(doc_id) AS first_id FROM words GROUP BY w
        ), dstats AS (
            SELECT doc_id, len({O.ws_tokens('text')}) AS ntok
            FROM documents
        ), fr(frac) AS (
            VALUES {{HEAPS_FRACS}}
        ), cps AS (
            SELECT fr.frac,
                   CAST(floor(mx.mx * fr.frac) AS BIGINT) AS thr
            FROM fr CROSS JOIN
                 (SELECT MAX(doc_id) AS mx FROM documents) mx
        ), types AS (
            SELECT c.frac, CAST(COUNT(*) AS BIGINT) AS n_types
            FROM firsts f JOIN cps c ON f.first_id <= c.thr
            GROUP BY c.frac
        ), toks AS (
            SELECT c.frac, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(d.ntok) AS BIGINT) AS n_tokens
            FROM dstats d JOIN cps c ON d.doc_id <= c.thr
            GROUP BY c.frac
        )
        SELECT t.frac, t.n_docs, t.n_tokens, y.n_types,
               round(y.n_types * 1.0 / t.n_tokens, 6) AS type_token_ratio
        FROM toks t JOIN types y ON t.frac = y.frac
""".replace("{HEAPS_FRACS}", _HEAPS_FRACS_SQL)

ORACLES["q229_simpson_lexical_diversity"] = f"""
        WITH wc AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT source, unnest({O.ws_tokens('text')}) AS w
                FROM documents
            ) GROUP BY source, w
        ), per AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c * (c - 1)) AS BIGINT) AS rep
            FROM wc GROUP BY source
        )
        SELECT source, n_tokens, n_types,
               ROUND(CAST(rep AS DOUBLE)
                     / (CAST(n_tokens AS DOUBLE)
                        * CAST(n_tokens - 1 AS DOUBLE)), 6)
                   AS simpson_index,
               ROUND(1.0 - CAST(rep AS DOUBLE)
                     / (CAST(n_tokens AS DOUBLE)
                        * CAST(n_tokens - 1 AS DOUBLE)), 6) AS diversity
        FROM per
"""
