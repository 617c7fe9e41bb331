"""The flagship composition query: full training-corpus curation
(annotate -> quality filter -> exact dedup -> MinHash-LSH near-dedup
-> hash split) as ONE oracle-checked catalog entry. The oracle SQL is
the composition of the per-operator oracle fragments, so the
end-to-end pipeline — not just its pieces — is hash-verified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.curation import CurationConfig, curate
from ulh_etl_spark.queries.dedup import _BAND_SELECTS, _HS, _SIG_COLS
from ulh_etl_spark.queries.textops import _QUALITY_SQL
from ulh_etl_spark.queries import _oracle_fragments as O
from ulh_etl_spark.session import load_table

_MIN_QUALITY = 0.5
_ROWS_PER_BAND = 4  # matches the q36 band fragments


def q74_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation over ``documents``; emits the
    surviving docs with quality, token count, and split."""
    docs = load_table(spark, sf_dir, "documents")
    cfg = CurationConfig(
        min_quality=_MIN_QUALITY,
        near_dedup=True,
        minhash_rows_per_band=_ROWS_PER_BAND,
    )
    return curate(docs, cfg).select("doc_id", "quality", "n_tokens", "split")


_COV_K = 5
_COV_N = 8


def q219_greedy_coverage_picks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Submodular data selection: the greedy maximum-coverage pick of
    the 5 documents that together cover the most distinct 8-grams
    (operators.dedup.greedy_max_coverage — Nemhauser/Wolsey/Fisher's
    (1-1/e) greedy). The "most diverse k docs" primitive behind
    coreset selection and seed-set curation for training mixes; the
    oracle replays the identical k rounds as unrolled CTEs (integer
    gains, lowest-id ties), so every pick, gain, and running union
    size is hash-checked."""
    from ulh_etl_spark.operators.dedup import greedy_max_coverage

    docs = load_table(spark, sf_dir, "documents")
    return greedy_max_coverage(docs, "text", "doc_id", k=_COV_K, n=_COV_N)


def _q219_oracle_sql() -> str:
    rounds = []
    for i in range(2, _COV_K + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT doc_id FROM p{j}" for j in range(1, i)
        )
        rounds.append(f"""
        , p{i} AS (
            SELECT g.doc_id, COUNT(*) AS gain FROM g
            WHERE g.doc_id NOT IN ({prev_picks})
              AND g.h NOT IN (SELECT h FROM c{i - 1})
            GROUP BY 1 ORDER BY gain DESC, g.doc_id LIMIT 1
        ), c{i} AS (
            SELECT h FROM c{i - 1}
            UNION
            SELECT g.h FROM g JOIN p{i} ON g.doc_id = p{i}.doc_id
        )""")
        # c_i is a UNION (set) of covered grams — the running union
    picks_union = " UNION ALL ".join(
        f"SELECT {i} AS pick, doc_id, gain FROM p{i}"
        for i in range(1, _COV_K + 1)
    )
    return f"""
        WITH g AS MATERIALIZED (
            SELECT DISTINCT doc_id, h FROM (
                SELECT doc_id,
                       unnest(list_distinct({O.grams('text', _COV_N)}))
                           AS h
                FROM documents
            )
        ), p1 AS (
            SELECT doc_id, COUNT(*) AS gain FROM g
            GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1
        ), c1 AS (
            SELECT DISTINCT g.h FROM g JOIN p1 ON g.doc_id = p1.doc_id
        ){''.join(rounds)}
        SELECT CAST(pick AS INT) AS pick, doc_id,
               CAST(gain AS BIGINT) AS gain,
               CAST(SUM(gain) OVER (ORDER BY pick) AS BIGINT)
                   AS covered_total
        FROM ({picks_union})
    """


QUERIES = {
    "q74_curate_corpus": q74_curate_corpus,
    "q219_greedy_coverage_picks": q219_greedy_coverage_picks,
}

ORACLES = {
    "q219_greedy_coverage_picks": _q219_oracle_sql(),
    "q74_curate_corpus": f"""
        WITH ann AS (
            SELECT doc_id, text,
                   {_QUALITY_SQL} AS quality,
                   CAST(len({O.ws_tokens('text')}) AS BIGINT) AS n_tokens,
                   md5({O.norm_text('text')}) AS fp
            FROM documents
        ), kept AS (
            SELECT * FROM ann WHERE quality >= {_MIN_QUALITY}
        ), keepers AS (
            SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY fp
        ), k2 AS (
            SELECT kept.* FROM kept JOIN keepers USING (doc_id)
        ), hashed AS (
            SELECT doc_id, {_HS} AS hs FROM k2
        ), sigs AS (
            SELECT doc_id,
               {_SIG_COLS}
            FROM hashed
        ), bands AS (
{_BAND_SELECTS}
        ), drops AS (
            SELECT DISTINCT b.doc_id
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT k2.doc_id, k2.quality, k2.n_tokens,
               CASE WHEN {O.md5h("'split_' || CAST(k2.doc_id AS VARCHAR)")}
                         % 100 < 80 THEN 'train'
                    WHEN {O.md5h("'split_' || CAST(k2.doc_id AS VARCHAR)")}
                         % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM k2
        WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = k2.doc_id)
    """,
}
