"""Tracked-persist registry (r11 ADVICE): operators whose persisted
intermediates ESCAPE the call register them in ulh_etl_spark.cache so
long-lived sessions can release them between queries."""

from pyspark.sql import functions as F

from ulh_etl_spark.cache import _TRACKED, release_persisted


def test_mutual_knn_edges_persist_is_tracked_and_releasable(spark):
    from ulh_etl_spark.operators.similarity import mutual_knn_edges

    release_persisted()  # start clean
    knn = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "vec_id int, neighbor_id int"
    )
    edges = mutual_knn_edges(knn)
    assert len(_TRACKED) == 1
    assert {(r.id1, r.id2) for r in edges.collect()} == {(1, 2)}
    assert release_persisted() == 1
    assert not _TRACKED
    # released frames recompute correctly on next use
    assert {(r.id1, r.id2) for r in edges.collect()} == {(1, 2)}


def test_release_is_safe_on_unmaterialized_frames(spark):
    from ulh_etl_spark.cache import track

    release_persisted()
    df = spark.range(10).persist()
    track(df)  # never materialized — release must still be a no-op
    assert release_persisted() == 1


def test_graph_and_dedup_builders_register_their_persists(spark):
    from ulh_etl_spark.operators.dedup import minhash_candidate_pairs
    from ulh_etl_spark.operators.graph import pagerank, triangle_stats

    release_persisted()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id1 int, id2 int"
    )
    # pagerank's adjacency is an eager localCheckpoint since r16 (a
    # leaf, not a cache-registry entry) — it must NOT leak registry
    # entries; triangle_stats still persists escaping deg/oriented
    # frames and must register them.
    pagerank(edges, iterations=1).collect()
    assert not _TRACKED
    triangle_stats(edges).collect()
    assert len(_TRACKED) >= 1
    n_after_graph = len(_TRACKED)

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(4)],
        "doc_id long, text string",
    )
    minhash_candidate_pairs(docs, "text", "doc_id").collect()
    assert len(_TRACKED) > n_after_graph
    assert release_persisted() >= 2
    assert not _TRACKED
