"""Multimodal catalog queries: binary media columns synthesized
deterministically from ``documents`` (this container ships no real
image/audio corpora or codecs — SURVEY-scope), exercising the real
Spark plumbing: binary columns, JVM-side metadata, Arrow-batched
mapInPandas decode / frame-sample stages.

Media synthesis: ``content = magic_header(doc_id % 3) || utf8(text)``
— a PNG/JPEG/RIFF-tagged blob per document, expressible identically
in DuckDB (``'\\x..'::BLOB || encode(text)``) so every stage that can
be SQL-mirrored is oracle-checked.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulh_etl_spark.cache import track

from ulh_etl_spark.operators.multimodal import (
    decode_media,
    media_metadata,
    sample_frames,
)
from ulh_etl_spark.session import load_table

_HEADERS = [
    bytes([0x89]) + b"PNG",        # png
    bytes([0xFF, 0xD8, 0xFF, 0xE0]),  # jpeg
    b"RIFF",                        # riff (wav/avi)
]
_DUCK_HEADERS = [r"\x89PNG", r"\xFF\xD8\xFF\xE0", "RIFF"]


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (media_id, content binary) with per-doc format."""
    docs = load_table(spark, sf_dir, "documents")
    header = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_HEADERS[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_HEADERS[1]))
        .otherwise(F.lit(_HEADERS[2]))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode("text", "UTF-8")).alias("content"),
    )


_DUCK_MEDIA = f"""
        SELECT doc_id AS media_id,
               (CASE doc_id % 3
                    WHEN 0 THEN '{_DUCK_HEADERS[0]}'::BLOB
                    WHEN 1 THEN '{_DUCK_HEADERS[1]}'::BLOB
                    ELSE '{_DUCK_HEADERS[2]}'::BLOB
                END) || encode(text) AS content
        FROM documents
"""


def _portable_decoder(content: bytes) -> dict:
    """Image-decoder stand-in whose outputs are reproducible in SQL:
    features derive from md5 of the UPPERCASE HEX of the bytes
    (DuckDB's md5 only accepts VARCHAR, not BLOB)."""
    h = hashlib.md5(content.hex().upper().encode()).digest()
    return {
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "channels": 1 + (h[2] % 4),
    }


def q43_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media metadata — size + magic-byte format sniff,
    all JVM-side expressions over the binary column."""
    m = media_metadata(_media(spark, sf_dir), "content")
    return m.select("media_id", "size_bytes", "format")


def q44_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode: (id, bytes) -> typed
    width/height/channels. The portable fake kernel stands in for a
    codec; the Spark stage (batching, schema, pruned binary) is real."""
    return decode_media(
        _media(spark, sf_dir),
        decoder=_portable_decoder,
        out_fields="width int, height int, channels int",
    )


def q45_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-shaped explode via mapInPandas): one row
    per sampled frame, aggregated back to per-media frame counts —
    checks the fan-out row arithmetic end-to-end."""
    frames = sample_frames(_media(spark, sf_dir), every_nth=30, max_frames=8)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_idx").cast("int").alias("max_frame_idx"),
    )


def _portable_embedder(content: bytes) -> list:
    """8-dim pseudo-embedding reproducible in SQL: bytes of
    md5(upper-hex(content)) scaled to [0,1], unit-normalized. All
    arithmetic in doubles, NO rounding — the oracle runs the exact
    same double ops, so values (and downstream distance comparisons)
    are bit-identical."""
    h = hashlib.md5(content.hex().upper().encode()).hexdigest()
    vals = [int(h[2 * i: 2 * i + 2], 16) / 255.0 for i in range(8)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def q76_media_embed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal composition: media bytes -> Arrow-batched
    embedding stage (mapInPandas) -> IVF nearest-cell assignment
    (first 8 media as centroid seeds) — decode-to-ANN end to end,
    mirroring what a real image-embedding ingest does at scale
    (embed narrow-map, centroids broadcast, output written
    partitionBy(cell))."""
    from ulh_etl_spark.operators.multimodal import embed_media
    from ulh_etl_spark.operators.similarity import ivf_assign

    from pyspark.storagelevel import StorageLevel

    # persist: the embedding stage feeds BOTH the centroid seeds and
    # the assignment corpus — unpersisted, the mapInPandas decode+embed
    # (the expensive stage) would run twice
    emb = embed_media(
        _media(spark, sf_dir),
        dim=8,
        embedder=_portable_embedder,
        vec_type="double",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    track(emb)
    cents = emb.filter(F.col("media_id") < 8).select(
        F.col("media_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    assigned = ivf_assign(emb, cents, id_col="media_id")
    return assigned.select("media_id", "cell")


def q103_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-dup end to end: media bytes -> perceptual hash
    (real Arrow mapInPandas stage, portable hasher) -> banded LSH
    self-join -> exact Hamming verify. Near-dup structure is planted
    deterministically so the pipeline produces real pair volume:
    docs cluster in fours on ``doc_id // 4`` (cluster id IS the media
    content, so every member hashes to the cluster base), then member
    j > 0 flips bit j-1 JVM-side — every cluster yields C(4,2) pairs
    at hamming 1-2, all under max_hamming=3 < bands=4, where the
    pigeonhole guarantee makes banded recall total (so the oracle is
    the plain declarative all-pairs hamming join)."""
    from ulh_etl_spark.operators.multimodal import (
        media_phash,
        phash_neardup_pairs,
        portable_phash,
    )

    docs = load_table(spark, sf_dir, "documents")
    clustered = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.floor(F.col("doc_id") / 4).cast("string"), "UTF-8").alias(
            "content"
        ),
    )
    ph = media_phash(clustered, hasher=portable_phash)
    member = F.col("media_id") % 4
    flip = (
        F.when(member == 1, F.lit(1))
        .when(member == 2, F.lit(2))
        .when(member == 3, F.lit(4))
        .otherwise(F.lit(0))
    ).cast("long")
    ph = ph.withColumn("phash", F.col("phash").bitwiseXOR(flip))
    pairs = phash_neardup_pairs(ph)
    return pairs.select(
        "id1", "id2", F.col("hamming").cast("int").alias("hamming")
    )


def q105_phash_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual dedup report: the q103 perceptual-hash pair pipeline ->
    exact connected components -> one row per visual near-dup cluster
    (keep_id = min member, the survivor; n_members = copies to drop).
    The multimodal twin of q102's textual collapse — pairs, the
    iterative component fixpoint, and the final rollup in one
    composition."""
    from ulh_etl_spark.operators.dedup import connected_components

    pairs = q103_phash_neardup_pairs(spark, sf_dir)
    labels = connected_components(pairs)
    return labels.groupBy("component").agg(
        F.min("node").alias("keep_id"),
        F.count("*").alias("n_members"),
    )


def _portable_frame_extractor(content: bytes, idx: int) -> bytes:
    """Frame-bytes stand-in reproducible in SQL: ascii hexdigest of
    md5(upper-hex(content) + '_' + idx) — the same portability trick
    as _portable_embedder/_portable_decoder."""
    return (
        hashlib.md5(
            (content.hex().upper() + f"_{idx}").encode()
        ).hexdigest().encode()
    )


SCENE_THRESHOLD = 25


def q147_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup end to end with a REAL codec (the audio leg of
    the visual q103 / video q117 triad): docs cluster in fours; each
    doc synthesizes an ACTUAL PCM16 WAV whose 60-frame loud/quiet
    energy envelope encodes its cluster id (stdlib ``wave`` writer in
    an Arrow mapInPandas stage), the fingerprint stage DECODES the
    WAV (stdlib ``wave`` reader, operators.multimodal.
    audio_energy_fingerprint) and recovers the envelope bits, member
    j > 0 flips bit j-1 JVM-side, then banded LSH + exact Hamming
    pairs (phash_neardup_pairs is hash-agnostic; 60 bits / 4 bands
    with max_hamming 3 < bands makes banded recall total, so the
    oracle is the declarative all-pairs hamming join on the
    ARITHMETIC fingerprint — the cluster id the envelope encodes).

    60-bit width (was 16 through r9): a 16-bit space saturates — at
    sf1's ~50 K clusters, random fingerprints land within hamming 3
    of each other at rate C(16,<=3)/2^16 ~ 1%, burying the ~75 K
    planted pairs under ~13 M base-rate collisions, and the pair
    relation grew quadratically with corpus. At 60 bits the collision
    rate is C(60,<=3)/2^60 ~ 3e-14, so output ~= planted pairs at any
    reachable scale and pair volume grows linearly with the corpus."""
    import pandas as pd

    from ulh_etl_spark.operators.multimodal import (
        audio_energy_fingerprint,
        media_phash,
        phash_neardup_pairs,
    )

    from ulh_etl_spark.operators.text import md5_hash60

    # md5-scramble the cluster id into the 60 envelope bits —
    # sequential raw ids are hamming-close (cluster 6 vs 7 differ in
    # one bit), which would swamp the planted families with
    # neighboring-id pairs; scrambled fingerprints collide only at
    # the binomial base rate, exactly like q103's hashed content
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        md5_hash60(F.floor(F.col("doc_id") / 4).cast("string"))
        .alias("_cluster"),
    )

    def synth(batches):
        import numpy as np

        from ulh_etl_spark.operators.multimodal import encode_wav_pcm16

        sign = np.tile(np.array([1, -1], dtype=np.int64), 25)  # 50/frame
        for pdf in batches:
            content = []
            for c in pdf["_cluster"]:
                c = int(c)
                amps = np.array(
                    [20000 if (c >> bit) & 1 else 0 for bit in range(60)],
                    dtype=np.int64,
                )
                content.append(encode_wav_pcm16(np.outer(amps, sign).ravel()))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "content": content}
            )

    wavs = docs.mapInPandas(synth, "media_id long, content binary")
    fp = media_phash(
        wavs, hasher=lambda b: audio_energy_fingerprint(b, n_bits=60)
    )
    member = F.col("media_id") % 4
    flip = (
        F.when(member == 1, F.lit(1))
        .when(member == 2, F.lit(2))
        .when(member == 3, F.lit(4))
        .otherwise(F.lit(0))
    ).cast("long")
    fp = fp.withColumn("phash", F.col("phash").bitwiseXOR(flip))
    pairs = phash_neardup_pairs(fp, bits=60, bands=4, max_hamming=3)
    return pairs.select(
        "id1", "id2", F.col("hamming").cast("int").alias("hamming")
    )


def q117_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection end to end: media bytes ->
    sampled frames (Arrow mapInPandas explode) -> per-frame 60-bit
    portable phash (pure JVM md5/conv expression — the frame bytes
    die in this projection) -> per-media lag-window Hamming jumps
    above SCENE_THRESHOLD bits. Swap dhash_image in for real
    perceptual behavior; the portable hash exercises the identical
    plan."""
    from ulh_etl_spark.operators.multimodal import frame_scene_changes

    frames = sample_frames(
        _media(spark, sf_dir),
        every_nth=30,
        max_frames=8,
        frame_extractor=_portable_frame_extractor,
    )
    ph = frames.select(
        "media_id",
        "frame_idx",
        F.conv(
            F.substring(F.md5(F.upper(F.hex("frame"))), 1, 15), 16, 10
        )
        .cast("long")
        .alias("phash"),
    )
    return frame_scene_changes(ph, threshold=SCENE_THRESHOLD)


QUERIES = {
    "q43_media_metadata": q43_media_metadata,
    "q44_media_decode": q44_media_decode,
    "q45_frame_sample_counts": q45_frame_sample_counts,
    "q76_media_embed_cells": q76_media_embed_cells,
    "q103_phash_neardup_pairs": q103_phash_neardup_pairs,
    "q105_phash_neardup_clusters": q105_phash_neardup_clusters,
    "q117_scene_changes": q117_scene_changes,
    "q147_audio_neardup": q147_audio_neardup,
}

# Shared by the q103/q105 oracles: portable_phash arithmetic + member
# bit flips + the all-pairs hamming join (RECURSIVE is harmless for
# q103 and required by q105's closure).
_PHASH_PAIRS_CTE = """WITH RECURSIVE ph AS (
            SELECT doc_id AS media_id,
                   xor(
                       CAST('0x' || substr(md5(upper(hex(encode(
                           CAST(doc_id // 4 AS VARCHAR))))), 1, 15) AS BIGINT),
                       CASE doc_id % 4
                           WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4
                           ELSE 0
                       END::BIGINT
                   ) AS phash
            FROM documents
        ), ppairs AS (
            SELECT a.media_id AS id1, b.media_id AS id2,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM ph a JOIN ph b ON a.media_id < b.media_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 3
        )"""

ORACLES = {
    "q43_media_metadata": f"""
        WITH media AS ({_DUCK_MEDIA})
        SELECT media_id,
               octet_length(content) AS size_bytes,
               CASE
                   WHEN substr(upper(hex(content)), 1, 8) = '89504E47' THEN 'png'
                   WHEN substr(upper(hex(content)), 1, 8) = '52494646' THEN 'riff'
                   WHEN substr(upper(hex(content)), 1, 6) = 'FFD8FF' THEN 'jpeg'
                   ELSE 'unknown'
               END AS format
        FROM media
    """,
    "q44_media_decode": f"""
        WITH media AS ({_DUCK_MEDIA}),
        hashed AS (
            SELECT media_id, md5(upper(hex(content))) AS mh FROM media
        )
        SELECT media_id,
               64 + CAST('0x' || substr(mh, 1, 2) AS INT) * 8 AS width,
               64 + CAST('0x' || substr(mh, 3, 2) AS INT) * 8 AS height,
               1 + CAST('0x' || substr(mh, 5, 2) AS INT) % 4 AS channels
        FROM hashed
    """,
    "q45_frame_sample_counts": f"""
        WITH media AS ({_DUCK_MEDIA})
        SELECT media_id,
               LEAST(8, GREATEST(1, octet_length(content) // 30)) AS n_frames,
               CAST((LEAST(8, GREATEST(1, octet_length(content) // 30)) - 1) * 30
                    AS INT) AS max_frame_idx
        FROM media
    """,
    # bytes -> md5-derived unit vector (identical double ops to the
    # Python embedder) -> squared-L2 nearest of the first 8 vectors
    "q76_media_embed_cells": f"""
        WITH media AS ({_DUCK_MEDIA}),
        hexed AS (
            SELECT media_id, md5(upper(hex(content))) AS h FROM media
        ), raw AS (
            SELECT media_id,
                   list_transform(generate_series(0, 7),
                       i -> CAST('0x' || substr(h, 2*i + 1, 2) AS BIGINT)
                            / 255.0) AS r
            FROM hexed
        ), emb AS (
            SELECT media_id,
                   list_transform(r, v -> v / sqrt(list_sum(
                       list_transform(r, x -> x * x)))) AS e
            FROM raw
        ), c AS (
            SELECT media_id AS cell, e AS cv FROM emb WHERE media_id < 8
        ), d AS (
            SELECT emb.media_id, c.cell,
                   list_sum(list_transform(generate_series(1, 8),
                       i -> (emb.e[i] - c.cv[i]) * (emb.e[i] - c.cv[i])))
                       AS dist
            FROM emb, c
        )
        SELECT media_id, cell FROM (
            SELECT media_id, cell,
                   row_number() OVER (PARTITION BY media_id
                                      ORDER BY dist, cell) AS rn
            FROM d
        ) WHERE rn = 1
    """,
    # cluster-id bytes -> 60-bit md5 phash (portable_phash's exact
    # arithmetic) -> member bit flips -> declarative all-pairs hamming
    # join (valid oracle because max_hamming < bands => total recall)
    "q103_phash_neardup_pairs": f"""
        {_PHASH_PAIRS_CTE}
        SELECT id1, id2, hamming FROM ppairs
    """,
    # the envelope fingerprint of the synthesized WAV IS the cluster
    # id (loud frame per set bit), so the oracle is pure arithmetic —
    # the engine leg still round-trips real RIFF/PCM16 bytes. 15 md5
    # nibbles = the engine's md5_hash60 (sign-safe 60-bit BIGINT).
    "q147_audio_neardup": """
        WITH f AS (
            SELECT doc_id AS media_id,
                   xor(CAST('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR)),
                                           1, 15) AS BIGINT),
                       CASE doc_id % 4
                           WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4
                           ELSE 0
                       END::BIGINT) AS fp
            FROM documents
        )
        SELECT a.media_id AS id1, b.media_id AS id2,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM f a JOIN f b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
    # same pair CTE -> recursive transitive closure (q75's fixpoint
    # pattern) -> per-cluster rollup; shared CTE keeps q103/q105 in
    # lockstep by construction
    "q105_phash_neardup_clusters": f"""
        {_PHASH_PAIRS_CTE},
        edges AS (
            SELECT id1 AS a, id2 AS b FROM ppairs
            UNION
            SELECT id2, id1 FROM ppairs
        ), reach(src, dst) AS (
            SELECT a, a FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ), comp AS (
            SELECT src AS node, MIN(dst) AS component
            FROM reach GROUP BY src
        )
        SELECT component, MIN(node) AS keep_id, COUNT(*) AS n_members
        FROM comp GROUP BY component
    """,
    # media -> sampled-frame stand-in bytes -> 60-bit phash ->
    # per-media lag Hamming: the exact double of the Spark chain
    # (frame bytes are the ascii hexdigest, so hex() of them matches
    # Python bytes.hex() byte for byte)
    "q117_scene_changes": f"""
        WITH media AS ({{media}}),
        fr AS (
            SELECT media_id,
                   t.k * 30 AS frame_idx,
                   encode(md5(upper(hex(content)) || '_'
                              || CAST(t.k * 30 AS VARCHAR))) AS frame
            FROM media,
                 unnest(generate_series(0,
                     LEAST(8, GREATEST(1, octet_length(content) // 30)) - 1
                 )) AS t(k)
        ), ph AS (
            SELECT media_id, frame_idx,
                   CAST('0x' || substr(md5(upper(hex(frame))), 1, 15)
                        AS BIGINT) AS phash
            FROM fr
        ), d AS (
            SELECT media_id, phash,
                   lag(phash) OVER (PARTITION BY media_id
                                    ORDER BY frame_idx) AS prev
            FROM ph
        )
        SELECT media_id,
               COUNT(*) AS n_frames,
               CAST(SUM(CASE WHEN bit_count(xor(phash, prev)) > {{t}}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_scene_changes,
               CAST(MAX(bit_count(xor(phash, prev))) AS INT)
                   AS max_frame_delta
        FROM d GROUP BY media_id
    """.format(media=_DUCK_MEDIA, t=SCENE_THRESHOLD),
}
