"""Multimodal (image/audio/video) column operators.

Engine additions per BASELINE.json: media as opaque ``binary``
columns plus typed metadata, processed with Arrow-batched
``mapInPandas`` — the Spark-idiomatic shape for a 100 TB multimodal
training-data pipeline:

- media bytes live in a ``binary`` column next to typed metadata
  (format/width/height/duration), so Catalyst prunes the heavy bytes
  away unless a stage actually reads them;
- format sniffing and byte-level metadata are JVM-side expressions
  (no Python in the hot path);
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow moves the bytes to Python in batches,
  one decoder instance per partition, output schema declared up
  front.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this environment,
so the decode kernels are pluggable: ``decoder=`` accepts any
``bytes -> dict`` callable; the default ``fake_decode_*`` kernels are
deterministic pure-Python stand-ins (md5-derived) so the plumbing —
schema, batching, partitioning — is fully real and testable, while
``real_decode_image`` raises NotImplementedError until a codec
library is installed. Swapping fake -> real changes no Spark code.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Ensure Python-kernel stages get cluster-wide parallelism: a
    small media table can arrive as one parquet split, which would
    run every decode on a single core."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

# magic-byte prefixes -> format tag (sniffed JVM-side via substring)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "00000018": "mp4",
    "00000020": "mp4",
    "1A45DFA3": "webm",
}

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "format string, size_bytes long"
)


def sniff_format(content: Column) -> Column:
    """Format tag from magic bytes — pure JVM expression chain
    (hex prefix compare), no UDF."""
    hex8 = F.upper(F.hex(F.substring(content, 1, 4)))
    expr = F.lit("unknown")
    # Each wrap puts the new condition OUTERMOST (evaluated first), so
    # iterate shortest-prefix-first: the longest prefixes end up on the
    # outside and a 3-byte jpeg magic can't shadow a 4-byte FFD8FFE0
    # variant added later. (Ties break on the hex string for
    # determinism.)
    for magic, fmt in sorted(_MAGIC.items(), key=lambda kv: (len(kv[0]), kv[0])):
        expr = F.when(F.substring(hex8, 1, len(magic)) == magic, F.lit(fmt)).otherwise(
            expr
        )
    return expr


def media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Byte-level metadata columns: size, md5, sniffed format. All
    JVM-side; the binary column itself is untouched (and prunable)."""
    c = F.col(content_col)
    return (
        df.withColumn("size_bytes", F.octet_length(c).cast("long"))
        .withColumn("content_md5", F.md5(c))
        .withColumn("format", sniff_format(c))
    )


# ---------------------------------------------------------- decode kernels


def fake_decode_image(content: bytes) -> dict:
    """Deterministic stand-in for an image decoder: width/height/
    channels derived from the content md5 — stable across engines and
    runs, shaped like real decoder output."""
    h = hashlib.md5(content).digest()
    return {
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "channels": 1 + (h[2] % 4),
    }


def fake_decode_audio(content: bytes) -> dict:
    h = hashlib.md5(content).digest()
    return {
        "sample_rate": (8, 16, 22, 44)[h[0] % 4] * 1000,
        "n_samples": 1000 + int.from_bytes(h[1:4], "big") % 100000,
        "channels": 1 + (h[4] % 2),
    }


def fake_decode_video(content: bytes) -> dict:
    h = hashlib.md5(content).digest()
    return {
        "width": 320 + (h[0] % 8) * 80,
        "height": 240 + (h[1] % 8) * 60,
        "n_frames": 24 + int.from_bytes(h[2:4], "big") % 2400,
        "fps": float((24, 25, 30, 60)[h[4] % 4]),
    }


def real_decode_image(content: bytes) -> dict:
    """Real decoder stub — requires an image codec library that is not
    in this environment (SURVEY-scope limitation, deliberately gated)."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "pass decoder=fake_decode_image or install a codec and wire it here"
    )


# ------------------------------------------------------- mapInPandas ops


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict],
    out_fields: str,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode each media blob into typed metadata fields via
    ``mapInPandas``: Arrow ships (id, bytes) batches to Python, the
    decoder runs once per row, output is (id, *out_fields). The heavy
    binary column never leaves the stage — downstream joins carry
    only the slim decoded rows.

    ``out_fields`` e.g. ``"width int, height int, channels int"``.
    """
    import pandas as pd

    names = [f.strip().split()[0] for f in out_fields.split(",")]

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [decoder(b) for b in pdf[content_col]]
            out = {id_col: pdf[id_col].values}
            for n in names:
                out[n] = [d[n] for d in decoded]
            yield pd.DataFrame(out)

    return _spread(df.select(id_col, content_col)).mapInPandas(
        _run, schema=f"{id_col} long, {out_fields}"
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Image resize as a binary->binary mapInPandas stage. The default
    ``resizer`` is the deterministic fake (md5-stamped header +
    truncation) standing in for a real codec; the Spark plumbing —
    Arrow binary round-trip, schema, batching — is the real article.
    """
    import pandas as pd

    if resizer is None:
        def resizer(content: bytes, w: int, h: int) -> bytes:  # fake kernel
            stamp = f"RSZ:{w}x{h}:".encode() + hashlib.md5(content).digest()[:4]
            return stamp + content[: max(0, 256 - len(stamp))]

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "content": [resizer(b, target_w, target_h)
                                for b in pdf[content_col]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return _spread(df.select(id_col, content_col)).mapInPandas(
        _run, schema=f"{id_col} long, content binary, width int, height int"
    )


def sample_frames(
    df: DataFrame,
    every_nth: int = 30,
    max_frames: int = 8,
    frame_extractor: Callable[[bytes, int], bytes] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, frame bytes) — the explode-shaped
    mapInPandas stage a video pipeline needs. Fake extractor derives
    frame bytes deterministically from (content md5, frame index)."""
    import pandas as pd

    if frame_extractor is None:
        def frame_extractor(content: bytes, idx: int) -> bytes:  # fake kernel
            return hashlib.md5(content + idx.to_bytes(4, "big")).digest()

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n = min(max_frames, max(1, len(content) // every_nth))
                for k in range(n):
                    ids.append(mid)
                    idxs.append(k * every_nth)
                    frames.append(frame_extractor(content, k * every_nth))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return _spread(df.select(id_col, content_col)).mapInPandas(
        _run, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def embed_media(
    df: DataFrame,
    dim: int = 8,
    embedder: Callable[[bytes], list] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
    vec_type: str = "float",
) -> DataFrame:
    """Media -> embedding vector (array<``vec_type``>): the
    feature-extract stage feeding similarity search. Fake embedder:
    md5-expanded pseudo-embedding, unit-length floats. Use
    ``vec_type='double'`` when downstream math must be bit-identical
    to a double-precision oracle (float32 truncation would shift
    distance comparisons)."""
    import pandas as pd

    if embedder is None:
        def embedder(content: bytes) -> list:
            raw = hashlib.md5(content).digest()
            while len(raw) < dim:
                raw += hashlib.md5(raw).digest()
            vals = [raw[i] / 255.0 for i in range(dim)]
            norm = sum(v * v for v in vals) ** 0.5 or 1.0
            return [round(v / norm, 6) for v in vals]

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "embedding": [embedder(b) for b in pdf[content_col]],
                }
            )

    return _spread(df.select(id_col, content_col)).mapInPandas(
        _run, schema=f"{id_col} long, embedding array<{vec_type}>"
    )
