"""Multimodal-column operators (SURVEY L4 + north-star mandate).

Pattern: media lives in an opaque ``binary`` column next to typed
metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row objects.
At 100 TB the binary column rides the same parquet scan as everything
else — column pruning means queries that don't touch payloads never
read them, and ``maxPartitionBytes`` keeps per-task memory bounded.

The container has no image/audio codecs, so:

- :func:`extract_features` — REAL plumbing (binary synthesis, Arrow
  batching, schema-stable UDF output) with a deterministic byte-level
  "decoder"; oracle-checkable because every feature is recomputable
  from the source text in SQL.
- :func:`decode_image_batch` — the genuine decode path, gated behind
  an import-try on PIL and raising NotImplementedError here; its
  mapInPandas wiring is identical to extract_features, so swapping in
  the real codec is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..sources import catalog

#: Output schema of the feature extractor — declared once, never inferred.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum_md5", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque media column + typed metadata struct.

    Payload is the utf-8 encoding of the text — a deterministic stand-in
    for image/audio bytes that keeps every byte-level feature
    recomputable by the oracle."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.length(F.col("text")).alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The 'decoder': pure byte-level features, one vectorized pass per
    Arrow batch. Runs on executors; no driver materialization."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "checksum_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "n_frames": payloads.map(lambda b: len(b) % 7).astype("int32"),
            }
        )


_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS INT) AS byte_len,
       CAST(CASE WHEN strlen(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte,
       md5(text) AS checksum_md5,
       CAST(strlen(text) % 7 AS INT) AS n_frames
FROM documents
"""


@query("multimodal_features", _FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through real mapInPandas
    plumbing (Arrow batches, fixed output schema)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


_FRAME_LEN = 16
_FRAME_STRIDE = 64

# documents.text is pure ASCII (asserted in tests), so byte offsets in
# the utf-8 payload equal character offsets in the text — the oracle
# recomputes every frame with substr + md5.
_FRAMES_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text,
           CAST(pos AS INT) AS frame_idx,
           md5(substr(text, pos * {_FRAME_STRIDE} + 1, {_FRAME_LEN})) AS frame_md5
    FROM documents,
         unnest(range(0, CAST(ceil(CAST(strlen(text) AS DOUBLE) / {_FRAME_STRIDE}) AS BIGINT))) AS u(pos)
    WHERE strlen(text) > 0
)
SELECT doc_id, frame_idx, frame_md5 FROM f
"""


@query("multimodal_frame_sample", _FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the real mapInPandas plumbing; frames are
    emitted as md5 digests so the comparison is byte-portable."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    frames = sample_frames(
        with_binary_payload(docs), frame_len=_FRAME_LEN, stride=_FRAME_STRIDE
    )
    return frames.select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))


_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS INT) AS orig_len,
       CAST(least(strlen(text), 64) AS INT) AS new_len,
       md5(substr(text, 1, 64)) AS payload_md5
FROM documents
"""


@query("multimodal_resize", _RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget 'resize' through mapInPandas; output digested for
    portable comparison."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    out = resize_payloads(with_binary_payload(docs), target_len=64)
    return out.select(
        "doc_id", "orig_len", "new_len", F.md5("payload").alias("payload_md5")
    )


# --------------------------------------------------------------------------
# The genuine decode path (gated: codecs absent in this container)
# --------------------------------------------------------------------------

try:  # pragma: no cover - environment-dependent
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode (PIL). The container ships no codecs, so this
    raises unless PIL is installed — the surrounding Spark plumbing
    (binary in, typed struct out, Arrow batching) is identical to
    :func:`_feature_batches` and is what production swaps in."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL, not available in this environment; "
            "use multimodal_features for the codec-free byte-level path"
        )
    import io

    for pdf in batches:  # pragma: no cover - requires PIL
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with Image.open(io.BytesIO(payload)) as im:
                rows.append((doc_id, im.width, im.height, im.mode))
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mode"])


def decode_images(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas wiring for the real decoder (raises without PIL)."""
    return docs_with_payload.mapInPandas(decode_image_batch, schema=IMAGE_SCHEMA)


# --------------------------------------------------------------------------
# Resize / frame-sample: deterministic byte-level stand-ins with the
# production batch shape (binary in -> binary/array out)
# --------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("orig_len", T.IntegerType()),
        T.StructField("new_len", T.IntegerType()),
    ]
)


def resize_payloads(docs_with_payload: DataFrame, target_len: int = 64) -> DataFrame:
    """'Resize' = truncate/keep bytes to a fixed budget — the stand-in
    for image down-scaling. The contract production cares about:
    binary column in, binary column out, bounded per-row output size
    (what keeps shuffle/write volume predictable downstream)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            resized = payloads.map(lambda b: bytes(b[:target_len]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "orig_len": payloads.map(len).astype("int32"),
                    "new_len": resized.map(len).astype("int32"),
                }
            )

    return docs_with_payload.mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(docs_with_payload: DataFrame, frame_len: int = 16, stride: int = 64) -> DataFrame:
    """Frame sampling: one row per sampled fixed-length slice of the
    payload (the video-keyframe shape: 1 input row -> N output rows).
    Row expansion happens executor-side inside the Arrow batch, never
    on the driver."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), stride)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + frame_len]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return docs_with_payload.mapInPandas(_batches, schema=FRAMES_SCHEMA)
