"""Multimodal column handling: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched pandas UDFs via
``mapInPandas`` (the Spark-side plumbing — schema, batching, partition
shape — is real; actual media codecs are stubbed because decode
libraries are not available in this environment).

Pattern: at 100 TB the media bytes stay columnar in parquet; decode /
feature-extract runs inside executors on Arrow batches, never on the
driver; partition sizing is controlled upstream with
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("media_kind", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", kind: str = "image"
) -> DataFrame:
    """Model a multimodal table: payload bytes + typed metadata.  Here
    the payload is the utf-8 encoding of the text column (deterministic
    stand-in for real media bytes)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(kind).alias("media_kind"),
        F.length(F.col(text_col)).cast("bigint").alias("meta_n_chars"),
    )


def decode_media(payload: bytes, kind: str):
    """STUB — media decoding requires image/audio libraries that are
    not installed here.  The real implementation would decode
    ``payload`` (e.g. JPEG → HxWx3 array, WAV → PCM frames)."""
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires codec libraries "
        "not available in this environment"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Arrow-batched image resize plumbing.  The pixel transform is
    STUBBED (no codec libs here): the 'resized' payload is a
    deterministic truncation of the source bytes, but the schema
    contract, batching, and partition shape match a real resizer."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64  # deterministic fake byte budget
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["payload"].map(lambda b: bytes(b)[:target]),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_batches, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing (one row out per sampled frame).
    Frame decode is STUBBED: 'frames' are deterministic byte slices —
    the explode-shaped output (doc_id, frame_idx, frame bytes) is what
    a real decoder would emit."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    payloads.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    Uses ``mapInPandas`` so each executor processes whole Arrow record
    batches; the 'features' here are deterministic byte-level stats
    (length + md5 digest) standing in for the stubbed decoder output —
    the plumbing (schema contract, batch iteration, no driver
    round-trips) is exactly what a real decoder would use.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "media_kind": pdf["media_kind"],
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)
