"""Multimodal column handling: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched pandas UDFs via
``mapInPandas``.  The AUDIO path is a real codec (PCM WAV decodes with
the stdlib ``wave`` module — see ``wav_metadata``); image/video decode
is stubbed because those codec libraries are not available in this
environment, while their Spark-side plumbing (schema, batching,
partition shape) is real.

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


# --------------------------------------------------------------------------
# audio: REAL WAV codec path (PCM WAV needs only the stdlib, so this
# modality is genuinely decoded — image/video stay honestly stubbed)
# --------------------------------------------------------------------------
WAV_SAMPLE_RATE = 8000

WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_abs_amplitude", T.LongType()),
    ]
)


def _wav_pcm(doc_id: int):
    """Deterministic int16 PCM: sample i = ((id*7919 + i*104729) %
    65536) - 32768 — reproducible in plain SQL for the oracle."""
    import numpy as np

    n_frames = 400 + (doc_id % 100) * 40
    i = np.arange(n_frames, dtype=np.int64)
    return ((doc_id * 7919 + i * 104729) % 65536 - 32768).astype("<i2")


def synth_wav_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL mono 16-bit PCM WAV payload per row (RIFF header
    + frames written by the stdlib ``wave`` codec).  Stands in for an
    ingest of actual audio files; every byte is deterministic."""
    import io
    import wave

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col].astype("int64"):
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(_wav_pcm(int(doc_id)).tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def wav_metadata(df: DataFrame) -> DataFrame:
    """Decode WAV payloads — a REAL parser (stdlib ``wave`` reads the
    RIFF/fmt chunks; numpy decodes the PCM frames), not a stub: it
    works on any mono/stereo 16-bit PCM WAV.  Arrow-batched via
    ``mapInPandas``; amplitude stats are exact integer sums, so the
    result is engine-portable for the oracle gate."""
    import io
    import wave

    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in WAV_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate, nch, nf = (
                        w.getframerate(),
                        w.getnchannels(),
                        w.getnframes(),
                    )
                    pcm = np.frombuffer(w.readframes(nf), dtype="<i2")
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_channels"].append(nch)
                out["n_frames"].append(nf)
                out["duration_ms"].append(nf * 1000 // rate)
                out["sum_abs_amplitude"].append(
                    int(np.abs(pcm.astype(np.int64)).sum())
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=WAV_META_SCHEMA)
