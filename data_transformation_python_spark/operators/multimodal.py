"""Multimodal column handling: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched pandas UDFs via
``mapInPandas``.  All three modalities decode with REAL codecs:
audio (PCM WAV via the stdlib ``wave`` module — ``wav_metadata``),
images (uncompressed 24-bit BMP via ``struct``+numpy, binary PPM/P6,
COMPRESSED 8-bit RGB PNG — zlib-DEFLATE + full scanline-filter
reconstruction, GIF87a with a real variable-width LZW, and baseline
JPEG via the pure-numpy T.81 codec in ``jpeg_codec.py``), and video
(uncompressed-DIB AVI RIFF).  Only MP4/H.26x video remains stubbed
(a motion-compensated video codec is genuinely out of scope), while
its Spark-side plumbing (schema, batching, partition shape) is
real.

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
    """Decode a media payload to an array.  REAL codecs exist for the
    stdlib-decodable formats: ``wav`` (RIFF/PCM via ``wave``) and
    ``bmp`` (uncompressed 24-bit via ``struct`` — see ``_parse_bmp``),
    ``ppm`` (binary Netpbm — ``_parse_ppm``), ``png`` (zlib DEFLATE +
    filter reconstruction — ``_parse_png``), ``gif`` (LZW —
    ``_parse_gif``), ``jpeg`` (baseline T.81 — ``jpeg_codec``), and
    ``avi`` frames (uncompressed DIB and MJPEG), ``ipv``
    inter-frame-predicted video (MPEG-1-shaped I/P pictures —
    ``video_codec``), ``mp4`` (real ISO BMFF demux + the AVC I_PCM
    and CAVLC Intra_16x16-DC subsets — ``h264_codec``), and ``h264``
    Annex-B elementary streams of those subsets.  Only the H.264
    AC-residual path, CABAC, motion compensation, and H.265 stay
    honestly stubbed (they need a full codec stack not in this
    environment)."""
    import io

    import numpy as np

    if kind == "wav":
        import wave

        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            return np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    if kind == "bmp":
        return _parse_bmp(bytes(payload))[2]
    if kind == "ppm":
        return _parse_ppm(bytes(payload))[2]
    if kind == "png":
        return _parse_png(bytes(payload))[2]
    if kind == "gif":
        return _parse_gif(bytes(payload))[2]
    if kind == "jpeg":
        from .jpeg_codec import jpeg_decode

        return jpeg_decode(bytes(payload))
    if kind == "avi":
        return _parse_avi(bytes(payload))[4]
    if kind == "ipv":
        from .video_codec import ipv_decode

        return ipv_decode(bytes(payload))[3]
    if kind == "mp4":
        from .h264_codec import mp4_read

        return mp4_read(bytes(payload))[3]
    if kind == "h264":
        from .h264_codec import h264_decode_frame, split_annexb

        nals = split_annexb(bytes(payload))
        return [
            h264_decode_frame(nals[i : i + 3])
            for i in range(0, len(nals), 3)
        ]
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires codec libraries "
        "not available in this environment (H.264 beyond the I_PCM "
        "and CAVLC Intra_16x16-DC subsets — AC residuals, CABAC, "
        "motion compensation — and H.265; see h264_codec)"
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


# --------------------------------------------------------------------------
# image: REAL BMP codec path (uncompressed 24-bit BMP needs only
# ``struct`` + numpy, so the image modality is genuinely decoded too —
# compressed formats stay honestly stubbed)
# --------------------------------------------------------------------------
BMP_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("px00_r", T.LongType()),
        T.StructField("px00_g", T.LongType()),
        T.StructField("px00_b", T.LongType()),
    ]
)


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 13, 3 + doc_id % 7


def _bmp_channels(doc_id: int, w: int, h: int):
    """Deterministic per-pixel channel values (h×w uint8 arrays, y
    indexed from the image TOP) — linear congruences reproducible in
    plain SQL for the oracle."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = ((doc_id * 7 + x * 19 + y * 23) % 256).astype(np.uint8)
    g = ((doc_id * 5 + x * 11 + y * 17) % 256).astype(np.uint8)
    b = ((doc_id * 3 + x * 7 + y * 13) % 256).astype(np.uint8)
    return r, g, b


def _bmp_payload_from_rgb(r, g, b, w: int, h: int) -> bytes:
    """Assemble a genuine uncompressed 24-bit BMP from h×w channel
    arrays (y indexed from the top): BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes."""
    import struct

    import numpy as np

    pad = (4 - (w * 3) % 4) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # positive height ⇒ bottom row first
        px = np.empty(w * 3, dtype=np.uint8)
        px[0::3], px[1::3], px[2::3] = b[y], g[y], r[y]
        rows.append(px.tobytes() + b"\x00" * pad)
    pixels = b"".join(rows)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + dib + pixels


def _write_bmp(doc_id: int) -> bytes:
    w, h = _bmp_dims(doc_id)
    r, g, b = _bmp_channels(doc_id, w, h)
    return _bmp_payload_from_rgb(r, g, b, w, h)


def resize_bmp_images(
    df: DataFrame, width: int, height: int
) -> DataFrame:
    """REAL image resize for uncompressed BMP payloads: parse the
    pixel array, nearest-neighbor index it to (width, height)
    (``src = (dst · src_dim) div dst_dim`` — pure integer math, so the
    oracle can replay the exact mapping), and re-encode a valid BMP.
    Arrow-batched ``mapInPandas``; the generic byte-truncation
    plumbing stub (``resize_images``) remains for opaque payloads."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                w, h, px = _parse_bmp(bytes(payload))
                xs = (np.arange(width, dtype=np.int64) * w) // width
                ys = (np.arange(height, dtype=np.int64) * h) // height
                res = px[np.ix_(ys, xs)]
                payloads.append(
                    _bmp_payload_from_rgb(
                        res[..., 0], res[..., 1], res[..., 2], width, height
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_batches, schema=RESIZE_SCHEMA)


def _parse_bmp(data: bytes):
    """Parse any uncompressed 24-bit BMP (not just the synthetic ones):
    magic, pixel-array offset, DIB dimensions, row padding, bottom-up
    vs top-down row order.  Returns (width, height, pixels) with
    ``pixels`` an h×w×3 uint8 array in RGB order, row 0 = image top."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    offset = struct.unpack_from("<I", data, 10)[0]
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", data, 14)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    top_down, h_abs = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(data, dtype=np.uint8, offset=offset, count=stride * h_abs)
    bgr = arr.reshape(h_abs, stride)[:, : w * 3].reshape(h_abs, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return w, h_abs, bgr[..., ::-1]  # BGR → RGB


def synth_bmp_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL 24-bit BMP payload per row (full file header +
    DIB header + padded pixel rows).  Stands in for an ingest of
    actual image files; every byte is deterministic."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_bmp(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


# --------------------------------------------------------------------------
# video: REAL AVI codec path (uncompressed DIB-frame AVI is a RIFF
# container — stdlib ``struct`` + numpy suffice, completing the third
# modality with a genuine parser; compressed video stays stubbed)
# --------------------------------------------------------------------------
AVI_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("px000_r", T.LongType()),
        T.StructField("px000_g", T.LongType()),
        T.StructField("px000_b", T.LongType()),
    ]
)

#: exact-microsecond frame rates (1e6 divisible) so fps round-trips
#: through dwMicroSecPerFrame with no rounding anywhere.
AVI_FPS_CHOICES = (10, 16, 20, 25, 40)


def _avi_dims(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) — all deterministic."""
    return (
        3 + doc_id % 5,
        2 + doc_id % 4,
        2 + doc_id % 5,
        AVI_FPS_CHOICES[doc_id % 5],
    )


def _avi_frame_channels(doc_id: int, f: int, w: int, h: int):
    """Per-frame RGB channel arrays (h×w uint8, y from frame top) —
    linear congruences reproducible in plain SQL."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = ((doc_id * 7 + f * 29 + x * 19 + y * 23) % 256).astype(np.uint8)
    g = ((doc_id * 5 + f * 31 + x * 11 + y * 17) % 256).astype(np.uint8)
    b = ((doc_id * 3 + f * 37 + x * 7 + y * 13) % 256).astype(np.uint8)
    return r, g, b


def _dib_frame_bytes(r, g, b, w: int, h: int) -> bytes:
    """Bottom-up, 4-byte-padded BGR rows — the uncompressed DIB frame
    layout AVI '00db' chunks carry (same as the BMP pixel array)."""
    import numpy as np

    pad = (4 - (w * 3) % 4) % 4
    rows = []
    for y in range(h - 1, -1, -1):
        px = np.empty(w * 3, dtype=np.uint8)
        px[0::3], px[1::3], px[2::3] = b[y], g[y], r[y]
        rows.append(px.tobytes() + b"\x00" * pad)
    return b"".join(rows)


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    import struct

    return fourcc + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) % 2 else b""
    )


def _write_avi(doc_id: int) -> bytes:
    """A genuine uncompressed AVI: RIFF('AVI ') → LIST hdrl (avih +
    LIST strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) → LIST movi
    ('00db' DIB frames, even-aligned)."""
    w, h, nf, fps = _avi_dims(doc_id)
    frames = [
        _dib_frame_bytes(*_avi_frame_channels(doc_id, f, w, h), w, h)
        for f in range(nf)
    ]
    return _avi_container(frames, w, h, nf, fps)


def _avi_container(
    frames: list[bytes], w: int, h: int, nf: int, fps: int
) -> bytes:
    """Assemble the RIFF tree around pre-built DIB frame chunks."""
    import struct

    frame_size = len(frames[0])
    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame (exact: fps divides 1e6)
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0,                 # dwFlags
        nf,                # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        frame_size,        # dwSuggestedBufferSize
        w,                 # dwWidth
        h,                 # dwHeight
    ) + struct.pack("<4I", 0, 0, 0, 0)
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, frame_size, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi = _riff_chunk(
        b"LIST", b"movi" + b"".join(_riff_chunk(b"00db", fr) for fr in frames)
    )
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_avi(data: bytes):
    """Parse an uncompressed DIB-frame AVI: walk the RIFF chunk tree
    (word-aligned sizes), read the avih main header for dims/timing,
    and decode every movi '00db'/'00dc' frame as a bottom-up padded
    BGR pixel array.  Returns (w, h, n_frames, fps, frames) with each
    frame an h×w×3 uint8 RGB array, row 0 = frame top."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    avih = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal avih
        i = 0
        while i + 8 <= len(buf):
            fourcc = buf[i : i + 4]
            size = struct.unpack_from("<I", buf, i + 4)[0]
            body = buf[i + 8 : i + 8 + size]
            if fourcc in (b"RIFF", b"LIST"):
                walk(body[4:])  # skip the form type, recurse
            elif fourcc == b"avih":
                avih = body
            elif fourcc[2:] in (b"db", b"dc"):
                frames_raw.append(body)
            i += 8 + size + (size % 2)  # chunks are word-aligned

    walk(data[12:])
    if avih is None:
        raise ValueError("AVI missing avih main header")
    usec, total, w, h = (
        struct.unpack_from("<I", avih, 0)[0],
        struct.unpack_from("<I", avih, 16)[0],
        struct.unpack_from("<I", avih, 32)[0],
        struct.unpack_from("<I", avih, 36)[0],
    )
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for raw in frames_raw:
        if raw[:2] == b"\xff\xd8":  # MJPEG: per-frame baseline JPEG
            from .jpeg_codec import jpeg_decode

            frames.append(jpeg_decode(raw))
            continue
        arr = np.frombuffer(raw, dtype=np.uint8, count=stride * h)
        bgr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        frames.append(bgr[::-1, :, ::-1])  # bottom-up → top, BGR → RGB
    return w, h, total, 1_000_000 // usec, frames


def synth_avi_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL uncompressed AVI payload per row (full RIFF
    header tree + DIB frames).  Stands in for an ingest of actual
    video files; every byte is deterministic."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_avi(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def sample_avi_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling for uncompressed AVI payloads: walk
    the container, decode the frames, keep every ``every_n``-th one
    (original frame index preserved), and emit each as a standalone
    BMP payload — the decode→sample→re-encode shape a frame-level
    training pipeline uses.  One output row per sampled frame (a
    bounded explode); the byte-slice plumbing stub
    (``sample_frames``) remains for opaque payloads."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, _, _, frames = _parse_avi(bytes(payload))
                for f in range(0, len(frames), every_n):
                    px = frames[f]
                    ids.append(int(doc_id))
                    idxs.append(f)
                    payloads.append(
                        _bmp_payload_from_rgb(
                            px[..., 0], px[..., 1], px[..., 2], w, h
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def bmp_channel_sums(
    df: DataFrame,
    payload_col: str = "frame_payload",
    id_cols: tuple[str, ...] = ("doc_id", "frame_idx"),
) -> DataFrame:
    """Exact per-payload RGB channel sums for BMP payload columns
    keyed by arbitrary id columns (e.g. (doc, frame) after
    ``sample_avi_frames``)."""
    import numpy as np

    schema = T.StructType(
        [next(f for f in df.schema.fields if f.name == c) for c in id_cols]
        + [
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: list(pdf[c]) for c in id_cols}
            sums_r, sums_g, sums_b = [], [], []
            for payload in pdf[payload_col]:
                _, _, px = _parse_bmp(bytes(payload))
                s = px.astype(np.int64).sum(axis=(0, 1))
                sums_r.append(int(s[0]))
                sums_g.append(int(s[1]))
                sums_b.append(int(s[2]))
            out["sum_r"], out["sum_g"], out["sum_b"] = sums_r, sums_g, sums_b
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=schema)


def avi_metadata(df: DataFrame) -> DataFrame:
    """Decode AVI payloads — a REAL RIFF walker (``_parse_avi``), not
    a stub: container tree, avih timing/dims, per-frame DIB decode.
    Arrow-batched via ``mapInPandas``; channel sums over ALL frames
    are exact integers and the frame-0 top-left pixel pins both frame
    order and row order for the oracle."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AVI_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, nf, fps, frames = _parse_avi(bytes(payload))
                stack = np.stack(frames).astype(np.int64)
                sums = stack.sum(axis=(0, 1, 2))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["fps"].append(fps)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["px000_r"].append(int(frames[0][0, 0, 0]))
                out["px000_g"].append(int(frames[0][0, 0, 1]))
                out["px000_b"].append(int(frames[0][0, 0, 2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=AVI_META_SCHEMA)


def bmp_metadata(df: DataFrame) -> DataFrame:
    """Decode BMP payloads — a REAL parser (``_parse_bmp`` reads the
    RIFF-style headers and the padded bottom-up pixel rows), not a
    stub.  Arrow-batched via ``mapInPandas``; channel sums are exact
    integers and the top-left pixel pins row/column order (a flipped
    or padded-wrong decode fails the oracle hash)."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_bmp(bytes(payload))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["px00_r"].append(int(px[0, 0, 0]))
                out["px00_g"].append(int(px[0, 0, 1]))
                out["px00_b"].append(int(px[0, 0, 2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=BMP_META_SCHEMA)


# --------------------------------------------------------------------------
# image: PPM (Netpbm P6) codec — a SECOND real image format through
# the same mapInPandas harness and meta schema as BMP, demonstrating
# the codec tier is pluggable: a new format only supplies a byte
# writer + parser; batching, schema, and oracle plumbing are shared.
# PPM is top-down unpadded RGB (vs BMP's bottom-up padded BGR), so a
# decoder that confuses the two layouts fails the pixel-pin columns.
# --------------------------------------------------------------------------
def _ppm_dims(doc_id: int) -> tuple[int, int]:
    return 5 + doc_id % 11, 3 + doc_id % 6


def _write_ppm(doc_id: int) -> bytes:
    """Genuine binary PPM (P6): ASCII header `P6\\n<w> <h>\\n255\\n`
    followed by top-down, unpadded RGB triplets."""
    import numpy as np

    w, h = _ppm_dims(doc_id)
    r, g, b = _bmp_channels(doc_id, w, h)  # shared channel congruences
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = r, g, b
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def _parse_ppm(data: bytes):
    """Parse any binary PPM (P6), honoring the real Netpbm header
    grammar: `#` comments and arbitrary whitespace between tokens,
    arbitrary maxval ≤ 255.  Returns (width, height, pixels) with
    ``pixels`` h×w×3 uint8 RGB, row 0 = image top."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a binary PPM payload (missing P6 magic)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        c = data[pos : pos + 1]
        if c == b"":  # end-of-data mid-header: b''.isspace() is False,
            raise ValueError("truncated PPM header")  # so stop explicitly
        if c == b"#":  # comment runs to end of line
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while True:
                c = data[pos : pos + 1]
                if c == b"":
                    raise ValueError("truncated PPM header")
                if c.isspace():
                    break
                pos += 1
            tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    arr = np.frombuffer(data, dtype=np.uint8, offset=pos, count=w * h * 3)
    return w, h, arr.reshape(h, w, 3)


def synth_ppm_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL binary-PPM payload per row — the second image
    ingest format (see ``synth_bmp_table``)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_ppm(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def ppm_metadata(df: DataFrame) -> DataFrame:
    """Decode PPM payloads through the shared image-meta surface
    (same output schema as ``bmp_metadata`` — downstream consumers
    are format-agnostic)."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_ppm(bytes(payload))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["px00_r"].append(int(px[0, 0, 0]))
                out["px00_g"].append(int(px[0, 0, 1]))
                out["px00_b"].append(int(px[0, 0, 2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=BMP_META_SCHEMA)


# --------------------------------------------------------------------------
# image: PNG codec — a REAL COMPRESSED format, fully stdlib: DEFLATE
# is ``zlib`` (in the standard library), chunk CRCs are ``zlib.crc32``,
# and scanline reconstruction (filters 0-4: None/Sub/Up/Average/
# Paeth) is numpy.  This closes the "compressed image" gap honestly —
# only JPEG (entropy-coded DCT) and MP4 (H.26x) remain env-blocked.
# --------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_dims(doc_id: int) -> tuple[int, int]:
    return 6 + doc_id % 9, 4 + doc_id % 5


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _write_png(doc_id: int) -> bytes:
    """Genuine 8-bit RGB PNG: IHDR + zlib-DEFLATE IDAT (filter 0 per
    scanline) + IEND, all chunk CRCs real."""
    import struct
    import zlib

    import numpy as np

    w, h = _png_dims(doc_id)
    r, g, b = _bmp_channels(doc_id, w, h)  # shared channel congruences
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = r, g, b
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(data: bytes):
    """Parse an 8-bit truecolor (RGB) PNG: walk the chunk stream,
    inflate the concatenated IDATs, and RECONSTRUCT every scanline
    filter the spec defines (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth)
    — a real decoder, not a reader of our own writer's output.
    Returns (width, height, pixels) with h×w×3 uint8 RGB."""
    import struct
    import zlib

    import numpy as np

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, w = len(_PNG_SIG), 0
    h = bitdepth = color = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bitdepth != 8 or color != 2:
                raise NotImplementedError(
                    "only 8-bit truecolor PNG supported"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, offset=y * (stride + 1) + 1, count=stride
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                bb = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + bb) // 2
                else:
                    c = prev[x - 3] if x >= 3 else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return w, h, out.reshape(h, w, 3)


def synth_png_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL compressed PNG payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_png(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def png_metadata(df: DataFrame) -> DataFrame:
    """Decode PNG payloads through the shared image-meta surface
    (same schema as BMP/PPM — consumers stay format-agnostic)."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_png(bytes(payload))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["px00_r"].append(int(px[0, 0, 0]))
                out["px00_g"].append(int(px[0, 0, 1]))
                out["px00_b"].append(int(px[0, 0, 2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=BMP_META_SCHEMA)


# --------------------------------------------------------------------------
# image: GIF87a codec — a SECOND real compressed format, stdlib-only:
# variable-width LZW (the real algorithm: growing dictionary, code
# widening, CLEAR resets, the KwKwK case) + palette indexing.  With
# PNG (DEFLATE) this makes two genuinely compressed image paths; the
# remaining stubs (JPEG, MP4) need entropy/transform codecs that are
# truly absent from this environment.
# --------------------------------------------------------------------------
def _gif_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 7, 3 + doc_id % 5


class _LZWBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Real GIF LZW: growing string table, widening codes (up to 12
    bits), CLEAR on table overflow."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _LZWBitWriter()

    def reset():
        return {(i,): i for i in range(1 << min_code_size)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.put(clear, width)
    w: tuple = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        bw.put(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4095:
            bw.put(clear, width)
            table, next_code, width = reset()
        w = (k,)
    if w:
        bw.put(table[w], width)
    bw.put(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> list:
    """Real GIF LZW decode: LSB-first variable-width codes, CLEAR
    resets, KwKwK (code == next unassigned) handling."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    acc = nbits = pos = 0
    out: list[int] = []

    def reset():
        return (
            {i: (i,) for i in range(1 << min_code_size)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: tuple | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code <= 4095:
                table[next_code] = prev + (entry[0],)
                next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + (prev[0],)
            if next_code <= 4095:
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        # EARLY width change: the decoder's table lags the encoder's
        # by exactly one entry (the encoder finalizes a string when it
        # emits; the decoder only when it sees the NEXT code), so the
        # decoder must widen one code earlier — at 2^width - 1, where
        # the encoder widens at 2^width.
        if prev is not None and next_code == (1 << width) - 1 and width < 12:
            width += 1
        out.extend(entry)
        prev = entry


def _write_gif(doc_id: int) -> bytes:
    """Genuine GIF87a: logical screen + global color table + real
    LZW-compressed image data in ≤255-byte sub-blocks."""
    import struct

    import numpy as np

    w, h = _gif_dims(doc_id)
    r, g, b = _bmp_channels(doc_id, w, h)
    px = np.stack([r, g, b], axis=-1).reshape(-1, 3)
    palette: list[tuple] = []
    seen: dict = {}
    indices = []
    for p in map(tuple, px):
        if p not in seen:
            seen[p] = len(palette)
            palette.append(p)
        indices.append(seen[p])
    bits = max(2, (len(palette) - 1).bit_length())
    gct = bytearray()
    for i in range(1 << bits):
        gct += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
    head = b"GIF87a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(indices, bits)
    blocks = bytearray([bits])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + bytes(gct) + img_desc + bytes(blocks) + b"\x3b"


def _parse_gif(data: bytes):
    """Parse a GIF87a/89a with a global color table and one image
    block (skipping 89a extension blocks) — palette lookup after a
    real LZW decode.  Returns (width, height, pixels h×w×3 RGB)."""
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, offset=pos, count=n * 3).reshape(
            n, 3
        )
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # 89a extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:
            _, _, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x80:  # local color table overrides
                n = 2 << (iflags & 0x07)
                gct = np.frombuffer(
                    data, np.uint8, offset=pos, count=n * 3
                ).reshape(n, 3)
                pos += n * 3
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if gct is None:
                raise ValueError("GIF without a color table")
            idx = _lzw_decode(bytes(lzw), min_code)[: w * h]
            return w, h, gct[np.array(idx, dtype=np.int64)].reshape(h, w, 3)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image block")


def synth_gif_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL LZW-compressed GIF87a payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_gif(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def gif_metadata(df: DataFrame) -> DataFrame:
    """Decode GIF payloads through the shared image-meta surface."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_gif(bytes(payload))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["px00_r"].append(int(px[0, 0, 0]))
                out["px00_g"].append(int(px[0, 0, 1]))
                out["px00_b"].append(int(px[0, 0, 2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=BMP_META_SCHEMA)


# --------------------------------------------------------------------------
# image: baseline JPEG — the last image format, via the pure-numpy
# T.81 codec in operators/jpeg_codec.py (FDCT + quantization + DHT-
# defined canonical Huffman; the decoder parses DQT/SOF0/DHT/SOS and
# reads any baseline 1x1-sampled JPEG).  JPEG is LOSSY, so the gate
# pins parsed dimensions plus a decoded-fidelity bound instead of an
# exact pixel replay; determinism still holds (encode and decode are
# pure functions), which the unit tests assert bit-exactly.
# --------------------------------------------------------------------------
def _jpeg_dims(doc_id: int) -> tuple[int, int]:
    return 9 + doc_id % 10, 8 + doc_id % 7  # multiple MCUs + ragged edges


def _write_jpeg(doc_id: int, quality: int = 95) -> bytes:
    import numpy as np

    from .jpeg_codec import jpeg_encode

    w, h = _jpeg_dims(doc_id)
    r, g, b = _bmp_channels(doc_id, w, h)
    px = np.stack([r, g, b], axis=-1)
    return jpeg_encode(px, quality=quality)


def synth_jpeg_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL baseline-JPEG payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_jpeg(int(i)) for i in ids]}
            )

    # codec work is CPU-heavy per row: spread the id column across
    # the executor cores BEFORE the Arrow stage (a one-column
    # shuffle of bigints) — the source table may sit in one
    # parquet partition, which would serialize every encode.
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


JPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("psnr_ok", T.BooleanType()),
    ]
)


def jpeg_metadata(df: DataFrame, min_psnr_db: float = 30.0) -> DataFrame:
    """Decode JPEG payloads and verify fidelity against the known
    source formula: dimensions come from the parsed SOF0 and
    ``psnr_ok`` asserts the decoded pixels sit within ``min_psnr_db``
    of the original — a broken Huffman/DCT/colorspace stage collapses
    PSNR and fails the gate."""
    import numpy as np

    from .jpeg_codec import jpeg_decode

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in JPEG_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                px = jpeg_decode(bytes(payload))
                h, w = px.shape[:2]
                r, g, b = _bmp_channels(int(doc_id), w, h)
                src = np.stack([r, g, b], axis=-1).astype(np.float64)
                mse = ((px.astype(np.float64) - src) ** 2).mean()
                psnr = float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["psnr_ok"].append(bool(psnr >= min_psnr_db))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=JPEG_META_SCHEMA)


# --------------------------------------------------------------------------
# video: MJPEG-in-AVI — real COMPRESSED video by composing the two
# codecs above: the AVI RIFF container carries per-frame baseline
# JPEGs ('MJPG' fourcc, the actual Motion-JPEG layout).  The shared
# RIFF walker detects JPEG frames by SOI magic and routes them
# through the T.81 decoder; only inter-frame-predicted video
# (MP4/H.26x) remains honestly stubbed.
# --------------------------------------------------------------------------
def _mjpeg_dims(doc_id: int) -> tuple[int, int, int, int]:
    return (
        10 + doc_id % 7,
        9 + doc_id % 5,
        2 + doc_id % 3,
        AVI_FPS_CHOICES[doc_id % 5],
    )


def _write_mjpeg_avi(doc_id: int, quality: int = 95) -> bytes:
    """Genuine MJPEG AVI: RIFF('AVI ') with 'vids'/'MJPG' stream
    headers and '00dc' chunks holding real baseline JPEGs."""
    import struct

    import numpy as np

    from .jpeg_codec import jpeg_encode

    w, h, nf, fps = _mjpeg_dims(doc_id)
    frames = []
    for f in range(nf):
        r, g, b = _avi_frame_channels(doc_id, f, w, h)
        frames.append(jpeg_encode(np.stack([r, g, b], axis=-1), quality))
    max_size = max(map(len, frames))
    avih = struct.pack(
        "<10I", 1_000_000 // fps, max_size * fps, 0, 0, nf, 0, 1, max_size, w, h
    ) + struct.pack("<4I", 0, 0, 0, 0)
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, max_size, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    # Exactly 40 bytes (biSize..biClrImportant) so biSize=40 is truthful
    # for external AVI consumers that honor BITMAPINFOHEADER.
    strf = struct.pack(
        "<Iii2H4s5I", 40, w, h, 1, 24, b"MJPG", max_size, 0, 0, 0, 0
    )
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi = _riff_chunk(
        b"LIST", b"movi" + b"".join(_riff_chunk(b"00dc", fr) for fr in frames)
    )
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def synth_mjpeg_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL MJPEG-AVI payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_write_mjpeg_avi(int(i)) for i in ids],
                }
            )

    # codec work is CPU-heavy per row: spread the id column across
    # the executor cores BEFORE the Arrow stage (a one-column
    # shuffle of bigints) — the source table may sit in one
    # parquet partition, which would serialize every encode.
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


MJPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("psnr_ok", T.BooleanType()),
    ]
)


def mjpeg_metadata(df: DataFrame, min_psnr_db: float = 30.0) -> DataFrame:
    """Walk + decode MJPEG AVIs: container metadata from the parsed
    avih, per-frame fidelity against the source formula (every frame
    must clear ``min_psnr_db`` — a broken container walk or JPEG stage
    goes red)."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in MJPEG_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, nf, fps, frames = _parse_avi(bytes(payload))
                ok = len(frames) == nf
                for f, px in enumerate(frames):
                    r, g, b = _avi_frame_channels(int(doc_id), f, w, h)
                    src = np.stack([r, g, b], axis=-1).astype(np.float64)
                    mse = ((px.astype(np.float64) - src) ** 2).mean()
                    psnr = (
                        float("inf")
                        if mse == 0
                        else 10.0 * np.log10(255.0**2 / mse)
                    )
                    ok = ok and psnr >= min_psnr_db
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["fps"].append(fps)
                out["psnr_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=MJPEG_META_SCHEMA)


# --------------------------------------------------------------------------
# video: inter-frame-predicted I/P pictures (operators/video_codec.py)
# — the last modality tier.  Unlike the MJPEG/AVI fixtures (whose
# channel formulas the SQL oracle replays), the IPV fixture content is
# TEMPORALLY COHERENT — a static sawtooth background plus a small
# moving bright block — because that is the workload temporal
# prediction exists for: P-pictures code only the object's motion
# residual, which the gate demonstrates via coded-size stats.
# Fidelity is driver-checked through pinned integer-dB PSNR constants
# (multimodal_codec_psnr), not a formula replay: the codec is lossy
# but bit-deterministic.
# --------------------------------------------------------------------------
def _ipv_dims(doc_id: int) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, fps, gop) — all deterministic."""
    return (
        16 + doc_id % 9,
        12 + doc_id % 7,
        4 + doc_id % 5,
        AVI_FPS_CHOICES[doc_id % 5],
        4,
    )


def _ipv_frame_channels(doc_id: int, f: int, w: int, h: int):
    """Per-frame RGB channels: a temporally-static spatial sawtooth
    background (range 32..127, so the moving object never clips) with
    a 3×3 block at +96 that advances every frame.  Deterministic pure
    function of (doc_id, f)."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    chans = []
    for mul_x, mul_y, base in ((5, 3, 7), (3, 5, 11), (7, 2, 13)):
        c = (doc_id * base + x * mul_x + y * mul_y) % 96 + 32
        chans.append(np.broadcast_to(c, (h, w)).copy())
    ox = (doc_id + 2 * f) % (w - 3)
    oy = (doc_id // 3 + f) % (h - 3)
    for c in chans:
        c[oy : oy + 3, ox : ox + 3] += 96
    return tuple(c.astype(np.uint8) for c in chans)


def _write_ipv(doc_id: int, quality: int = 95) -> bytes:
    import numpy as np

    from .video_codec import ipv_encode

    w, h, nf, fps, gop = _ipv_dims(doc_id)
    frames = [
        np.stack(_ipv_frame_channels(doc_id, f, w, h), axis=-1)
        for f in range(nf)
    ]
    return ipv_encode(frames, fps=fps, quality=quality, gop=gop)


def synth_ipv_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL IPV1 inter-frame-predicted video payload per
    row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_ipv(int(i)) for i in ids]}
            )

    # codec work is CPU-heavy per row: spread ids across executor
    # cores BEFORE the Arrow stage (one-column bigint shuffle).
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


IPV_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("n_iframes", T.LongType()),
        T.StructField("n_pframes", T.LongType()),
        T.StructField("psnr_ok", T.BooleanType()),
        T.StructField("pframes_smaller", T.BooleanType()),
    ]
)


def ipv_metadata(df: DataFrame, min_psnr_db: float = 30.0) -> DataFrame:
    """Decode IPV1 streams: container metadata, frame-type census,
    per-frame fidelity against the source formula, and the
    inter-frame evidence — ``pframes_smaller`` asserts the mean
    P-picture payload is smaller than the mean I-picture payload,
    i.e. temporal prediction actually removed bits (a codec that
    silently intra-coded everything goes red)."""
    import struct as _struct

    import numpy as np

    from .video_codec import ipv_decode

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in IPV_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                data = bytes(payload)
                w, h, fps, frames, ftypes = ipv_decode(data)
                # second pass over the container for coded sizes
                sizes = {"I": [], "P": []}
                pos = 4 + _struct.calcsize("<4H2B")
                while pos + 5 <= len(data):
                    ft, ln = _struct.unpack_from("<BI", data, pos)
                    sizes["I" if ft == 0 else "P"].append(ln)
                    pos += 5 + ln
                ok = True
                for f, px in enumerate(frames):
                    src = np.stack(
                        _ipv_frame_channels(int(doc_id), f, w, h), axis=-1
                    ).astype(np.float64)
                    mse = ((px.astype(np.float64) - src) ** 2).mean()
                    psnr = (
                        float("inf")
                        if mse == 0
                        else 10.0 * np.log10(255.0**2 / mse)
                    )
                    ok = ok and psnr >= min_psnr_db
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["fps"].append(fps)
                out["n_iframes"].append(ftypes.count("I"))
                out["n_pframes"].append(ftypes.count("P"))
                out["psnr_ok"].append(bool(ok))
                out["pframes_smaller"].append(
                    bool(
                        sizes["P"]
                        and np.mean(sizes["P"]) < np.mean(sizes["I"])
                    )
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=IPV_META_SCHEMA)


CODEC_PSNR_SCHEMA = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("psnr_fl", T.LongType()),
    ]
)


def _codec_min_psnr(codec: str, doc_id: int) -> float:
    """Minimum per-frame PSNR (dB) of encode→decode vs the source
    formula for one fixture id — the scalar the pinned-constant gate
    floors.  Pure function of (codec, doc_id)."""
    import numpy as np

    from .jpeg_codec import jpeg_decode
    from .video_codec import ipv_decode

    if codec == "jpeg":
        w, h = _jpeg_dims(doc_id)
        px = jpeg_decode(_write_jpeg(doc_id))
        srcs = [np.stack(_bmp_channels(doc_id, w, h), axis=-1)]
        decs = [px]
    elif codec == "mjpeg":
        w, h, nf, fps, decs = _parse_avi(_write_mjpeg_avi(doc_id))
        srcs = [
            np.stack(_avi_frame_channels(doc_id, f, w, h), axis=-1)
            for f in range(nf)
        ]
    elif codec == "ipv":
        w, h, fps, decs, _ = ipv_decode(_write_ipv(doc_id))
        srcs = [
            np.stack(_ipv_frame_channels(doc_id, f, w, h), axis=-1)
            for f in range(len(decs))
        ]
    elif codec == "h264pr":
        # inter-residual GOP: min per-P-frame PSNR of decode vs the
        # SOURCE chain (frame 0 is I_PCM → lossless → skipped by the
        # mse > 0 guard below)
        from .h264_codec import _yuv420_to_rgb, h264_decode_gop

        w, h, frames, nals, _recs = _h264pr_gop(doc_id)
        decs, _stats = h264_decode_gop(nals)
        srcs = [
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            )
            for fy, fcb, fcr in frames
        ]
    elif codec in ("h264dc", "h264ac", "h264ac8", "h264cac8"):
        from .h264_codec import h264_decode_frame, split_annexb

        w, h, nf, _qp = _h264dc_dims(doc_id)
        payload = {
            "h264ac": _write_h264ac_probe,
            "h264ac8": _write_h264ac8_probe,
            "h264cac8": _write_h264cac8_probe,
            "h264dc": _write_h264dc_probe,
        }[codec](doc_id)
        nals = split_annexb(payload)
        decs = [h264_decode_frame(nals[3 * f : 3 * f + 3]) for f in range(nf)]
        srcs = [
            np.stack([_h264dc_probe_gray(doc_id, f, w, h)] * 3, axis=-1)
            for f in range(nf)
        ]
    elif codec == "adpcm":
        # audio: signal-to-noise of the IMA round-trip (dB), floored
        # like the video PSNRs — one scalar per clip
        src = _adpcm_pcm(doc_id).astype(np.float64)
        dec = _parse_adpcm_wav(_write_adpcm_wav(doc_id))[3].astype(np.float64)
        err = ((dec - src) ** 2).sum()
        return (
            float("inf")
            if err == 0
            else 10.0 * float(np.log10((src**2).sum() / err))
        )
    else:
        raise ValueError(f"unknown codec {codec!r}")
    worst = float("inf")
    for src, dec in zip(srcs, decs):
        mse = ((dec.astype(np.float64) - src.astype(np.float64)) ** 2).mean()
        if mse > 0:
            worst = min(worst, 10.0 * float(np.log10(255.0**2 / mse)))
    return worst


def codec_psnr_probe(spark, n_ids: int = 48) -> DataFrame:
    """(codec, doc_id, psnr_fl) over a fixed probe id set for every
    lossy codec: psnr_fl = FLOOR(min frame PSNR dB) as an integer the
    driver hash-compares against constants pinned in the oracle — so
    a partially-broken IDCT/Huffman/prediction stage shifts a value
    and goes red at the driver, not just in pytest (lossy codecs have
    no formula replay; bit-determinism makes the constants stable)."""
    import math

    probes = spark.range(n_ids).selectExpr("id AS doc_id").crossJoin(
        spark.createDataFrame(
            [("jpeg",), ("mjpeg",), ("ipv",), ("adpcm",), ("h264dc",),
             ("h264ac",), ("h264ac8",), ("h264cac8",), ("h264pr",)],
            "codec string",
        )
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in CODEC_PSNR_SCHEMA.fieldNames()}
            for codec, doc_id in zip(pdf["codec"], pdf["doc_id"].astype("int64")):
                out["codec"].append(str(codec))
                out["doc_id"].append(int(doc_id))
                # clamp: a lossless probe yields PSNR=inf, and
                # floor(inf) raises OverflowError — cap at a sentinel
                # 999 dB so a zero-error round-trip produces a row
                # instead of failing the Arrow batch
                psnr = min(_codec_min_psnr(str(codec), int(doc_id)), 999.0)
                out["psnr_fl"].append(int(math.floor(psnr)))
            yield pd.DataFrame(out)

    par = spark.sparkContext.defaultParallelism
    return probes.repartition(par).mapInPandas(
        _batches, schema=CODEC_PSNR_SCHEMA
    )


# --------------------------------------------------------------------------
# video: H.264-in-MP4 (operators/h264_codec.py) — a standards-
# conformant AVC bitstream (I_PCM macroblock subset: real SPS/PPS,
# IDR slice headers, Exp-Golomb, NAL emulation-prevention escaping)
# inside a real ISO BMFF container (ftyp/mdat/moov, avcC, stsz/stco
# sample tables).  I_PCM is lossless in YCbCr 4:2:0, and the fixture
# frames are GRAYSCALE (r=g=b → chroma exactly 128, luma == value),
# so the decode replays the channel formula EXACTLY — this gate is
# pixel-exact like BMP/PNG, not PSNR-bounded like the DCT codecs.
# --------------------------------------------------------------------------
def _mp4_dims(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) — even dims (4:2:0 constraint),
    spanning ragged-vs-macroblock-grid cases (w,h not multiples of
    16 → SPS frame cropping exercised on every row)."""
    return (
        18 + 2 * (doc_id % 8),
        14 + 2 * (doc_id % 6),
        2 + doc_id % 3,
        AVI_FPS_CHOICES[doc_id % 5],
    )


def _mp4_frame_gray(doc_id: int, f: int, w: int, h: int):
    """Grayscale frame value formula (replayed by the SQL oracle)."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return ((doc_id * 7 + f * 29 + x * 19 + y * 23) % 256).astype(np.uint8)


def _write_mp4(doc_id: int) -> bytes:
    import numpy as np

    from .h264_codec import h264_encode_frame, mp4_write

    w, h, nf, fps = _mp4_dims(doc_id)
    frames_nals = []
    for f in range(nf):
        g = _mp4_frame_gray(doc_id, f, w, h)
        frames_nals.append(
            h264_encode_frame(np.stack([g, g, g], axis=-1), idr_pic_id=f)
        )
    return mp4_write(frames_nals, w, h, fps)


def synth_mp4_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL H.264-in-MP4 payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_mp4(int(i)) for i in ids]}
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("sum_luma", T.LongType()),
        T.StructField("px000", T.LongType()),
    ]
)


def mp4_metadata(df: DataFrame) -> DataFrame:
    """Demux + decode MP4/AVC payloads: container metadata from
    moov/mdhd + SPS (cropping applied), plus EXACT pixel aggregates
    over every decoded frame — the formula-replay contract (I_PCM on
    grayscale is lossless, so any bit wrong anywhere in NAL
    unescaping, Exp-Golomb, slice parsing, or sample tables shifts
    the sums)."""
    import numpy as np

    from .h264_codec import mp4_read

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in MP4_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, fps, frames = mp4_read(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["fps"].append(fps)
                out["sum_luma"].append(
                    int(sum(int(fr[..., 0].astype(np.int64).sum()) for fr in frames))
                )
                out["px000"].append(int(frames[0][0, 0, 0]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=MP4_META_SCHEMA)


# --------------------------------------------------------------------------
# audio: IMA ADPCM (DVI4) — REAL compressed audio, completing the
# audio tier next to compressed image (PNG/GIF/JPEG) and compressed
# video (MJPEG/IPV1/H.264).  The codec is the standard 4-bit IMA
# state machine (step-size + index tables, IMA ADPCM spec; WAV format
# tag 0x0011 block layout with per-block predictor/index headers) —
# pure integer arithmetic, bit-deterministic both ways.  Fixture
# content is a sum of two integer triangle waves (ADPCM is a
# differential codec: band-limited input is its operating range; the
# PCM gate's white-noise formula would be an unfair corner).
# --------------------------------------------------------------------------
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(predictor: int, index: int, sample: int) -> tuple[int, int, int]:
    """One IMA encode step: returns (nibble, new_predictor, new_index)."""
    step = _IMA_STEPS[index]
    diff = sample - predictor
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        delta += step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
        delta += step >> 1
    if diff >= step >> 2:
        nibble |= 1
        delta += step >> 2
    predictor = predictor - delta if nibble & 8 else predictor + delta
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return nibble, predictor, index


def _ima_decode_nibble(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    step = _IMA_STEPS[index]
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    predictor = predictor - delta if nibble & 8 else predictor + delta
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return predictor, index


def adpcm_encode(samples, block_align: int = 256) -> bytes:
    """Encode mono int16 PCM as IMA ADPCM blocks (WAV tag 0x0011
    layout): each block = predictor int16 LE + index u8 + reserved u8
    + 4-bit nibbles (low nibble first), carrying
    ``(block_align - 4) * 2 + 1`` samples (the header holds the
    first verbatim).  Closed-loop: the encoder tracks the decoder's
    clamped predictor exactly, so decode is bit-deterministic."""
    import struct as _struct

    samples = [int(s) for s in samples]
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    index = 0
    for b0 in range(0, len(samples), spb):
        block = samples[b0 : b0 + spb]
        predictor = block[0]
        out += _struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in block[1:]:
            nib, predictor, index = _ima_step(predictor, index, s)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - len(nibbles) // 2)
    return bytes(out)


def adpcm_decode(data: bytes, n_samples: int, block_align: int = 256):
    """Decode IMA ADPCM blocks back to int16 PCM (numpy array)."""
    import struct as _struct

    import numpy as np

    spb = (block_align - 4) * 2 + 1
    out: list[int] = []
    pos = 0
    while pos + 4 <= len(data) and len(out) < n_samples:
        predictor, index, _ = _struct.unpack_from("<hBB", data, pos)
        index = max(0, min(88, index))
        out.append(predictor)
        want = min(spb, n_samples - len(out) + 1) - 1  # nibbles this block
        body = data[pos + 4 : pos + block_align]
        decoded = 0
        for byte in body:
            if decoded >= want:
                break
            for nib in (byte & 0xF, byte >> 4):
                if decoded >= want:
                    break
                predictor, index = _ima_decode_nibble(nib, predictor, index)
                out.append(predictor)
                decoded += 1
        pos += block_align
    return np.array(out[:n_samples], dtype=np.int16)


def _adpcm_pcm(doc_id: int):
    """Band-limited deterministic int16 PCM: sum of two integer
    triangle waves with doc-dependent periods — pure integer, SQL- and
    engine-portable, inside ADPCM's differential operating range."""
    import numpy as np

    n = 600 + (doc_id % 50) * 20
    i = np.arange(n, dtype=np.int64)

    def tri(period: int, amp: int) -> "np.ndarray":
        ph = i % period
        return np.abs(ph * 4 * amp // period - 2 * amp) - amp

    return (
        tri(40 + doc_id % 23, 9000) + tri(90 + doc_id % 41, 5000)
    ).astype("<i2")


def _write_adpcm_wav(doc_id: int, block_align: int = 64) -> bytes:
    """RIFF/WAVE with fmt tag 0x0011 (IMA ADPCM), the required fact
    chunk (total sample count), and the coded data chunk — stdlib
    struct only (the ``wave`` module cannot write compressed tags)."""
    import struct as _struct

    pcm = _adpcm_pcm(doc_id)
    coded = adpcm_encode(pcm, block_align)
    spb = (block_align - 4) * 2 + 1
    fmt = _struct.pack(
        "<HHIIHHHH",
        0x0011, 1, WAV_SAMPLE_RATE,
        WAV_SAMPLE_RATE * block_align // spb,  # avg bytes/sec
        block_align, 4,  # bits per sample
        2, spb,  # cbSize + wSamplesPerBlock
    )
    fact = _struct.pack("<I", len(pcm))
    chunks = (
        b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"fact" + _struct.pack("<I", len(fact)) + fact
        + b"data" + _struct.pack("<I", len(coded)) + coded
        + (b"\x00" if len(coded) % 2 else b"")
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _parse_adpcm_wav(data: bytes):
    """Parse an IMA-ADPCM WAV: returns (sample_rate, block_align,
    n_samples, pcm int16 array)."""
    import struct as _struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, n_samples, coded = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = _struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"fact":
            n_samples = _struct.unpack_from("<I", body, 0)[0]
        elif tag == b"data":
            coded = body
        pos += 8 + size + (size % 2)
    if fmt is None or coded is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt[0] != 0x0011:
        raise NotImplementedError(f"WAV format tag {fmt[0]:#x} is not IMA ADPCM")
    if n_samples is None:
        raise ValueError("compressed WAV missing fact chunk")
    rate, block_align = fmt[2], fmt[4]
    return rate, block_align, n_samples, adpcm_decode(coded, n_samples, block_align)


def synth_adpcm_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL IMA-ADPCM WAV payload per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_write_adpcm_wav(int(i)) for i in ids],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


# --------------------------------------------------------------------------
# video: transform-coded H.264 (Intra_16x16 luma-DC subset,
# operators/h264_codec.py) — the first rung ABOVE I_PCM: real CAVLC
# entropy coding, inverse-Hadamard DC scaling, intra prediction, and
# a closed prediction loop.  Lossy (DC-only residual), so the gate is
# metadata + census + size evidence here, with the decode fidelity
# hash-pinned as integer dB in multimodal_codec_psnr ('h264dc').
# Fixture content is constant within each 4x4 block (x//4, y//4
# formula): exactly representable by the DC-only residual, so PSNR
# measures the transform/quantization chain, not missing AC detail.
# --------------------------------------------------------------------------
def _h264dc_dims(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, qp): even dims spanning ragged
    macroblock grids, per-row qp exercising both dequant branches
    (qp < 36 rounding shift, qp >= 36 left shift)."""
    return (
        18 + 2 * (doc_id % 8),
        14 + 2 * (doc_id % 6),
        1 + doc_id % 3,
        (20, 26, 30, 34, 40)[doc_id % 5],
    )


def _h264dc_frame_gray(doc_id: int, f: int, w: int, h: int):
    """Grayscale frame, constant on the 4x4 grid (SQL-replayable)."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return ((doc_id * 5 + f * 11 + (x // 4) * 8 + (y // 4) * 16) % 256).astype(
        np.uint8
    )


def _write_h264dc(doc_id: int) -> bytes:
    """Annex-B elementary stream of nf Intra_16x16-DC IDR pictures."""
    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16dc

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        g = _h264dc_frame_gray(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16dc(
                np.stack([g, g, g], axis=-1), qp=qp, idr_pic_id=f
            )
        )
    return annexb(nals)


def synth_h264dc_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a transform-coded H.264 elementary stream per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_h264dc(int(i)) for i in ids]}
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264DC_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("qp", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("sum_luma", T.LongType()),
        T.StructField("px000", T.LongType()),
        T.StructField("smaller_than_pcm", T.BooleanType()),
    ]
)


def h264dc_metadata(df: DataFrame) -> DataFrame:
    """Decode the Annex-B stream frame group by frame group
    (SPS/PPS/IDR triplets) and emit EXACT pixel aggregates: the
    fixture is constant on the 4x4 grid, which the DC-only residual
    represents losslessly (verified ids 0..5200), so the SQL oracle
    replays decoded luma sums from the source formula — one bit wrong
    in CAVLC, the Hadamard, DC scaling, or the prediction loop shifts
    them.  ``smaller_than_pcm`` pins the transform-coding evidence:
    the CAVLC stream must beat the same pictures as I_PCM.  Lossy-
    content fidelity is separately hash-pinned per probe id in
    multimodal_codec_psnr ('h264dc')."""
    import numpy as np

    from .h264_codec import (
        annexb,
        h264_decode_frame,
        h264_encode_frame,
        split_annexb,
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264DC_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, nf, qp = _h264dc_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 3 * nf, "unexpected NAL count"
                sum_luma = 0
                px000 = -1
                pcm_bytes = 0
                for f in range(nf):
                    dec = h264_decode_frame(nals[3 * f : 3 * f + 3])
                    sum_luma += int(dec[..., 0].astype(np.int64).sum())
                    if f == 0:
                        px000 = int(dec[0, 0, 0])
                    pcm_bytes += len(
                        annexb(h264_encode_frame(dec, idr_pic_id=f))
                    )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["qp"].append(qp)
                out["mb_count"].append(
                    nf * ((w + 15) // 16) * ((h + 15) // 16)
                )
                out["sum_luma"].append(sum_luma)
                out["px000"].append(px000)
                out["smaller_than_pcm"].append(len(payload) < pcm_bytes)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264DC_META_SCHEMA)


def _h264dc_probe_gray(doc_id: int, f: int, w: int, h: int):
    """Probe content: the blocky base plus per-pixel detail of
    per-id amplitude (0..15).  The DC-only residual must discard the
    detail, so PSNR is a direct function of amplitude — a wide,
    id-varying constant spread instead of one flat floor."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    base = (doc_id * 7 + f * 29 + (x // 4) * 8 + (y // 4) * 16) % 256
    detail = (x * 19 + y * 23) % (1 + doc_id % 16)
    return ((base + detail) % 256).astype(np.uint8)


def _write_h264dc_probe(doc_id: int) -> bytes:
    """Probe stream for the pinned-PSNR gate: unlike the 4x4-blocky
    gate fixture (losslessly representable by the DC-only residual),
    the probe frames carry per-pixel detail the DC path must discard
    — PSNR varies with (id, amplitude, qp), so the frozen integer
    constants are sensitive to every stage of the
    CAVLC/Hadamard/prediction chain."""
    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16dc

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        g = _h264dc_probe_gray(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16dc(
                np.stack([g, g, g], axis=-1), qp=qp, idr_pic_id=f
            )
        )
    return annexb(nals)


# --------------------------------------------------------------------------
# video: transform-coded H.264 WITH COLOR (Intra_16x16_2_1_0,
# operators/h264_codec.py) — the first cbp != 0 macroblock type:
# everything the luma-DC gate covers PLUS the 2x2 chroma-DC residual
# path (Table 9-5 nC == -1 coeff_token, Table 9-9(a) total_zeros,
# §8.5.11 inverse 2x2 Hadamard + DC scaling, Table 8-15 QPc mapping).
# The fixture is engineered for EXACT quantization end to end:
#  - luma constant per 4x4 block (the DC-representable grid);
#  - chroma in DIAGONAL MB stripes g(my+mx) over {63, 128, 193}:
#    every macroblock's top and left chroma neighbours are EQUAL, so
#    quadrant DC prediction mixes identical values (stays exact), and
#    every stripe-to-stripe residual is a multiple of 65 = 13*5 —
#    exactly divisible through the chroma quantizer at every gate QPc
#    (LevelScale 13 at qpc%6==2, 10 at qpc%6==0).
# Verified pixel-exact for ids 0..5200 at build time; the SQL oracle
# replays decoded R/G/B sums from the source formula through the SAME
# fixed-sequence IEEE YUV→RGB arithmetic the decoder uses.
# --------------------------------------------------------------------------
_H264C_CPAL = (63, 128, 193)


def _h264c_dims(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, qp) — same ragged-grid/qp coverage
    pattern as the luma-DC gate."""
    return (
        18 + 2 * (doc_id % 8),
        14 + 2 * (doc_id % 6),
        1 + doc_id % 3,
        (20, 26, 30, 34, 40)[doc_id % 5],
    )


def _h264c_planes(doc_id: int, f: int, w: int, h: int):
    """(luma, cb, cr) fixture planes: 4x4-blocky luma, diagonal
    3-colour chroma stripes (SQL-replayable formulas)."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    luma = ((doc_id * 9 + f * 13 + (x // 4) * 8 + (y // 4) * 24) % 256).astype(
        np.uint8
    )
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cx = np.arange(cw, dtype=np.int64)[None, :]
    cy = np.arange(ch, dtype=np.int64)[:, None]
    s = (cy // 8) + (cx // 8)
    pal = np.array(_H264C_CPAL, np.int64)
    cb = pal[(doc_id + f + s) % 3].astype(np.uint8)
    cr = pal[(2 * doc_id + f + s) % 3].astype(np.uint8)
    return luma, cb, cr


def _write_h264c(doc_id: int) -> bytes:
    """Annex-B elementary stream of nf Intra_16x16_2_1_0 IDR pictures
    (YUV-level encode: the fixture is exact in YUV space)."""
    from .h264_codec import annexb, h264_encode_frame_i16cdc_yuv

    w, h, nf, qp = _h264c_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        luma, cb, cr = _h264c_planes(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16cdc_yuv(
                luma, cb, cr, w, h, qp=qp, idr_pic_id=f
            )
        )
    return annexb(nals)


def synth_h264c_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a colour transform-coded H.264 stream per row."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_write_h264c(int(i)) for i in ids]}
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264C_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("qp", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("smaller_than_pcm", T.BooleanType()),
    ]
)


def h264c_metadata(df: DataFrame) -> DataFrame:
    """Decode the colour stream and emit EXACT per-channel pixel sums:
    the fixture round-trips losslessly through the luma-DC AND
    chroma-DC transform paths (verified ids 0..5200), so the SQL
    oracle replays the sums from the source formulas through the same
    fixed-sequence IEEE YUV→RGB conversion — one bit wrong in the
    chroma coeff_token table, the 2x2 Hadamard, the QPc mapping, or
    the quadrant prediction shifts them.  ``smaller_than_pcm`` pins
    the entropy-coding evidence."""
    import numpy as np

    from .h264_codec import (
        annexb,
        h264_decode_frame,
        h264_encode_frame,
        split_annexb,
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264C_META_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, nf, qp = _h264c_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 3 * nf, "unexpected NAL count"
                sums = np.zeros(3, np.int64)
                pcm_bytes = 0
                for f in range(nf):
                    dec = h264_decode_frame(nals[3 * f : 3 * f + 3])
                    sums += dec.astype(np.int64).sum(axis=(0, 1))
                    pcm_bytes += len(
                        annexb(h264_encode_frame(dec, idr_pic_id=f))
                    )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["qp"].append(qp)
                out["mb_count"].append(
                    nf * ((w + 15) // 16) * ((h + 15) // 16)
                )
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["smaller_than_pcm"].append(len(payload) < pcm_bytes)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264C_META_SCHEMA)


def _write_h264ac_probe(doc_id: int) -> bytes:
    """Probe stream for the pinned-PSNR gate over the luma-AC path
    (Intra_16x16_2_1_1, single-coefficient subset): SAME detail
    content as the h264dc probe, so the pinned h264ac constants are
    directly comparable — the AC coefficient captures part of the
    per-pixel detail the DC-only path must discard, and the gate's
    per-id constants pin exactly how much."""
    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16ac

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        g = _h264dc_probe_gray(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16ac(
                np.stack([g, g, g], axis=-1), qp=qp, idr_pic_id=f
            )
        )
    return annexb(nals)


def _write_h264ac8_probe(doc_id: int) -> bytes:
    """Probe stream for the pinned-PSNR gate over the DENSE-8
    multi-coefficient CAVLC path (nC >= 8 FLC column): same probe
    content as the h264dc/h264ac probes, so the three rungs' pinned
    constants are directly comparable — NOT a monotone ladder: the
    pinned density forces eight coefficients per block, so on
    low-detail probes the forced +1 fills make it deliberately
    noisier than the adaptive single-AC rung, and the per-id
    constants pin exactly that trade-off."""
    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16ac8

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        g = _h264dc_probe_gray(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16ac8(
                np.stack([g, g, g], axis=-1), qp=qp, idr_pic_id=f
            )
        )
    return annexb(nals)


# --------------------------------------------------------------------------
# audio: windowed frame features over decoded PCM — the VAD /
# segmentation front-end (energy, peak, zero-crossing rate per frame)
# --------------------------------------------------------------------------
WAV_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy_abs", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def wav_frame_features(df: DataFrame, frame_len: int = 160) -> DataFrame:
    """Windowed audio features over decoded WAV payloads: each
    ``frame_len``-sample window (20 ms at 8 kHz) yields exact-integer
    energy (Σ|a|), peak (max |a|), and zero-crossing count (adjacent
    pairs within the window whose signs differ, sign = a < 0) — the
    classic voice-activity / segmentation front-end, producing the
    frame-feature table an audio curation pipeline filters on.

    One row per (doc, frame): the decode + windowed reductions run
    vectorized per row inside Arrow batches (np.add.reduceat /
    bincount — no per-sample Python), rows are independent
    (embarrassingly parallel), and the row explosion is bounded by
    audio duration, not corpus size.  All-integer outputs replay
    bit-exactly in the SQL oracle.
    """
    import io
    import wave

    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in WAV_FRAME_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    nf = w.getnframes()
                    pcm = np.frombuffer(
                        w.readframes(nf), dtype="<i2"
                    ).astype(np.int64)
                n = len(pcm)
                n_frames = -(-n // frame_len)
                starts = np.arange(n_frames) * frame_len
                absa = np.abs(pcm)
                energy = np.add.reduceat(absa, starts)
                peak = np.maximum.reduceat(absa, starts)
                sizes = np.diff(np.append(starts, n))
                idx = np.arange(n - 1)
                neg = pcm < 0
                cross = (neg[:-1] != neg[1:]) & (idx % frame_len != frame_len - 1)
                zc = np.bincount(
                    idx[cross] // frame_len, minlength=n_frames
                )
                out["doc_id"].extend([int(doc_id)] * n_frames)
                out["frame_idx"].extend(range(n_frames))
                out["n_samples"].extend(int(x) for x in sizes)
                out["energy_abs"].extend(int(x) for x in energy)
                out["peak"].extend(int(x) for x in peak)
                out["zero_crossings"].extend(int(x) for x in zc)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=WAV_FRAME_SCHEMA)


# --------------------------------------------------------------------------
# video: scene-cut detection over a LOSSLESS H.264 round-trip —
# per-adjacent-frame SAD (sum of absolute luma differences), the
# standard shot-boundary signal video curation pipelines threshold on
# --------------------------------------------------------------------------
def _scene_dims(doc_id: int) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, fps, cut_frame): even dims (4:2:0),
    non-multiple-of-16 (SPS cropping exercised), a planted scene
    change at cut_frame."""
    return (
        18 + 2 * (doc_id % 5),
        14 + 2 * (doc_id % 4),
        6 + doc_id % 3,
        10,
        3 + doc_id % 2,
    )


def _scene_frame_gray(doc_id: int, f: int, w: int, h: int, cut: int):
    """Two-scene frame formula (replayed by the SQL oracle): scene A
    before the cut, a differently-parameterized scene B from it."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    if f < cut:
        v = (doc_id * 7 + f * 29 + x * 19 + y * 23) % 256
    else:
        v = (doc_id * 13 + f * 31 + x * 17 + y * 11 + 97) % 256
    return v.astype(np.uint8)


def synth_scene_mp4_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL H.264-in-MP4 payload with a planted scene change
    (I_PCM subset — lossless, so decoded pixels equal the formula)."""
    import numpy as np

    from .h264_codec import h264_encode_frame, mp4_write

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _one(doc_id: int) -> bytes:
        w, h, nf, fps, cut = _scene_dims(doc_id)
        frames_nals = []
        for f in range(nf):
            g = _scene_frame_gray(doc_id, f, w, h, cut)
            frames_nals.append(
                h264_encode_frame(np.stack([g, g, g], axis=-1), idr_pic_id=f)
            )
        return mp4_write(frames_nals, w, h, fps)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_one(int(i)) for i in ids]}
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col).repartition(par).mapInPandas(_batches, schema=schema)
    )


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("sad", T.LongType()),
        T.StructField("mean_sad_x100", T.LongType()),
    ]
)


def mp4_scene_cuts(df: DataFrame) -> DataFrame:
    """Demux + decode MP4/AVC payloads and emit the shot-boundary
    signal: for every adjacent frame pair, the exact luma SAD
    (Σ|a−b| over pixels, BIGINT) plus the per-pixel mean ×100 (integer
    DIV) — what a video curation pipeline thresholds to split shots.
    The codec subset is lossless on grayscale, so the oracle replays
    the two-scene formula and the SAD arithmetic bit-exactly — any
    decode drift anywhere in the container/NAL/slice path shifts the
    sums.  One output row per (doc, frame>=1); rows independent,
    Arrow-batched, no shuffle."""
    import numpy as np

    from .h264_codec import mp4_read

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in SCENE_CUT_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, fps, frames = mp4_read(bytes(payload))
                lumas = [fr[..., 0].astype(np.int64) for fr in frames]
                for f in range(1, len(lumas)):
                    sad = int(np.abs(lumas[f] - lumas[f - 1]).sum())
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["sad"].append(sad)
                    out["mean_sad_x100"].append(sad * 100 // (w * h))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=SCENE_CUT_SCHEMA)


# --------------------------------------------------------------------------
# image: histogram equalization — a REAL pixel transform (contrast
# normalization) in exact integer arithmetic over decoded BMPs
# --------------------------------------------------------------------------
BMP_EQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_eq_r", T.LongType()),
        T.StructField("min_eq_r", T.LongType()),
        T.StructField("max_eq_r", T.LongType()),
        T.StructField("px00_eq_r", T.LongType()),
    ]
)


def bmp_equalize_stats(df: DataFrame) -> DataFrame:
    """Histogram-equalize the R channel of decoded BMP payloads and
    report exact integer stats of the remapped image — the standard
    contrast-normalization preprocessing step, done the classic way:
    eq(v) = ((cdf(v) − cdf_min) · 255) DIV (n − cdf_min), cdf from
    the per-image 256-bin histogram.  Pure integer ops, so the whole
    transform replays bit-exactly in the SQL oracle (which rebuilds
    the histogram and CDF from the pixel formula).  Per-row
    independent, Arrow-batched, no shuffle."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_EQ_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_bmp(bytes(payload))
                r = px[..., 0].astype(np.int64).ravel()
                n = r.size
                hist = np.bincount(r, minlength=256)
                cdf = np.cumsum(hist)
                cdf_min = int(cdf[int(r.min())])
                if n > cdf_min:
                    eq_map = ((cdf - cdf_min) * 255) // (n - cdf_min)
                else:
                    eq_map = np.zeros(256, dtype=np.int64)
                eq = eq_map[r]
                out["doc_id"].append(int(doc_id))
                out["n_pixels"].append(n)
                out["sum_eq_r"].append(int(eq.sum()))
                out["min_eq_r"].append(int(eq.min()))
                out["max_eq_r"].append(int(eq.max()))
                out["px00_eq_r"].append(int(eq_map[int(px[0, 0, 0])]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=BMP_EQ_SCHEMA)


# --------------------------------------------------------------------------
# image near-duplicate hashing: dHash (difference hash) over real
# decoded BMPs.  The classic perceptual fingerprint for image-corpus
# dedup — integer-only (block-mean downscale + neighbor comparison),
# so unlike DCT pHash the whole hash replays bit-exactly in SQL.
# --------------------------------------------------------------------------
#: fixture geometry: 18×16 source pixels → 9×8 block means → 8×8
#: comparison bits → four 16-bit LSH bands.
DHASH_W, DHASH_H = 18, 16

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band0", T.LongType()),
        T.StructField("band1", T.LongType()),
        T.StructField("band2", T.LongType()),
        T.StructField("band3", T.LongType()),
    ]
)


def _neardup_bmp_channels(doc_id: int, w: int, h: int):
    """Grayscale near-dup fixture: the base pattern depends only on
    the GROUP (doc_id mod 50) — including its spatial frequencies, so
    distinct groups differ structurally, not by a brightness offset
    dHash is (correctly) invariant to — plus ~3 per-DOC impulse
    pixels (+40 where (doc_id·31 + y·w + x) ≡ 0 mod 97).  Same-group
    images therefore hash within a few bits of each other; all
    arithmetic is linear-congruence + mod, replayable in plain SQL."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    grp = doc_id % 50
    # dHash compares HORIZONTAL neighbors only, so group separation
    # must live in the x-frequency: 20 + 2·grp is unique per group
    # (measured: same-group Hamming ≤ 2-3, cross-group ≥ 19).
    base = grp * 37 + x * (20 + 2 * grp) + y * 23
    impulse = ((doc_id * 31 + y * w + x) % 97 == 0).astype(np.int64)
    v = ((base + 40 * impulse) % 256).astype(np.uint8)
    return v, v, v


def synth_neardup_bmp_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL 18×16 grayscale 24-bit BMP per row, built so that
    rows sharing ``doc_id mod 50`` are visual near-duplicates (same
    base pattern, different impulse noise) — the image-corpus analogue
    of the text near-dup fixtures."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                r, g, b = _neardup_bmp_channels(int(i), DHASH_W, DHASH_H)
                payloads.append(
                    _bmp_payload_from_rgb(r, g, b, DHASH_W, DHASH_H)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def _pack_delta_bands(bits, band_bits: int) -> list[int]:
    """Pack a flat 0/1 bit array little-endian-within-band into
    ``len(bits) // band_bits`` integers — the one packing used by
    every fingerprint in this module (image 64/128-bit, audio, video),
    so its properties hold for all of them."""
    import numpy as np

    offsets = np.arange(band_bits, dtype=np.int64)
    return [
        int((bits[k * band_bits : (k + 1) * band_bits] << offsets).sum())
        for k in range(len(bits) // band_bits)
    ]


def _dhash64_bands(v) -> list[int]:
    """64-bit dHash of an 18×16 int64 luma array: 2×2 block means →
    8×9 grid → 8×8 horizontal comparison bits → four 16-bit bands.
    Pure function (property-tested: brightness-offset invariant)."""
    m = (
        v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2]
    ) // 4  # (8 rows, 9 cols)
    import numpy as np

    bits = (m[:, :-1] > m[:, 1:]).astype(np.int64).ravel()
    return _pack_delta_bands(bits, 16)


def _dhash128_bands(v) -> list[int]:
    """128-bit fine dHash of an 18×16 int64 luma array: 1×2 block
    means → 16×9 grid → 16×8 comparison bits → four 32-bit bands.
    Pure function (see ``bmp_dhash_fine`` for why it exists)."""
    import numpy as np

    m = (v[:, 0::2] + v[:, 1::2]) // 2  # (16 rows, 9 cols)
    bits = (m[:, :-1] > m[:, 1:]).astype(np.int64).ravel()
    return _pack_delta_bands(bits, 32)


def bmp_dhash(df: DataFrame) -> DataFrame:
    """dHash over decoded BMP payloads: 2×2 integer block means down
    to 9×8, bit(Y,X) = mean(X,Y) > mean(X+1,Y) for the 8×8 comparison
    grid, bits packed little-endian-within-band into four 16-bit LSH
    bands (bit p = Y·8+X lands in band p div 16 at offset p mod 16).
    Integer-only ⇒ the SQL oracle rebuilds the identical bands from
    the pixel formula.  Per-row independent, Arrow-batched; the
    banded-join candidate stage downstream is pure DataFrame ops
    (see operators/dedup.py::hamming_neardup_stats)."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DHASH_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_bmp(bytes(payload))
                if (w, h) != (DHASH_W, DHASH_H):
                    raise ValueError("dhash fixture expects 18x16 BMPs")
                v = px[..., 0].astype(np.int64)  # grayscale ⇒ R = luma
                bands = _dhash64_bands(v)
                out["doc_id"].append(int(doc_id))
                for k in range(4):
                    out[f"band{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=DHASH_SCHEMA)


def synth_neardup_bmp_table_scaled(
    df: DataFrame, id_col: str = "doc_id", cluster_size: int = 10
) -> DataFrame:
    """Corpus-scale variant of ``synth_neardup_bmp_table``: the
    oracle-gated fixture has a FIXED 50 groups, so its group size —
    and hence near-dup pair volume — grows as n²/50 with the corpus.
    Here the cluster id is ``doc_id div cluster_size``: cluster count
    scales with n, pair volume stays linear, which is what a real
    image corpus looks like (bounded duplicate clusters).  Patterns
    come from an avalanche mix (xor-multiply; a linear congruence
    keeps horizontal gradients constant across clusters and dHash
    can't separate them — measured: same-cluster Hamming ≤ 7,
    cross-cluster ≥ 18, ~4 random band collisions per doc)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    w, h = DHASH_W, DHASH_H
    p = np.arange(w * h, dtype=np.uint64).reshape(h, w)
    xg = np.arange(w, dtype=np.int64)[None, :]
    yg = np.arange(h, dtype=np.int64)[:, None]

    def _payload(doc_id: int) -> bytes:
        c = np.uint64(doc_id // cluster_size)
        a = (p + np.uint64(1)) * np.uint64(0x9E3779B1)
        b = (c + np.uint64(1)) * np.uint64(0x85EBCA77)
        base = (
            (((a ^ b) * np.uint64(0xC2B2AE3D)) >> np.uint64(33))
            % np.uint64(256)
        ).astype(np.int64)
        imp = ((doc_id * 31 + yg * w + xg) % 97 == 0).astype(np.int64)
        v = ((base + 40 * imp) % 256).astype(np.uint8)
        return _bmp_payload_from_rgb(v, v, v, w, h)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_payload(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def bmp_dhash_fine(df: DataFrame) -> DataFrame:
    """128-bit fine dHash — the AT-SCALE fingerprint: 1×2 block means
    (16×9 grid), 16×8 horizontal comparison bits, four 32-bit bands.

    Why it exists: the classic 64-bit hash bands into 16-bit keys, so
    RANDOM band collisions grow as n²/2¹⁶ — measured superlinear past
    ~300k images (SCALING.md).  Wider bands need more hash bits to
    keep recall (with 4 bands the pigeonhole guarantee and the
    flip-spread probability both ride on bits-per-band), so the scale
    path doubles the grid instead of just re-slicing it: collisions
    fall to n²/2³², same-cluster distances stay far below threshold
    (measured ≤ 8 vs cross-cluster ≥ 43 on the scaled fixture; use
    max_hamming≈16).  Same integer-only arithmetic — SQL-replayable
    like the 64-bit gate."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DHASH_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                w, h, px = _parse_bmp(bytes(payload))
                if (w, h) != (DHASH_W, DHASH_H):
                    raise ValueError("dhash fixture expects 18x16 BMPs")
                v = px[..., 0].astype(np.int64)
                bands = _dhash128_bands(v)
                out["doc_id"].append(int(doc_id))
                for k in range(4):
                    out[f"band{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=DHASH_SCHEMA)


# --------------------------------------------------------------------------
# audio near-duplicate fingerprinting: energy-delta fingerprint over
# real decoded PCM — the classic audio-fingerprint front-end (frame
# the signal, keep only the SIGN of adjacent frame-energy deltas),
# banded for the same Hamming-LSH join the image pipeline uses.
# --------------------------------------------------------------------------
#: fingerprint geometry: 65 frames × 40 samples → 64 delta bits →
#: four 16-bit bands (same band shape as the 64-bit image dHash, so
#: dedup.hamming_neardup_* is shared verbatim across modalities).
AUDIO_FP_FRAME = 40
AUDIO_FP_FRAMES = 65


def _neardup_wav_pcm(doc_id: int):
    """Near-dup audio fixture: the frame-amplitude ENVELOPE depends
    only on the group (doc_id mod 50, group-unique frame frequency),
    plus sparse per-doc impulses (+800 where (doc_id·31 + i) ≡ 0 mod
    97) — same-group clips fingerprint within a few bits (an impulse
    only flips a delta whose |ΔE| < 800), cross-group ~30.  Linear
    congruences only, replayable in plain SQL."""
    import numpy as np

    n = AUDIO_FP_FRAME * AUDIO_FP_FRAMES
    g = doc_id % 50
    i = np.arange(n, dtype=np.int64)
    amp = (g * 37 + (i // AUDIO_FP_FRAME) * (20 + 2 * g)) % 193
    imp = ((doc_id * 31 + i) % 97 == 0).astype(np.int64)
    return (amp + 800 * imp).astype("<i2")


def synth_neardup_wav_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL mono 16-bit PCM WAV per row whose rows sharing
    ``doc_id mod 50`` are acoustic near-duplicates — the audio
    analogue of ``synth_neardup_bmp_table``."""
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
                    w.writeframes(_neardup_wav_pcm(int(doc_id)).tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def wav_energy_fingerprint(df: DataFrame) -> DataFrame:
    """Energy-delta audio fingerprint over decoded WAV payloads:
    sum the signal per 40-sample frame, keep bit p = E[p+1] > E[p]
    for the first 64 deltas, pack into four 16-bit bands (same schema
    as the image dHash — ``dedup.hamming_neardup_stats`` consumes
    either).  Sign-of-delta fingerprints are robust to uniform gain
    (the property real audio-fingerprint systems ride on) and
    integer-only, so the SQL oracle rebuilds them exactly.  Per-row
    independent, Arrow-batched."""
    import io
    import wave

    import numpy as np

    need = AUDIO_FP_FRAME * AUDIO_FP_FRAMES

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DHASH_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                if len(pcm) < need:
                    raise ValueError(
                        f"fingerprint needs >= {need} samples, got {len(pcm)}"
                    )
                e = pcm[:need].reshape(AUDIO_FP_FRAMES, AUDIO_FP_FRAME).sum(
                    axis=1
                )
                bands = _pack_delta_bands(
                    (e[1:] > e[:-1]).astype(np.int64), 16
                )
                out["doc_id"].append(int(doc_id))
                for k in range(4):
                    out[f"band{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=DHASH_SCHEMA)


# --------------------------------------------------------------------------
# video near-duplicate fingerprinting: temporal luma-delta fingerprint
# over real decoded AVI frames — the third modality on the SAME
# banded Hamming-LSH engine (images: spatial dHash; audio: frame
# energies; video: per-frame luma sums).
# --------------------------------------------------------------------------
#: 65 frames → 64 temporal delta bits → four 16-bit bands.
VIDEO_FP_FRAMES = 65
VIDEO_FP_W, VIDEO_FP_H = 4, 4


def _neardup_avi_frames(doc_id: int):
    """Near-dup video fixture: each 4×4 frame is a CONSTANT gray
    level A(g, f) = (g·37 + f·(20 + 2g)) % 193 from the group's
    temporal envelope, +40 on the ~3 per-doc noisy frames where
    (doc_id·31 + f) ≡ 0 mod 23 — same-group clips fingerprint within
    a few bits (measured ≤ 6), cross-group ≥ 11.  Values stay < 256
    (no wrap), all linear congruences: the SQL oracle rebuilds every
    frame sum."""
    g = doc_id % 50
    # A constant gray 4×4 frame's DIB bytes are 48 copies of the
    # value (12-byte rows, zero padding, B=G=R=v, row order moot) —
    # byte-identical to _dib_frame_bytes on the full arrays
    # (unit-asserted), ~10× cheaper than per-frame numpy at the
    # 325k-frames-per-bench-entry fixture scale.
    frame_len = VIDEO_FP_W * VIDEO_FP_H * 3
    frames = []
    for f in range(VIDEO_FP_FRAMES):
        v = (g * 37 + f * (20 + 2 * g)) % 193
        if (doc_id * 31 + f) % 23 == 0:
            v += 40
        frames.append(bytes([v]) * frame_len)
    return frames


def synth_neardup_avi_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL uncompressed AVI per row whose rows sharing
    ``doc_id mod 50`` are temporal near-duplicates — the video
    analogue of the image/audio near-dup fixtures."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                _avi_container(
                    _neardup_avi_frames(int(i)),
                    VIDEO_FP_W,
                    VIDEO_FP_H,
                    VIDEO_FP_FRAMES,
                    10,
                )
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(_batches, schema=schema)


def avi_temporal_fingerprint(df: DataFrame) -> DataFrame:
    """Temporal luma-delta video fingerprint over decoded AVI
    payloads: sum the R channel per frame (grayscale fixtures ⇒ R =
    luma), keep bit p = S[p+1] > S[p] for the first 64 frame deltas,
    pack into four 16-bit bands — the same fingerprint schema as the
    image dHash and audio energy hash, so
    ``dedup.hamming_neardup_stats`` serves all three modalities.
    Sign-of-delta is brightness-gain invariant; integer-only, so the
    SQL oracle replays it exactly.  Per-row independent,
    Arrow-batched."""
    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DHASH_SCHEMA.fieldNames()}
            for doc_id, payload in zip(
                pdf["doc_id"].astype("int64"), pdf["payload"]
            ):
                _, _, _, _, frames = _parse_avi(bytes(payload))
                if len(frames) < VIDEO_FP_FRAMES:
                    raise ValueError(
                        f"fingerprint needs >= {VIDEO_FP_FRAMES} frames,"
                        f" got {len(frames)}"
                    )
                s = np.array(
                    [
                        int(fr[..., 0].astype(np.int64).sum())
                        for fr in frames[:VIDEO_FP_FRAMES]
                    ],
                    dtype=np.int64,
                )
                bands = _pack_delta_bands(
                    (s[1:] > s[:-1]).astype(np.int64), 16
                )
                out["doc_id"].append(int(doc_id))
                for k in range(4):
                    out[f"band{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=DHASH_SCHEMA)


# --------------------------------------------------------------------------
# binaryFile ingest: the REAL Spark on-ramp for media corpora —
# spark.read.format("binaryFile") over a directory of image files,
# with the id recovered from the path.  (At 100 TB you'd pack small
# media into parquet/tar shards — the source here is the standard
# first hop that produces those shards.)
# --------------------------------------------------------------------------
def materialize_neardup_bmp_dir(
    spark, ids: list[int], base_dir: str | None = None
) -> str:
    """Write the near-dup BMP fixtures as REAL files (one per id,
    ``img_<id>.bmp``) and return the directory.  Deterministic
    payloads ⇒ safe to reuse across runs: a marker file written after
    a complete populate makes the populate write-once; partial dirs
    (no marker) are re-populated."""
    import os
    import tempfile

    base = base_dir or os.path.join(
        tempfile.gettempdir(), f"dtps_binaryfile_{len(ids)}"
    )
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        for doc_id in ids:
            r, g, b = _neardup_bmp_channels(int(doc_id), DHASH_W, DHASH_H)
            path = os.path.join(base, f"img_{int(doc_id)}.bmp")
            with open(path, "wb") as f:
                f.write(_bmp_payload_from_rgb(r, g, b, DHASH_W, DHASH_H))
        with open(marker, "wb"):
            pass
    return base


def binaryfile_ingest_dhash(spark, directory: str) -> DataFrame:
    """Ingest a directory of image files through Spark's native
    ``binaryFile`` source (distributed file listing, per-file rows of
    path/length/content, ``pathGlobFilter`` pushdown so the marker
    and any non-BMP files never leave the scan) and fingerprint the
    decoded bytes — the id comes from the filename, the bytes from
    the FILESYSTEM, so this gate fails if the source drops, pads, or
    reorders file content."""
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(directory)
    )
    payloads = bf.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("payload"),
        F.col("length").cast("bigint").alias("n_bytes"),
    )
    hashes = bmp_dhash(payloads.select("doc_id", "payload"))
    return hashes.join(
        payloads.select("doc_id", "n_bytes"), "doc_id"
    ).select("doc_id", "band0", "band1", "band2", "band3", "n_bytes")


def _write_h264cac8_probe(doc_id: int) -> bytes:
    """Probe stream for the pinned-PSNR gate over the CHROMA-AC
    dense-8 path (cbp_chroma 2): same gray probe content — neutral
    chroma, so the eight FORCED chroma coefficients per block are
    pure added color noise, and the constants pin exactly how much
    the chroma quantizer/transform chain injects."""
    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16ac8

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    for f in range(nf):
        g = _h264dc_probe_gray(doc_id, f, w, h)
        nals.extend(
            h264_encode_frame_i16ac8(
                np.stack([g, g, g], axis=-1),
                qp=qp,
                idr_pic_id=f,
                chroma_ac=True,
            )
        )
    return annexb(nals)


# --------------------------------------------------------------------------
# dense-8 H.264 (multi-coefficient CAVLC through the formula-defined
# nC >= 8 FLC column): fixture, decode, and structural evidence
# --------------------------------------------------------------------------
H264AC8_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("qp", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("denser_than_single_ac", T.BooleanType()),
        T.StructField("smaller_than_pcm", T.BooleanType()),
    ]
)


def _write_h264ac8(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of nf DENSE-8 IDR pictures, md5 of the
    concatenated closed-loop reconstructions) — the rec hash comes
    from the SAME encoder pass that produced the stream, so the
    verify side pays one decode, not a second encode."""
    import hashlib

    import numpy as np

    from .h264_codec import annexb, h264_encode_frame_i16ac8_with_rec

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    md5 = hashlib.md5()
    for f in range(nf):
        g = _h264dc_probe_gray(doc_id, f, w, h)
        fn, rec = h264_encode_frame_i16ac8_with_rec(
            np.stack([g, g, g], axis=-1), qp=qp, idr_pic_id=f
        )
        nals.extend(fn)
        md5.update(rec.tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264ac8_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a dense-8 transform-coded H.264 stream per row, plus
    the encoder's closed-loop reconstruction hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264ac8(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264ac8_metadata(df: DataFrame) -> DataFrame:
    """Decode the dense-8 Annex-B stream and emit the structural
    evidence the SQL oracle pins: ``roundtrip_exact`` — the decoder
    reproduces the encoder's closed-loop reconstruction BIT-FOR-BIT
    (every block but the frame corner parses through the nC >= 8 FLC
    coeff_token column; one wrong code desyncs the reader and the
    equality breaks), ``denser_than_single_ac`` — the dense-8 stream
    of the same pictures outweighs the single-coefficient encode
    (eight levels per block genuinely reach the bitstream), and
    ``smaller_than_pcm`` — entropy coding still beats I_PCM.
    Lossy-content fidelity is separately hash-pinned per probe id in
    multimodal_codec_psnr ('h264ac8')."""
    import numpy as np

    from .h264_codec import (
        annexb,
        h264_decode_frame,
        h264_encode_frame,
        h264_encode_frame_i16ac,
        split_annexb,
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264AC8_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, qp = _h264dc_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 3 * nf, "unexpected NAL count"
                md5 = hashlib.md5()
                dec0 = None
                for f in range(nf):
                    dec = h264_decode_frame(nals[3 * f : 3 * f + 3])
                    if f == 0:
                        dec0 = dec
                    md5.update(dec.tobytes())
                exact = md5.hexdigest() == str(rec_md5)
                # ordering evidence on frame 0 only (the comparison
                # encoders are full Python MB loops; one frame pins
                # the same property at 1/nf the cost), reusing the
                # roundtrip loop's decode of frame 0
                src0 = np.stack(
                    [_h264dc_probe_gray(int(doc_id), 0, w, h)] * 3, axis=-1
                )
                f0_bytes = len(annexb(nals[0:3]))
                pcm0 = len(
                    annexb(h264_encode_frame(dec0, idr_pic_id=0))
                )
                single0 = len(
                    annexb(h264_encode_frame_i16ac(src0, qp=qp, idr_pic_id=0))
                )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["qp"].append(qp)
                out["mb_count"].append(
                    nf * ((w + 15) // 16) * ((h + 15) // 16)
                )
                out["roundtrip_exact"].append(exact)
                out["denser_than_single_ac"].append(f0_bytes > single0)
                out["smaller_than_pcm"].append(f0_bytes < pcm0)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264AC8_META_SCHEMA)


# --------------------------------------------------------------------------
# full-color dense-8 H.264 (cbp_chroma 2 — chroma AC residuals):
# fixture with real chroma texture, decode, structural evidence
# --------------------------------------------------------------------------
H264CAC8_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("qp", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("denser_than_chroma_dc", T.BooleanType()),
        T.StructField("smaller_than_pcm", T.BooleanType()),
    ]
)


def _h264cac8_frame_rgb(doc_id: int, f: int, w: int, h: int):
    """Color frame with independent per-channel texture (rich luma
    AND chroma AC energy per 4x4 block)."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = ((doc_id * 7 + f * 29 + x * 13 + y * 7) % 256).astype(np.uint8)
    g = ((doc_id * 5 + f * 31 + x * 3 + y * 11) % 256).astype(np.uint8)
    b = ((doc_id * 3 + f * 37 + x * 17 + y * 5) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _write_h264cac8(doc_id: int) -> tuple[bytes, str]:
    import hashlib

    from .h264_codec import annexb, h264_encode_frame_i16ac8_with_rec

    w, h, nf, qp = _h264dc_dims(doc_id)
    nals: list[bytes] = []
    md5 = hashlib.md5()
    for f in range(nf):
        fn, rec = h264_encode_frame_i16ac8_with_rec(
            _h264cac8_frame_rgb(doc_id, f, w, h),
            qp=qp,
            idr_pic_id=f,
            chroma_ac=True,
        )
        nals.extend(fn)
        md5.update(rec.tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264cac8_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a full-color chroma-AC dense-8 H.264 stream per row,
    plus the encoder's closed-loop reconstruction hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264cac8(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264cac8_metadata(df: DataFrame) -> DataFrame:
    """Decode the full-color chroma-AC stream and emit the oracle
    evidence: ``roundtrip_exact`` (decode ≡ closed loop bit-for-bit —
    now including the per-plane chroma nC grids, the §7.3.5.3.3
    DC-then-AC residual order, and the chroma-QP transform chain),
    ``denser_than_chroma_dc`` (the cbp_chroma 2 stream outweighs the
    cbp_chroma 1 encode of the same pictures), and
    ``smaller_than_pcm``.  Fidelity is hash-pinned per probe id in
    multimodal_codec_psnr ('h264cac8')."""
    import numpy as np

    from .h264_codec import (
        annexb,
        h264_decode_frame,
        h264_encode_frame,
        h264_encode_frame_i16ac8,
        split_annexb,
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264CAC8_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, qp = _h264dc_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 3 * nf, "unexpected NAL count"
                md5 = hashlib.md5()
                dec0 = None
                for f in range(nf):
                    dec = h264_decode_frame(nals[3 * f : 3 * f + 3])
                    if f == 0:
                        dec0 = dec
                    md5.update(dec.tobytes())
                exact = md5.hexdigest() == str(rec_md5)
                # ordering evidence on frame 0 only (see h264ac8),
                # reusing the roundtrip loop's decode of frame 0
                src0 = _h264cac8_frame_rgb(int(doc_id), 0, w, h)
                f0_bytes = len(annexb(nals[0:3]))
                pcm0 = len(
                    annexb(h264_encode_frame(dec0, idr_pic_id=0))
                )
                dconly0 = len(
                    annexb(
                        h264_encode_frame_i16ac8(src0, qp=qp, idr_pic_id=0)
                    )
                )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["qp"].append(qp)
                out["mb_count"].append(
                    nf * ((w + 15) // 16) * ((h + 15) // 16)
                )
                out["roundtrip_exact"].append(exact)
                out["denser_than_chroma_dc"].append(f0_bytes > dconly0)
                out["smaller_than_pcm"].append(f0_bytes < pcm0)
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264CAC8_META_SCHEMA)


# --------------------------------------------------------------------------
# H.264 P-slice GOPs — the inter-prediction stub narrowed: real
# motion-compensated P pictures (P_Skip runs with spec-derived MVs,
# full-pel P_L0_16x16 with median-predictor MVD coding, I_PCM
# conditional replenishment), closed-loop exact so every count and
# the reconstruction hash replay in SQL
# --------------------------------------------------------------------------
H264P_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mvx", T.LongType()),
        T.StructField("mvy", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("ipcm_p_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264p_dims(doc_id: int) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, mvx, mvy): macroblock-ALIGNED grids
    from 2x1 to 4x2 (frame cropping is already pinned by the intra
    gates; aligned dims keep the mode-census formulas exact — with a
    ragged width the pad-replicated right-edge MB goes constant after
    the first pan and legitimately skips, breaking the pure-geometry
    count), GOPs of 3-5 pictures, and per-document pan vectors in
    quarter-pel units — always multiples of 8 so luma AND chroma
    motion compensation stay full-pel (the implemented subset),
    always nonzero horizontally, and with total pan travel (≤ 2 pans
    × 4 px) far below one macroblock so edge clamping can never make
    a census-relevant MB constant."""
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        3 + doc_id % 3,
        8 * (1 + doc_id % 2),
        8 * (1 if doc_id % 3 == 0 else 0),
    )


def _write_h264p(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IDR + P GOP, md5 of the concatenated
    closed-loop RGB reconstructions).  The fixture alternates pan
    pictures (whole-frame full-pel MC shift with edge extension —
    built with the codec's own mc_shift_planes so P_16x16/P_Skip
    reproduce them exactly) and conditional-replenishment pictures
    (static + ONE re-textured macroblock, which must drop back to
    I_PCM inside the P slice).  Every macroblock mode is lossless,
    so the mode census is a pure function of the geometry: a pan
    picture codes exactly mb_w + mb_h − 1 P_16x16 macroblocks (top
    row and left column, where the P_Skip derivation yields MV 0)
    and SKIPS the interior with the real nonzero derived MV; a
    replenishment picture is all-skip except the patch."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p,
        mc_shift_planes,
    )

    w, h, nf, mvx, mvy = _h264p_dims(doc_id)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    for f in range(1, nf):
        if f % 2 == 1:  # pan picture
            frames.append(mc_shift_planes(*frames[-1], (mvx, mvy)))
        else:  # replenishment picture: one re-textured MB
            y, cb, cr = (p.copy() for p in frames[-1])
            mx = (f + doc_id) % mb_w
            my = (2 * f + doc_id) % mb_h
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                (doc_id * 11 + f * 41 + xs * 19 + ys * 23) % 256
            ).astype(np.uint8)
            cxs, cys = xs[:, :8], ys[:8, :]
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                (doc_id * 13 + f * 43 + cxs * 7 + cys * 29) % 256
            ).astype(np.uint8)
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                (doc_id * 17 + f * 47 + cxs * 31 + cys * 3) % 256
            ).astype(np.uint8)
            frames.append((y, cb, cr))
    nals, _stats = h264_encode_gop_p(
        frames, w, h, mv_candidates=[(mvx, mvy)]
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264p_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a P-GOP H.264 stream per row, plus the encoder's
    closed-loop reconstruction hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264p(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264PR_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("qp", T.LongType()),
        T.StructField("mvx", T.LongType()),
        T.StructField("mvy", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("p16r_mbs", T.LongType()),
        T.StructField("ipcm_idr_mbs", T.LongType()),
        T.StructField("sum_abs_err", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264pr_dims(doc_id: int) -> tuple[int, int, int, int, int, int]:
    """(width, height, n_frames, qp, mvx, mvy) for the inter-residual
    GOPs, all functions of doc_id % 48 — 48 distinct probe streams
    (the codec_psnr convention), so the per-stream fidelity constants
    pin once and replay for every doc.  MB-aligned dims; full-pel pan
    vectors ≡ 0 (mod 8) so luma AND chroma MC stay in the implemented
    subset; QP sweeps 24..36 so the pinned errors span real rate
    points."""
    pid = doc_id % 48
    return (
        32 + 16 * (pid % 3),
        16 + 16 * (pid % 2),
        3 + pid % 3,
        24 + 4 * ((pid // 3) % 4),
        8 * (1 + pid % 2),
        8 if pid % 3 == 0 else 0,
    )


def _h264pr_gop(doc_id: int):
    """(w, h, source (y,cb,cr) frames, NAL list, reconstructed
    frames) for one inter-residual probe GOP — shared by the synth
    table, the PSNR probe, and the tests.  Each P source frame is the
    previous SOURCE frame panned by the full-pel GOP vector plus a
    small deterministic per-block luma detail delta, so MC alone can
    never reproduce it and every macroblock carries REAL quantized
    prediction error."""
    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        h264_encode_gop_pr,
        mc_shift_planes,
    )

    w, h, nf, qp, mvx, mvy = _h264pr_dims(doc_id)
    pid = doc_id % 48
    rgb0 = _h264cac8_frame_rgb(pid, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    for f in range(1, nf):
        y, cb, cr = mc_shift_planes(*frames[-1], (mvx, mvy))
        ys, xs = np.indices(y.shape)
        y = np.clip(
            y.astype(np.int64)
            + (f * 7 + (xs // 4) * 3 + (ys // 4) * 5) % 9
            - 4,
            0,
            255,
        ).astype(np.uint8)
        frames.append((y, cb, cr))
    nals, _stats, recs = h264_encode_gop_pr(
        frames, w, h, qp=qp, mv=(mvx, mvy)
    )
    return w, h, frames, nals, recs


def _write_h264pr(doc_id: int) -> tuple[bytes, str, int]:
    """(Annex-B stream of one IDR + residual-P GOP, md5 of the
    concatenated closed-loop RGB reconstructions, Σ|rec − src| over
    the luma plane).  The codec's closed loop predicts from
    reconstructions, so the error sum is a pinned pure function of
    the probe id (see _h264pr_gop for the fixture geometry)."""
    import hashlib

    import numpy as np

    from .h264_codec import _yuv420_to_rgb, annexb

    w, h, frames, nals, recs = _h264pr_gop(doc_id)
    md5 = hashlib.md5()
    for fy, fcb, fcr in recs:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    err = sum(
        int(np.abs(r[0].astype(np.int64) - s[0].astype(np.int64)).sum())
        for r, s in zip(recs, frames)
    )
    return annexb(nals), md5.hexdigest(), err


def synth_h264pr_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach an inter-residual P-GOP H.264 stream per row, plus the
    encoder's closed-loop reconstruction hash and luma error sum."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
            T.StructField("sum_abs_err", T.LongType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            trips = [_write_h264pr(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _, _ in trips],
                    "rec_md5": [m for _, m, _ in trips],
                    "sum_abs_err": [e for _, _, e in trips],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264Q_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mvx", T.LongType()),
        T.StructField("mvy", T.LongType()),
        T.StructField("frac_x", T.LongType()),
        T.StructField("frac_y", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("ipcm_idr_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264q_dims(doc_id: int) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, mvx, mvy) for the QUARTER-PEL pan
    GOPs: MB-aligned grids, pan vectors in quarter-pel units sweeping
    every luma sub-position class (mvx 1..6 covers quarter, half,
    three-quarter, and full-pel; mvy 0..3 adds the vertical and
    center j cases), total travel ≤ (nf−1)·1.5 px ≪ one macroblock
    so edge clamping never makes a census MB constant."""
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        3 + doc_id % 3,
        1 + doc_id % 6,
        doc_id % 4,
    )


def _write_h264q(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IDR + fractional-pan P GOP, md5 of the
    concatenated RGB frames).  Every P source frame is the §8.4.2.2
    QUARTER-PEL interpolation of the previous frame at the GOP pan
    vector — built with the codec's OWN interpolator
    (mc_interp_planes), so P_16x16/P_Skip at that vector reproduce it
    exactly: the whole six-tap half-pel / averaged quarter-pel /
    bilinear-chroma pipeline is pinned bit-for-bit by a lossless
    closed loop, and the mode census stays the pure pan geometry
    (top row + left column coded, interior skipped with the real
    DERIVED fractional MV)."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p,
        mc_interp_planes,
    )

    w, h, nf, mvx, mvy = _h264q_dims(doc_id)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    for _f in range(1, nf):
        frames.append(mc_interp_planes(*frames[-1], (mvx, mvy)))
    nals, _stats = h264_encode_gop_p(
        frames, w, h, mv_candidates=[(mvx, mvy)]
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264q_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a quarter-pel-pan P-GOP H.264 stream per row, plus the
    closed-loop frame hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264q(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264q_metadata(df: DataFrame) -> DataFrame:
    """Decode the fractional-pan GOP through the interpolating
    decoder and emit the oracle evidence: ``roundtrip_exact`` (the
    six-tap b/h, two-stage j, all twelve averaged quarter positions,
    eighth-pel bilinear chroma, fractional P_Skip derivation, and MVD
    coding must ALL agree bit-for-bit with the encoder's fixture
    chain), the pan-geometry mode census, and the per-sub-position
    coverage columns frac_x/frac_y the SQL twin recomputes."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264Q_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, mvx, mvy = _h264q_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["mvx"].append(mvx)
                out["mvy"].append(mvy)
                out["frac_x"].append(mvx & 3)
                out["frac_y"].append(mvy & 3)
                out["mb_count"].append(nf * mb_w * mb_h)
                out["skip_mbs"].append(sum(s["skip"] for s in stats))
                out["p16_mbs"].append(sum(s["p16"] for s in stats))
                out["ipcm_idr_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264Q_META_SCHEMA)


H264PART_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mv0x", T.LongType()),
        T.StructField("mv0y", T.LongType()),
        T.StructField("mv1x", T.LongType()),
        T.StructField("mv1y", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("p16x8_mbs", T.LongType()),
        T.StructField("p8x16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("ipcm_idr_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264part_dims(doc_id: int):
    """(w, h, nf, kind, mv0, mv1) for the sub-16x16 partition GOPs:
    each macroblock's TWO partitions move by DIFFERENT vectors (mv1x
    ≥ 7 > mv0x ≤ 6 guarantees distinctness, so neither P_Skip nor a
    single 16x16 vector can ever reproduce a textured MB), with
    fractional components so partitions compose with the §8.4.2.2
    interpolators; kind alternates 16x8 / 8x16 by parity."""
    mv0 = (1 + doc_id % 6, doc_id % 3)
    mv1 = (7 + doc_id % 5, (doc_id + 1) % 3)
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        3 + doc_id % 2,
        "16x8" if doc_id % 2 == 0 else "8x16",
        mv0,
        mv1,
    )


def _h264part_step(frames_last: tuple, kind: str, mv0: tuple,
                   mv1: tuple) -> tuple:
    """Next source frame for the partition fixture: each macroblock's
    two partitions (top/bottom for 16x8, left/right for 8x16) are the
    codec's own MC of the previous frame at mv0/mv1 respectively —
    exactly what a P_L0_L0 macroblock with those vectors
    reconstructs."""
    import numpy as np

    from .h264_codec import (
        _PART_GEOM,
        _interp_chroma_block,
        _interp_luma_block,
    )

    y, cbp_, crp_ = frames_last
    ny, ncb, ncr = (np.empty_like(p) for p in (y, cbp_, crp_))
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    for my in range(mbh):
        for mx in range(mbw):
            for part, mv in ((0, mv0), (1, mv1)):
                (lx, ly, lw, lh), (cx, cy, cw, ch) = _PART_GEOM[kind][part]
                ny[my * 16 + ly : my * 16 + ly + lh,
                   mx * 16 + lx : mx * 16 + lx + lw] = _interp_luma_block(
                    y, mx * 16 + lx, my * 16 + ly, lw, lh, mv[0], mv[1]
                )
                for src_p, dst_p in ((cbp_, ncb), (crp_, ncr)):
                    dst_p[my * 8 + cy : my * 8 + cy + ch,
                          mx * 8 + cx : mx * 8 + cx + cw] = (
                        _interp_chroma_block(
                            src_p, mx * 8 + cx, my * 8 + cy, cw, ch,
                            mv[0], mv[1],
                        )
                    )
    return (ny.astype(np.uint8), ncb.astype(np.uint8),
            ncr.astype(np.uint8))


def _write_h264part(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IDR + P_L0_L0 partition GOP, md5 of the
    concatenated RGB frames).  Lossless closed loop — the directional
    §8.4.1.3.1 predictors, per-partition MVD coding, and partition-
    granular MC must all agree bit-for-bit with the fixture chain."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p,
    )

    w, h, nf, kind, mv0, mv1 = _h264part_dims(doc_id)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    for _f in range(1, nf):
        frames.append(_h264part_step(frames[-1], kind, mv0, mv1))
    nals, _stats = h264_encode_gop_p(
        frames, w, h, mv_candidates=[],
        mv_pair_candidates=[(kind, mv0, mv1)],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264part_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a sub-16x16-partition P-GOP stream per row, plus the
    closed-loop frame hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264part(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264part_metadata(df: DataFrame) -> DataFrame:
    """Decode the partition GOP and emit the oracle evidence: every
    P macroblock is P_L0_L0_16x8 or _8x16 (two vectors per MB, no
    skips possible — the partitions move differently), the decode
    hashes to the fixture chain exactly, and the census replays as
    pure geometry."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264PART_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, kind, mv0, mv1 = _h264part_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["kind"].append(kind)
                out["mv0x"].append(mv0[0])
                out["mv0y"].append(mv0[1])
                out["mv1x"].append(mv1[0])
                out["mv1y"].append(mv1[1])
                out["mb_count"].append(nf * mb_w * mb_h)
                out["p16x8_mbs"].append(sum(s["p16x8"] for s in stats))
                out["p8x16_mbs"].append(sum(s["p8x16"] for s in stats))
                out["skip_mbs"].append(sum(s["skip"] for s in stats))
                out["ipcm_idr_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264PART_META_SCHEMA)


H264P8_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("p8x8_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("ipcm_idr_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264p8_dims(doc_id: int):
    """(w, h, nf, quad) for the P_8x8 GOPs: each macroblock's FOUR
    8x8 sub-partitions move by four DISTINCT vectors (separated x
    ranges guarantee distinctness, fractional components exercise the
    interpolators), so no coarser mode can ever express the MB."""
    quad = (
        (1 + doc_id % 4, doc_id % 3),
        (5 + doc_id % 4, (doc_id + 1) % 3),
        (9 + doc_id % 4, (doc_id + 2) % 3),
        (13 + doc_id % 4, doc_id % 2),
    )
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        3 + doc_id % 2,
        quad,
    )


def _h264p8_step(frames_last: tuple, quad: tuple) -> tuple:
    """Next source frame for the P_8x8 fixture: each macroblock's
    four 8x8 sub-partitions are the codec's own MC of the previous
    frame at quad[0..3]."""
    import numpy as np

    from .h264_codec import (
        _PART_GEOM8,
        _interp_chroma_block,
        _interp_luma_block,
    )

    y, cbp_, crp_ = frames_last
    ny, ncb, ncr = (np.empty_like(p) for p in (y, cbp_, crp_))
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    for my in range(mbh):
        for mx in range(mbw):
            for part, mv in enumerate(quad):
                (lx, ly, lw, lh), (cx, cy, cw, ch) = _PART_GEOM8[part]
                ny[my * 16 + ly : my * 16 + ly + lh,
                   mx * 16 + lx : mx * 16 + lx + lw] = _interp_luma_block(
                    y, mx * 16 + lx, my * 16 + ly, lw, lh, mv[0], mv[1]
                )
                for src_p, dst_p in ((cbp_, ncb), (crp_, ncr)):
                    dst_p[my * 8 + cy : my * 8 + cy + ch,
                          mx * 8 + cx : mx * 8 + cx + cw] = (
                        _interp_chroma_block(
                            src_p, mx * 8 + cx, my * 8 + cy, cw, ch,
                            mv[0], mv[1],
                        )
                    )
    return (ny.astype(np.uint8), ncb.astype(np.uint8),
            ncr.astype(np.uint8))


def _write_h264p8(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IDR + P_8x8 GOP, md5 of the frames).
    Lossless closed loop over four-vector macroblocks — sub_mb_type
    parsing, the per-sub-partition §8.4.1.3 median derivation over
    4x4-granular state, and partition-granular MC pin each other."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p,
    )

    w, h, nf, quad = _h264p8_dims(doc_id)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    for _f in range(1, nf):
        frames.append(_h264p8_step(frames[-1], quad))
    nals, _stats = h264_encode_gop_p(
        frames, w, h, mv_candidates=[], mv_quad_candidates=[quad]
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264p8_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a P_8x8 sub-macroblock GOP stream per row, plus the
    closed-loop frame hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264p8(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264p8_metadata(df: DataFrame) -> DataFrame:
    """Decode the P_8x8 GOP and emit the oracle evidence: every P
    macroblock carries FOUR motion vectors (p8x8 census, zero skips),
    the decode hashes to the fixture chain exactly."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264P8_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, _quad = _h264p8_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["mb_count"].append(nf * mb_w * mb_h)
                out["p8x8_mbs"].append(sum(s["p8x8"] for s in stats))
                out["skip_mbs"].append(sum(s["skip"] for s in stats))
                out["ipcm_idr_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264P8_META_SCHEMA)


H264SUB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sub_kind", T.LongType()),
        T.StructField("mvs_per_mb", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("p8x8_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("ipcm_idr_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("p_smaller_than_idr", T.BooleanType()),
    ]
)


def _h264sub_dims(doc_id: int):
    """(w, h, nf, sub_kind, mvs) for the sub-split GOPs: Table 7-17
    split 1 (8x4), 2 (4x8), or 3 (4x4) by doc residue — 8, 8, or 16
    independent fractional vectors PER MACROBLOCK, formula-derived
    per sub-partition index."""
    sub_kind = 1 + doc_id % 3
    n = 8 if sub_kind < 3 else 16
    mvs = tuple(
        (1 + (doc_id + 3 * j) % 6, (doc_id + 2 * j) % 4)
        for j in range(n)
    )
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        3 + doc_id % 2,
        sub_kind,
        mvs,
    )


def _h264sub_step(frames_last: tuple, sub_kind: int, mvs: tuple) -> tuple:
    """Next source frame: every sub-partition of every macroblock is
    the codec's own MC of the previous frame at its own vector."""
    import numpy as np

    from .h264_codec import (
        _PART_GEOM8,
        _SUB_GEOM,
        _interp_chroma_block,
        _interp_luma_block,
    )

    y, cbp_, crp_ = frames_last
    ny, ncb, ncr = (np.empty_like(p) for p in (y, cbp_, crp_))
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    for my in range(mbh):
        for mx in range(mbw):
            i = 0
            for part in range(4):
                (plx, ply, _w, _h), _c = _PART_GEOM8[part]
                for dx4, dy4, w4, h4 in _SUB_GEOM[sub_kind]:
                    lx_ = mx * 16 + plx + dx4 * 4
                    ly_ = my * 16 + ply + dy4 * 4
                    mv = mvs[i]
                    i += 1
                    ny[ly_ : ly_ + h4 * 4, lx_ : lx_ + w4 * 4] = (
                        _interp_luma_block(
                            y, lx_, ly_, w4 * 4, h4 * 4, mv[0], mv[1]
                        )
                    )
                    cxp, cyp = lx_ // 2, ly_ // 2
                    for src_p, dst_p in ((cbp_, ncb), (crp_, ncr)):
                        dst_p[cyp : cyp + h4 * 2, cxp : cxp + w4 * 2] = (
                            _interp_chroma_block(
                                src_p, cxp, cyp, w4 * 2, h4 * 2,
                                mv[0], mv[1],
                            )
                        )
    return (ny.astype(np.uint8), ncb.astype(np.uint8),
            ncr.astype(np.uint8))


def _write_h264sub(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IDR + sub-split P GOP, md5 of the
    frames).  Lossless closed loop over up to SIXTEEN motion vectors
    per macroblock — the finest motion field H.264 P slices carry."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p,
    )

    w, h, nf, sub_kind, mvs = _h264sub_dims(doc_id)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    padded = np.pad(rgb0, ((0, -h % 16), (0, -w % 16), (0, 0)),
                    mode="edge")
    frames = [_rgb_to_yuv420(padded)]
    for _f in range(1, nf):
        frames.append(_h264sub_step(frames[-1], sub_kind, mvs))
    nals, _stats = h264_encode_gop_p(
        frames, w, h, mv_candidates=[],
        mv_sub_candidates=[(sub_kind, mvs)],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264sub_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a sub-split P-GOP stream per row, plus the closed-loop
    frame hash."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264sub(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264sub_metadata(df: DataFrame) -> DataFrame:
    """Decode the sub-split GOP and emit the oracle evidence: the
    decode hashes to the fixture chain exactly (only a per-sub-
    partition motion field can reproduce it), plus the pure-geometry
    census."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264SUB_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, sub_kind, mvs = _h264sub_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["sub_kind"].append(sub_kind)
                out["mvs_per_mb"].append(len(mvs))
                out["mb_count"].append(nf * mb_w * mb_h)
                out["p8x8_mbs"].append(sum(s["p8x8"] for s in stats))
                out["skip_mbs"].append(sum(s["skip"] for s in stats))
                out["ipcm_idr_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264SUB_META_SCHEMA)


H264B_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bl0_mbs", T.LongType()),
        T.StructField("bl1_mbs", T.LongType()),
        T.StructField("bbi_mbs", T.LongType()),
        T.StructField("b_ipcm_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _h264b_dims(doc_id: int):
    """(w, h, mvx, mvy) for the B-GOP fixture — macroblock-aligned
    dims (the h264p census lesson) and quarter-pel vectors that are
    multiples of 8 so luma AND chroma MC stay full-pel; display GOP
    length is FIXED at 5 (I B P B P: two reference pans of 2·mv keep
    total travel ≤ 8 px, far under one macroblock)."""
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        8,
        8 if doc_id % 3 == 0 else 0,
    )


def _write_h264b(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP, md5 of the DISPLAY-order RGB
    frames).  Reference pictures pan by 2·mv; each B picture between
    them takes one of three flavors cycling on (doc_id + i) % 3:

    - 0: the L0 midpoint pan (= mc_shift(prev_ref, mv)) with ONE
      re-textured macroblock → census (mbs − 1)·B_L0 + 1·I_PCM,
    - 1: content built FROM THE FUTURE (mc_shift(next_ref, −mv)) —
      exact from L1 everywhere, but the encoder's L0-first candidate
      also matches on the interior (where shift∘shift composes
      cleanly), so the census splits (mbw−1)(mbh−[mvy>0])·B_L0 +
      edge-strip·B_L1 — one picture genuinely exercising BOTH lists,
    - 2: the rounded mean of the two one-sided predictions — the
      interior again goes B_L0 (there both terms agree), the edge
      strip only matches the true bi-prediction → B_Bi.

    Every implemented B mode is lossless, so the census is pure
    geometry and the decode (with POC output reordering) hashes to
    the source display sequence bit-for-bit."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _rgb_to_yuv420,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    rgb0 = _h264cac8_frame_rgb(doc_id, 0, w, h)
    f0 = _rgb_to_yuv420(rgb0)
    mb_w, mb_h = w // 16, h // 16
    frames = [f0]
    prev = f0
    for i in range(2):
        pfr = mc_shift_planes(*prev, two)
        flavor = (doc_id + i) % 3
        if flavor == 0:
            b = [pl.copy() for pl in mc_shift_planes(*prev, mv)]
            pmx, pmy = doc_id % mb_w, doc_id % mb_h
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            b[0][pmy * 16 : pmy * 16 + 16, pmx * 16 : pmx * 16 + 16] = (
                (doc_id * 11 + i * 41 + xs * 19 + ys * 23) % 256
            ).astype(np.uint8)
            b = tuple(pl.astype(np.uint8) for pl in b)
        elif flavor == 1:
            b = mc_shift_planes(*pfr, neg)
        else:
            a0 = mc_shift_planes(*prev, mv)
            a1 = mc_shift_planes(*pfr, neg)
            b = tuple(
                ((x.astype(np.int64) + z.astype(np.int64) + 1) >> 1)
                .astype(np.uint8)
                for x, z in zip(a0, a1)
            )
        frames.extend([b, pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(
            _yuv420_to_rgb(
                fy[:h, :w],
                fcb[: (h + 1) // 2, : (w + 1) // 2],
                fcr[: (h + 1) // 2, : (w + 1) // 2],
            ).tobytes()
        )
    return annexb(nals), md5.hexdigest()


def synth_h264b_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a B-GOP H.264 stream per row, plus the display-order
    source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264b(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264b_metadata(df: DataFrame) -> DataFrame:
    """Decode the IBPBP GOP through the bi-predictive decoder and
    emit the oracle evidence: ``roundtrip_exact`` — the decoded
    frames, REORDERED from decode order to display order by POC, hash
    to the source sequence bit-for-bit (reference-only DPB, nearest-
    POC list init, per-list median MV prediction, the §8.4.2.3.2
    rounded bi-prediction mean, and the skip-run machinery all have
    to agree) — plus the exact B/P macroblock mode census, pure
    geometry formulas the SQL twin recomputes from doc_id alone."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264B_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"  # 2+IDR+4
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bl0_mbs"].append(sum(s["bl0"] for s in bst))
                out["bl1_mbs"].append(sum(s["bl1"] for s in bst))
                out["bbi_mbs"].append(sum(s["bbi"] for s in bst))
                out["b_ipcm_mbs"].append(sum(s["ipcm"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264B_META_SCHEMA)


H264WP_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("p_ipcm_mbs", T.LongType()),
        T.StructField("luma_w", T.LongType()),
        T.StructField("luma_off", T.LongType()),
        T.StructField("cb_w", T.LongType()),
        T.StructField("cb_off", T.LongType()),
        T.StructField("cr_w", T.LongType()),
        T.StructField("cr_off", T.LongType()),
        T.StructField("log2_denom", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _h264wp_dims(doc_id: int):
    """(w, h, mvx, mvy) for the weighted-prediction fade-GOP fixture:
    macroblock-aligned dims and full-pel pan vectors (multiples of 8
    quarter-pel so chroma MC stays full-pel too)."""
    return (
        32 + 16 * (doc_id % 3),
        16 + 16 * (doc_id % 2),
        8,
        8 if doc_id % 3 == 0 else 0,
    )


def _h264wp_params(doc_id: int) -> tuple:
    """The §7.3.3.2 pred_weight_table for one GOP — (luma_log2_denom,
    wY, oY, chroma_log2_denom, wCb, oCb, wCr, oCr).  Gains stay at or
    below 1 (w <= 2^denom) and offsets within ±2, so four fade steps
    over mid-range textures never clip: the census geometry cannot
    degenerate into saturated-uniform regions."""
    return (
        5,
        30 + doc_id % 3, (doc_id % 5) - 2,
        5,
        31 + doc_id % 2, (doc_id % 3) - 1,
        32 - doc_id % 2, 1 - (doc_id % 3),
    )


def _h264wp_frame0(doc_id: int, w: int, h: int):
    """Deterministic mid-range [40, 216) YUV texture with adjacent
    luma deltas of ±19 — large enough that a 2 px pan never matches
    the unshifted frame anywhere, even after four fade steps."""
    import numpy as np

    ys, xs = np.mgrid[0:h, 0:w]
    y = (40 + (xs * 19 + ys * 23 + doc_id * 7) % 176).astype(np.uint8)
    cys, cxs = np.mgrid[0 : h // 2, 0 : w // 2]
    cb = (60 + (cxs * 13 + cys * 29 + doc_id * 3) % 136).astype(np.uint8)
    cr = (60 + (cxs * 31 + cys * 11 + doc_id * 5) % 136).astype(np.uint8)
    return y, cb, cr


def _write_h264wp(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IPPPP fade GOP under explicit weighted
    prediction, md5 of the source RGB frames).  Frame t in 1..4 takes
    one of three flavors cycling on (doc_id + t) % 3, every one built
    by applying the EXACT §8.4.2.3.2 weighting formula the decoder
    will run:

    - 0: pure fade — F_t = WP(F_{t-1}) → every MB P_Skip at the
      derived zero skip vector,
    - 1: fade + pan — F_t = WP(shift(F_{t-1}, mv)) → the first
      row/column strip (mbw + mbh − 1 MBs, where the §8.4.1.1 skip
      derivation returns 0) codes P_L0_16x16 at the pan vector, the
      interior skips with real NONZERO derived motion,
    - 2: fade + one re-textured macroblock → (mbs − 1) P_Skip +
      1 I_PCM (conditional replenishment inside a weighted slice).

    Every mode is lossless so the census is pure geometry and the
    decode hashes to the source bit-for-bit."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _wp_plane,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_pwp,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264wp_dims(doc_id)
    wp = _h264wp_params(doc_id)
    ld, wy, oy, cd, wcb, ocb, wcr, ocr = wp
    mv = (mvx, mvy)
    mb_w, mb_h = w // 16, h // 16

    def fade(planes):
        return (
            _wp_plane(planes[0], wy, oy, ld),
            _wp_plane(planes[1], wcb, ocb, cd),
            _wp_plane(planes[2], wcr, ocr, cd),
        )

    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    for t in range(1, 5):
        flavor = (doc_id + t) % 3
        if flavor == 0:
            cur = fade(prev)
        elif flavor == 1:
            cur = fade(mc_shift_planes(*prev, mv))
        else:
            cur = [pl.copy() for pl in fade(prev)]
            pmx, pmy = doc_id % mb_w, doc_id % mb_h
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            cur[0][pmy * 16 : pmy * 16 + 16, pmx * 16 : pmx * 16 + 16] = (
                (doc_id * 11 + t * 41 + xs * 19 + ys * 23) % 256
            ).astype(np.uint8)
            cur = tuple(cur)
        frames.append(cur)
        prev = cur
    nals, _stats = h264_encode_gop_pwp(frames, w, h, wp, mv_candidates=[mv])
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264wp_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a weighted-prediction fade-GOP H.264 stream per row,
    plus the source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264wp(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264wp_metadata(df: DataFrame) -> DataFrame:
    """Decode the fade GOP through the weighted-prediction P path and
    emit the oracle evidence: ``roundtrip_exact`` (the parsed
    pred_weight_table, the §8.4.2.3.2 scaling of every P_Skip and
    P_L0_16x16 prediction, and the skip-run machinery reproduce the
    source bit-for-bit), the exact skip/P16/I_PCM census (pure
    geometry the SQL twin recomputes from doc_id alone), and the
    decoder-parsed weight/offset/denominator columns (pinning the
    header round-trip, asserted identical across all four P
    slices)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264WP_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264wp_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"  # 2+IDR+4
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                pst = [s for s in stats if s["is_p"]]
                wps = {
                    (
                        s["wp_log2_denom"],
                        s["wp_luma_w"], s["wp_luma_off"],
                        s["wp_cb_w"], s["wp_cb_off"],
                        s["wp_cr_w"], s["wp_cr_off"],
                    )
                    for s in pst
                }
                assert len(wps) == 1, "pred_weight_table drifted"
                ld, wy, oy, wcb, ocb, wcr, ocr = next(iter(wps))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["p_ipcm_mbs"].append(sum(s["ipcm"] for s in pst))
                out["luma_w"].append(wy)
                out["luma_off"].append(oy)
                out["cb_w"].append(wcb)
                out["cb_off"].append(ocb)
                out["cr_w"].append(wcr)
                out["cr_off"].append(ocr)
                out["log2_denom"].append(ld)
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264WP_META_SCHEMA)


H264WB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bl0_mbs", T.LongType()),
        T.StructField("bl1_mbs", T.LongType()),
        T.StructField("bbi_mbs", T.LongType()),
        T.StructField("b_ipcm_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("l0_luma_w", T.LongType()),
        T.StructField("l1_luma_w", T.LongType()),
        T.StructField("log2_denom", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _h264wb_params(doc_id: int) -> tuple:
    """Two-list §7.3.3.2 weight table for the weighted-bi fixture:
    L0 dims (gain < 1, negative offset), L1 brightens (gain > 1,
    positive offset) — pointwise distinct on the [40, 216) fixture
    range, so a one-list prediction can never accidentally match the
    other list's content and the census stays pure geometry; extrema
    stay inside [0, 255], so nothing clips into uniformity."""
    return (
        5, 5,
        (27 + doc_id % 3, -8 + doc_id % 3,
         29 + doc_id % 2, -6, 30, -5 + doc_id % 2),
        (35 - doc_id % 3, 8 - doc_id % 3,
         35 - doc_id % 2, 6, 34, 5 - doc_id % 2),
    )


def _write_h264wb(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP under EXPLICIT WEIGHTED
    BI-PREDICTION, md5 of the DISPLAY-order RGB frames).  Reference
    pictures pan by 2·mv unweighted; each B picture between them is
    built by the EXACT §8.4.2.3.2 formula the decoder runs, cycling
    flavors on (doc_id + i) % 3:

    - 0: L0-weighted midpoint pan with ONE re-textured macroblock →
      (mbs − 1)·B_L0 + 1·I_PCM,
    - 1: L1-weighted content from the future — because the two
      lists' weights are pointwise distinct, the encoder's L0-first
      candidate can never match, so the WHOLE picture goes B_L1
      (unlike the unweighted twin, where the interior matched L0),
    - 2: the eq. 8-272 weighted mean of both one-sided predictions →
      all B_Bi (neither single list matches).

    Every implemented mode is lossless, so the census is pure
    geometry and the decode (with POC output reordering) hashes to
    the source display sequence bit-for-bit."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _wp_plane,
        _wpb_bi,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    wpb = _h264wb_params(doc_id)
    ld, cd, l0w, l1w = wpb

    def _one_list(planes, ws):
        wy, oy, wcb, ocb, wcr, ocr = ws
        return (
            _wp_plane(planes[0], wy, oy, ld),
            _wp_plane(planes[1], wcb, ocb, cd),
            _wp_plane(planes[2], wcr, ocr, cd),
        )

    f0 = _h264wp_frame0(doc_id, w, h)
    mb_w, mb_h = w // 16, h // 16
    frames = [f0]
    prev = f0
    for i in range(2):
        pfr = mc_shift_planes(*prev, two)
        flavor = (doc_id + i) % 3
        if flavor == 0:
            b = [pl.copy() for pl in
                 _one_list(mc_shift_planes(*prev, mv), l0w)]
            pmx, pmy = doc_id % mb_w, doc_id % mb_h
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            b[0][pmy * 16 : pmy * 16 + 16, pmx * 16 : pmx * 16 + 16] = (
                (doc_id * 11 + i * 41 + xs * 19 + ys * 23) % 256
            ).astype(np.uint8)
            b = tuple(b)
        elif flavor == 1:
            b = _one_list(mc_shift_planes(*pfr, neg), l1w)
        else:
            b = _wpb_bi(
                mc_shift_planes(*prev, mv),
                mc_shift_planes(*pfr, neg),
                wpb,
            )
        frames.extend([b, pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
        wpb=wpb,
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264wb_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a weighted-bi-prediction B-GOP stream per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264wb(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264wb_metadata(df: DataFrame) -> DataFrame:
    """Decode the weighted-bi GOP and emit the oracle evidence:
    ``roundtrip_exact`` (the two-list pred_weight_table parse, the
    eq. 8-270/8-272 scalings on every B prediction, POC reordering,
    and the DPB machinery reproduce the display sequence
    bit-for-bit), the B-mode census — sharpened by the weighting:
    L1-flavor pictures go ENTIRELY B_L1 because the distinct L0
    weights can no longer shadow them — and the decoder-parsed
    per-list luma weights."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264WB_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                wps = {
                    (s["wpb_log2_denom"], s["wpb_l0_w"], s["wpb_l1_w"])
                    for s in bst
                }
                assert len(wps) == 1, "pred_weight_table drifted"
                ld, l0w, l1w = next(iter(wps))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bl0_mbs"].append(sum(s["bl0"] for s in bst))
                out["bl1_mbs"].append(sum(s["bl1"] for s in bst))
                out["bbi_mbs"].append(sum(s["bbi"] for s in bst))
                out["b_ipcm_mbs"].append(sum(s["ipcm"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["l0_luma_w"].append(l0w)
                out["l1_luma_w"].append(l1w)
                out["log2_denom"].append(ld)
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264WB_META_SCHEMA)


H264WI_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bl0_mbs", T.LongType()),
        T.StructField("bbi_mbs", T.LongType()),
        T.StructField("b_ipcm_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("early_w0", T.LongType()),
        T.StructField("early_w1", T.LongType()),
        T.StructField("late_w0", T.LongType()),
        T.StructField("late_w1", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _write_h264wi(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one I(BB P)×2 GOP under IMPLICIT weighted
    bi-prediction, md5 of the DISPLAY-order RGB frames).  TWO
    non-reference B pictures sit unevenly between each reference pair
    (POC 2 and 4 of a 0..6 span), so the §8.4.2.3.1 POC-distance
    ladder derives genuinely asymmetric weights — (43, 21) for the
    early B, (22, 42) for the late one — that the decoder must
    re-derive from POC alone (nothing is signalled).  Per group:

    - early B: the implicit-weighted mix of two NON-composing
      one-sided predictions (forward 1 pan unit vs backward 1 from
      the future = 2 units — pointwise distinct on the texture, so
      no single-list candidate can shadow the mix) → all B_Bi,
    - late B: a plain 2-unit pan with ONE re-textured macroblock —
      implicit mode leaves one-list predictions UNWEIGHTED, so this
      decodes (mbs − 1)·B_L0 + 1·I_PCM through the plain-copy path.

    Every mode is lossless; the census and the derived weight pairs
    replay as constants in the SQL twin."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _implicit_bi_weights,
        _wpb_bi_plane,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_bimp,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, nmv = (mvx, mvy), (-mvx, -mvy)
    two, three = (2 * mvx, 2 * mvy), (3 * mvx, 3 * mvy)
    mb_w, mb_h = w // 16, h // 16
    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    ew0, ew1 = _implicit_bi_weights(2, 0, 6)  # early-B derivation
    for j in range(2):
        pfr = mc_shift_planes(*prev, three)
        p0 = mc_shift_planes(*prev, mv)
        p1 = mc_shift_planes(*pfr, nmv)
        b1 = tuple(
            _wpb_bi_plane(a, b, ew0, ew1, 0, 0, 5)
            for a, b in zip(p0, p1)
        )
        b2 = [pl.copy() for pl in mc_shift_planes(*prev, two)]
        pmx, pmy = doc_id % mb_w, doc_id % mb_h
        xs = np.arange(16, dtype=np.int64)[None, :]
        ys = np.arange(16, dtype=np.int64)[:, None]
        b2[0][pmy * 16 : pmy * 16 + 16, pmx * 16 : pmx * 16 + 16] = (
            (doc_id * 11 + j * 41 + xs * 19 + ys * 23) % 256
        ).astype(np.uint8)
        b2 = tuple(b2)
        frames.extend([b1, b2, pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_bimp(
        frames, w, h,
        l0_candidates=[mv, two],
        l1_candidates=[nmv],
        bi_candidates=[(mv, nmv)],
        p_candidates=[three],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264wi_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach an implicit-weighted I(BBP)×2 H.264 stream per row,
    plus the display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264wi(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264wi_metadata(df: DataFrame) -> DataFrame:
    """Decode the implicit-weighted GOP and emit the oracle evidence:
    ``roundtrip_exact`` (the POC-distance weight derivation — tb/td
    clipping, tx, DistScaleFactor — must land on the encoder's exact
    integers for every bi-predicted block, with NOTHING signalled in
    the bitstream), the census, and the per-position derived weight
    pairs (early B (43, 21), late B (22, 42)) as decoder-echoed
    constants."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264WI_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 9, "unexpected NAL count"  # 2+I+2*3
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                # display order: B(poc 2|8) early, B(poc 4|10) late
                early = {(s["wbi_w0"], s["wbi_w1"])
                         for i, s in enumerate(bst) if i % 2 == 0}
                late = {(s["wbi_w0"], s["wbi_w1"])
                        for i, s in enumerate(bst) if i % 2 == 1}
                assert len(early) == 1 and len(late) == 1
                (ew0, ew1), (lw0, lw1) = next(iter(early)), next(iter(late))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bl0_mbs"].append(sum(s["bl0"] for s in bst))
                out["bbi_mbs"].append(sum(s["bbi"] for s in bst))
                out["b_ipcm_mbs"].append(sum(s["ipcm"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["early_w0"].append(ew0)
                out["early_w1"].append(ew1)
                out["late_w0"].append(lw0)
                out["late_w1"].append(lw1)
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264WI_META_SCHEMA)


H264BD_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bskip_mbs", T.LongType()),
        T.StructField("bl0_mbs", T.LongType()),
        T.StructField("bl1_mbs", T.LongType()),
        T.StructField("b_ipcm_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _write_h264bd(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP whose B pictures are almost
    entirely B_Skip, md5 of the DISPLAY-order RGB frames).  Each B
    picture SEEDS one corner macroblock with a coded one-list mode,
    and every later macroblock rides the §8.4.1.2.2 SPATIAL DIRECT
    derivation: refIdx MinPositive over neighbours picks up the
    seed's list, the per-list 16x16 median propagates its vector,
    and the per-8x8 colZeroFlag consults the COLOCATED P picture's
    stored motion field (a pan — never near-zero, so no zeroing
    fires; the degenerate first macroblock exercises
    directZeroPrediction and never matches pan content).  Flavors
    cycle on (doc_id + i) % 2:

    - 0: L0 midpoint pan (+ one re-textured macroblock on two-row
      pictures → I_PCM island inside the skip field) → 1·B_L0 seed,
      rest B_Skip,
    - 1: content built from the FUTURE → 1·B_L1 seed, rest B_Skip
      deriving a one-list L1 direct prediction.

    Every mode is lossless; the census is pure geometry."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    mb_w, mb_h = w // 16, h // 16
    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    for i in range(2):
        pfr = mc_shift_planes(*prev, two)
        if (doc_id + i) % 2 == 0:
            b = [pl.copy() for pl in mc_shift_planes(*prev, mv)]
            if mb_h == 2:
                pmx = doc_id % mb_w
                xs = np.arange(16, dtype=np.int64)[None, :]
                ys = np.arange(16, dtype=np.int64)[:, None]
                b[0][16:32, pmx * 16 : pmx * 16 + 16] = (
                    (doc_id * 11 + i * 41 + xs * 19 + ys * 23) % 256
                ).astype(np.uint8)
            b = tuple(b)
        else:
            b = mc_shift_planes(*pfr, neg)
        frames.extend([b, pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
        direct=True,
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264bd_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a B_Skip/spatial-direct H.264 GOP per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264bd(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264bd_metadata(df: DataFrame) -> DataFrame:
    """Decode the B_Skip GOP and emit the oracle evidence:
    ``roundtrip_exact`` (the spatial-direct derivation — MinPositive
    refIdx selection, per-list medians, per-8x8 colZeroFlag against
    the DPB-stored colocated motion field, skip-run machinery, and
    POC reordering — reproduces the display sequence bit-for-bit)
    and the seed/skip census as pure geometry."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264BD_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bskip_mbs"].append(sum(s["bskip"] for s in bst))
                out["bl0_mbs"].append(sum(s["bl0"] for s in bst))
                out["bl1_mbs"].append(sum(s["bl1"] for s in bst))
                out["b_ipcm_mbs"].append(sum(s["ipcm"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264BD_META_SCHEMA)


H264TD_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bskip_mbs", T.LongType()),
        T.StructField("b_coded_mbs", T.LongType()),
        T.StructField("b_ipcm_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _write_h264td(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP whose B pictures are ENTIRELY
    B_Skip under TEMPORAL direct, md5 of the DISPLAY-order frames).
    With direct_spatial_mv_pred_flag 0, every macroblock's motion
    comes from the COLOCATED RefPicList1[0] block scaled by POC
    distance — no neighbour seeding at all, unlike the spatial twin:
    the colocated P pans at mvCol = 2·mv, the mid-GOP POC ratio makes
    DistScaleFactor exactly 128, so mvL0 = mvCol/2 = mv and mvL1 =
    mvL0 − mvCol = −mv — the true midpoint bi-prediction — and the B
    content is built as exactly that rounded mean.  Flavor
    (doc_id + i) % 2 == 1 re-textures one macroblock (I_PCM inside
    the all-skip field).  Every mode is lossless; the census is pure
    geometry."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    mb_w, mb_h = w // 16, h // 16
    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    for i in range(2):
        pfr = mc_shift_planes(*prev, two)
        p0 = mc_shift_planes(*prev, mv)
        p1 = mc_shift_planes(*pfr, neg)
        b = tuple(
            ((a.astype(np.int64) + c.astype(np.int64) + 1) >> 1)
            .astype(np.uint8)
            for a, c in zip(p0, p1)
        )
        if (doc_id + i) % 2 == 1:
            b = [pl.copy() for pl in b]
            pmx, pmy = doc_id % mb_w, doc_id % mb_h
            xs = np.arange(16, dtype=np.int64)[None, :]
            ys = np.arange(16, dtype=np.int64)[:, None]
            b[0][pmy * 16 : pmy * 16 + 16, pmx * 16 : pmx * 16 + 16] = (
                (doc_id * 11 + i * 41 + xs * 19 + ys * 23) % 256
            ).astype(np.uint8)
            b = tuple(b)
        frames.extend([b, pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
        direct=True,
        direct_mode="temporal",
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264td_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a temporal-direct B-GOP stream per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264td(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264td_metadata(df: DataFrame) -> DataFrame:
    """Decode the temporal-direct GOP and emit the oracle evidence:
    ``roundtrip_exact`` (the §8.4.1.2.3 scaling — tb/td clips, tx,
    DistScaleFactor, mvL0 = (DSF·mvCol + 128) >> 8, mvL1 = mvL0 −
    mvCol — applied per 8x8 against the DPB-stored colocated motion
    reproduces the display sequence bit-for-bit) and the all-skip
    census: ZERO coded B macroblocks, the defining signature of
    temporal direct (the spatial twin needs one coded seed per
    picture)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264TD_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bskip_mbs"].append(sum(s["bskip"] for s in bst))
                out["b_coded_mbs"].append(
                    sum(s["bl0"] + s["bl1"] + s["bbi"] + s["bdir"]
                        for s in bst)
                )
                out["b_ipcm_mbs"].append(sum(s["ipcm"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264TD_META_SCHEMA)


H264MS_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_slices", T.LongType()),
        T.StructField("nal_count", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("skip_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("idr_ipcm_mbs", T.LongType()),
        T.StructField("luma_w", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _h264ms_dims(doc_id: int):
    """(w, h, n_slices, mvx, mvy) for the multi-slice fixture: 2..4
    macroblock rows with the slice count varying INDEPENDENTLY below
    the row count (so pictures with multi-row slices — where skip
    propagation crosses rows within a slice — are covered alongside
    one-row-per-slice pictures), full-pel pan vectors."""
    h_mb = 2 + doc_id % 3  # 2..4 macroblock rows
    n_slices = 2 + (doc_id // 3) % (h_mb - 1) if h_mb > 2 else 2
    return (
        32 + 16 * (doc_id % 2),
        16 * h_mb,
        n_slices,
        8,
        8 if doc_id % 3 == 0 else 0,
    )


def _write_h264ms(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IPPPP pan+fade GOP where EVERY picture
    is split into n_slices row-aligned slices, md5 of the source RGB
    frames).  Composes the two round-11 rungs: each slice carries its
    own header AND §7.3.3.2 pred_weight_table, and §6.4.9 cross-slice
    neighbour unavailability re-anchors the motion field at every
    slice's first row — so a pan picture codes S·mbw + (mbh − S)
    P_L0_16x16 macroblocks (each slice's first row, where the
    §8.4.1.1 skip derivation returns 0, plus each remaining row's
    first column) and skips the rest with real derived motion, all
    under the §8.4.2.3.2 weighting.  Every mode is lossless, so the
    census is pure geometry and the decode hashes to the source
    bit-for-bit."""
    import hashlib

    from .h264_codec import (
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_p_ms,
        mc_shift_planes,
        _wp_plane,
    )

    w, h, n_slices, mvx, mvy = _h264ms_dims(doc_id)
    wp = _h264wp_params(doc_id)
    ld, wy, oy, cd, wcb, ocb, wcr, ocr = wp
    mv = (mvx, mvy)

    def fade(planes):
        return (
            _wp_plane(planes[0], wy, oy, ld),
            _wp_plane(planes[1], wcb, ocb, cd),
            _wp_plane(planes[2], wcr, ocr, cd),
        )

    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    for _t in range(1, 5):
        cur = fade(mc_shift_planes(*prev, mv))
        frames.append(cur)
        prev = cur
    nals, _stats = h264_encode_gop_p_ms(
        frames, w, h, n_slices, mv_candidates=[mv], wp=wp
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264ms_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a multi-slice weighted pan-GOP H.264 stream per row,
    plus the source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264ms(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264ms_metadata(df: DataFrame) -> DataFrame:
    """Decode the multi-slice GOP and emit the oracle evidence:
    ``roundtrip_exact`` (slice continuation at first_mb_in_slice,
    §7.2 more_rbsp_data slice-end detection, per-slice skip runs and
    pred_weight_tables, and §6.4.9 cross-slice unavailability all
    reproduce the source bit-for-bit), the slice count parsed back
    from the stream, and the skip/P16 census whose slice-boundary
    geometry the SQL twin recomputes from doc_id alone."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264MS_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, n_sl, _mvx, _mvy = _h264ms_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + 5 * n_sl, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                pst = [s for s in stats if s["is_p"]]
                assert {s["n_slices"] for s in stats} == {n_sl}
                assert {s["wp_luma_w"] for s in pst} == {
                    _h264wp_params(int(doc_id))[1]
                }
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["n_slices"].append(n_sl)
                out["nal_count"].append(len(nals))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["skip_mbs"].append(sum(s["skip"] for s in pst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["idr_ipcm_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["luma_w"].append(pst[0]["wp_luma_w"])
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264MS_META_SCHEMA)


H264MSB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_slices", T.LongType()),
        T.StructField("nal_count", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("bl0_mbs", T.LongType()),
        T.StructField("bskip_mbs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("pskip_mbs", T.LongType()),
        T.StructField("idr_ipcm_mbs", T.LongType()),
        T.StructField("wpb_luma_w_sum", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _h264msb_wpb(doc_id: int, k: int) -> tuple:
    """Slice ``k``'s §7.3.3.2 two-list pred_weight_table for the
    multi-slice-B fixture: the L0 luma weight VARIES PER SLICE
    (30 + (doc_id + k) % 3 against denominator 2^5 — a ≤1 gain, so
    mid-range textures never clip), everything else identity.  The
    spec scopes the table to the slice, and per-slice weights are
    what prove each slice's header is parsed and applied
    independently."""
    ld, cd = 5, 5
    wy = 30 + (doc_id + k) % 3
    return (
        ld, cd,
        (wy, 0, 1 << cd, 0, 1 << cd, 0),
        (1 << ld, 0, 1 << cd, 0, 1 << cd, 0),
    )


def _write_h264msb(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP where EVERY picture — IDR, P,
    and B — is split into n_slices row-aligned slices, md5 of the
    DISPLAY-order RGB frames).  Round 12's composition of the two
    landed families (reference parity: none — extension surface):

    - each B slice carries its OWN §7.3.3.2 two-list
      pred_weight_table (_h264msb_wpb: per-slice L0 luma weights),
      and the B content is built per slice-row-band with that
      slice's weighting, so decode is only exact if every slice's
      table is parsed and applied to exactly its macroblocks;
    - §8.4.1.2.2 SPATIAL DIRECT re-anchors at every slice boundary:
      the slice's first macroblock sees no in-slice neighbours
      (§6.4.9), derives directZeroPrediction, never matches pan
      content, and opens the slice with a coded B_L0 seed — after
      which MinPositive + per-list medians propagate the pan vector
      and the REST of the slice rides B_Skip.  The census is
      therefore pure slice-boundary geometry: 2·S B_L0 seeds,
      2·(mbs − S) B_Skip, and the P pictures replay the multi-slice
      pan census 2·(S·mbw + mbh − S) P16.

    Every mode stays lossless, so the decode hashes to the source
    display sequence bit-for-bit."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _wp_plane,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b_ms,
        mc_shift_planes,
    )

    w, h, n_slices, mvx, mvy = _h264ms_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    mbh = h // 16
    rows = [round(i * mbh / n_slices) for i in range(n_slices + 1)]
    wpbs = [_h264msb_wpb(doc_id, k) for k in range(n_slices)]
    f0 = _h264wp_frame0(doc_id, w, h)
    frames = [f0]
    prev = f0
    for _i in range(2):
        pfr = mc_shift_planes(*prev, two)
        # B content: the L0 midpoint pan, luma weighted PER SLICE
        # BAND with that slice's table (chroma weights are identity)
        base = mc_shift_planes(*prev, mv)
        by = base[0].copy()
        for k in range(n_slices):
            r0, r1 = rows[k] * 16, rows[k + 1] * 16
            ld, _cd, l0, _l1 = wpbs[k]
            by[r0:r1, :] = _wp_plane(
                base[0][r0:r1, :], l0[0], l0[1], ld
            )
        frames.extend([
            (by.astype(np.uint8), base[1], base[2]),
            pfr,
        ])
        prev = pfr
    nals, _stats = h264_encode_gop_b_ms(
        frames, w, h, n_slices,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
        wpb_slices=wpbs,
        direct=True,
        direct_mode="spatial",
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def synth_h264msb_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a multi-slice-B H.264 stream per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264msb(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264B8_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("nal_count", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("b8x8_mbs", T.LongType()),
        T.StructField("b8_l0_subs", T.LongType()),
        T.StructField("b8_l1_subs", T.LongType()),
        T.StructField("b8_bi_subs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("pskip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _write_h264b8(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of one IBPBP GOP whose B pictures are ALL
    B_8x8 macroblocks, md5 of the DISPLAY-order RGB frames).  Each B
    macroblock is a QUADRANT MOSAIC: its four Table 7-18
    sub-macroblocks take a rotation (doc_id % 4) of the mode pattern
    (B_L0, B_L1, B_Bi, B_L0), with the pattern's trailing L0 slot
    carrying a DIFFERENT vector than the leading one — so one
    macroblock holds up to four independent per-list median
    derivations, the §7.3.5.2 two-loop mvd order (all mvd_l0 in
    mbPartIdx order, then all mvd_l1) is load-bearing, and a one-list
    sub-block's refIdx −1 mark on the other list shapes its
    neighbours' medians.  Every mode is lossless: the decode hashes
    to the source display sequence bit-for-bit and the census is
    pure geometry (every B macroblock B_8x8; per-mode sub-block
    counts fixed by the pattern: 2/1/1 per macroblock)."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _PART_GEOM8,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    mv2 = (2 * mvx, 0)  # the second L0 vector (full-pel chroma too)
    mbw, mbh = w // 16, h // 16
    rot = doc_id % 4
    base = (1, 2, 3, 1)
    modes = tuple(base[(p + rot) % 4] for p in range(4))
    seen_l0 = False
    mvs = []
    for m in modes:
        if m == 1:
            mvs.append(mv if not seen_l0 else mv2)
            seen_l0 = True
        elif m == 2:
            mvs.append(neg)
        else:
            mvs.append((mv, neg))
    mvs = tuple(mvs)
    f0 = _h264wp_frame0(doc_id, w, h)

    def mosaic(prev, pfr):
        A = mc_shift_planes(*prev, mv)
        B = mc_shift_planes(*pfr, neg)
        C = tuple(
            ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1)
            .astype(np.uint8)
            for a, b in zip(A, B)
        )
        D = mc_shift_planes(*prev, mv2)
        by_mode = []
        seen = False
        for m in modes:
            if m == 1:
                by_mode.append(A if not seen else D)
                seen = True
            else:
                by_mode.append(B if m == 2 else C)
        out = [p.copy() for p in A]
        for my in range(mbh):
            for mx in range(mbw):
                for part in range(4):
                    (lx, ly, lw, lh), (cx, cy, cw, ch) = (
                        _PART_GEOM8[part]
                    )
                    s = by_mode[part]
                    out[0][my * 16 + ly : my * 16 + ly + lh,
                           mx * 16 + lx : mx * 16 + lx + lw] = (
                        s[0][my * 16 + ly : my * 16 + ly + lh,
                             mx * 16 + lx : mx * 16 + lx + lw]
                    )
                    for pi in (1, 2):
                        out[pi][my * 8 + cy : my * 8 + cy + ch,
                                mx * 8 + cx : mx * 8 + cx + cw] = (
                            s[pi][my * 8 + cy : my * 8 + cy + ch,
                                  mx * 8 + cx : mx * 8 + cx + cw]
                        )
        return tuple(p.astype(np.uint8) for p in out)

    frames, prev = [f0], f0
    for _i in range(2):
        pfr = mc_shift_planes(*prev, two)
        frames.extend([mosaic(prev, pfr), pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[mv],
        l1_candidates=[neg],
        bi_candidates=[(mv, neg)],
        p_candidates=[two],
        sub_candidates=[(modes, mvs)],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def _write_h264b8d(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of an IBPBP GOP whose B macroblocks mix
    B_Direct_8x8 WITH coded sub-macroblocks, md5 of the DISPLAY-order
    RGB frames).  The quadrant-mosaic pattern is a doc-rotation of
    (B_Direct_8x8, B_L0, B_L1, B_Bi) under TEMPORAL direct
    (direct_spatial_mv_pred_flag 0): the direct quadrant derives its
    motion from the COLOCATED P picture's stored field scaled by POC
    distance — the midpoint ratio lands DistScaleFactor on exactly
    128, so the derived pair is (mv, −mv) and the quadrant content is
    the true bi-prediction mean, with NO mvd written for it in either
    §7.3.5.2 loop.  One macroblock therefore holds a parse-free
    derived quadrant NEXT TO three parsed ones — the mixed case
    neither the whole-MB direct gates nor the all-coded B_8x8 gate
    exercises.  Lossless; census pure geometry (1/1/1/1
    dir/L0/L1/Bi sub-blocks per macroblock, rotation-invariant)."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _PART_GEOM8,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    mv, neg, two = (mvx, mvy), (-mvx, -mvy), (2 * mvx, 2 * mvy)
    mbw, mbh = w // 16, h // 16
    rot = doc_id % 4
    base = (0, 1, 2, 3)
    modes = tuple(base[(p + rot) % 4] for p in range(4))
    mvs = tuple(
        {0: None, 1: mv, 2: neg, 3: (mv, neg)}[m] for m in modes
    )
    f0 = _h264wp_frame0(doc_id, w, h)

    def mosaic(prev, pfr):
        A = mc_shift_planes(*prev, mv)
        B = mc_shift_planes(*pfr, neg)
        C = tuple(
            ((a.astype(np.int64) + b.astype(np.int64) + 1) >> 1)
            .astype(np.uint8)
            for a, b in zip(A, B)
        )
        # temporal direct at DSF 128 derives (mv, -mv) → content C
        by_mode = [{0: C, 1: A, 2: B, 3: C}[m] for m in modes]
        out = [p.copy() for p in A]
        for my in range(mbh):
            for mx in range(mbw):
                for part in range(4):
                    (lx, ly, lw, lh), (cx, cy, cw, ch) = (
                        _PART_GEOM8[part]
                    )
                    s = by_mode[part]
                    out[0][my * 16 + ly : my * 16 + ly + lh,
                           mx * 16 + lx : mx * 16 + lx + lw] = (
                        s[0][my * 16 + ly : my * 16 + ly + lh,
                             mx * 16 + lx : mx * 16 + lx + lw]
                    )
                    for pi in (1, 2):
                        out[pi][my * 8 + cy : my * 8 + cy + ch,
                                mx * 8 + cx : mx * 8 + cx + cw] = (
                            s[pi][my * 8 + cy : my * 8 + cy + ch,
                                  mx * 8 + cx : mx * 8 + cx + cw]
                        )
        return tuple(p.astype(np.uint8) for p in out)

    frames, prev = [f0], f0
    for _i in range(2):
        pfr = mc_shift_planes(*prev, two)
        frames.extend([mosaic(prev, pfr), pfr])
        prev = pfr
    # 16x16 candidate lists are EMPTY on purpose: on the pan's
    # interior shift∘shift composes, so A == B == C and a 16x16 mode
    # would absorb whole macroblocks — the gate is about the mixed
    # sub-macroblock syntax, so every B macroblock must take the
    # B_8x8 path (the census assert would catch a leak loudly)
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[],
        l1_candidates=[],
        bi_candidates=[],
        p_candidates=[two],
        direct_mode="temporal",
        sub_candidates=[(modes, mvs)],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


def _write_h264b8s(doc_id: int) -> tuple[bytes, str]:
    """(Annex-B stream of an IBPBP GOP whose B macroblocks carry the
    SUB-8x8 Table 7-18 splits, md5 of the DISPLAY-order RGB frames).
    Quadrants take a doc-rotation of (B_L0_8x4, B_L1_4x8, B_Bi_4x4,
    B_L0_4x4) — up to TWELVE independent motion partitions per
    macroblock (2+2+4+4), the finest motion field a B slice carries,
    each sub-partition with its own vector from a 4-vector pool so
    the per-sub-partition §8.4.1.3 medians (earlier sub-partitions
    feeding later ones, one-list sub-MBs marking the other list
    refIdx −1) are all load-bearing.  16x16 candidate lists stay
    empty (interior shift-composition would absorb macroblocks).
    Lossless; census pure geometry (4 split sub-MBs and 12 motion
    partitions per macroblock, 2/1/1 L0/L1/Bi — rotation-invariant)."""
    import hashlib

    import numpy as np

    from .h264_codec import (
        _B_SUB_SPLIT,
        _b_subpart_geoms,
        _yuv420_to_rgb,
        annexb,
        h264_encode_gop_b,
        mc_shift_planes,
    )

    w, h, mvx, mvy = _h264b_dims(doc_id)
    two = (2 * mvx, 2 * mvy)
    pool = [(mvx, mvy), (mvx, 0), (0, mvx), (2 * mvx, mvy)]
    mbw, mbh = w // 16, h // 16
    rot = doc_id % 4
    base = (4, 7, 12, 10)
    modes = tuple(base[(p + rot) % 4] for p in range(4))

    def neg_v(v):
        return (-v[0], -v[1])

    def mvs_for(mode, part):
        kind, usage = _B_SUB_SPLIT[mode]
        n = len(_b_subpart_geoms(part, kind))
        vs = [pool[(part + i) % 4] for i in range(n)]
        if usage == 0:
            return tuple(vs)
        if usage == 1:
            return tuple(neg_v(v) for v in vs)
        return tuple((v, neg_v(v)) for v in vs)

    mvs = tuple(mvs_for(modes[p], p) for p in range(4))
    f0 = _h264wp_frame0(doc_id, w, h)

    def bimean(a, b):
        return tuple(
            ((p.astype(np.int64) + q.astype(np.int64) + 1) >> 1)
            .astype(np.uint8)
            for p, q in zip(a, b)
        )

    def mosaic(prev, pfr):
        sh0 = {v: mc_shift_planes(*prev, v) for v in pool}
        sh1 = {v: mc_shift_planes(*pfr, neg_v(v)) for v in pool}
        out = [p.copy() for p in sh0[pool[0]]]
        for my in range(mbh):
            for mx in range(mbw):
                for part in range(4):
                    kind, usage = _B_SUB_SPLIT[modes[part]]
                    geoms = _b_subpart_geoms(part, kind)
                    for i, geom in enumerate(geoms):
                        (lx, ly, lw, lh), (cx, cy, cw, ch) = geom
                        if usage == 0:
                            s = sh0[mvs[part][i]]
                        elif usage == 1:
                            s = sh1[neg_v(mvs[part][i])]
                        else:
                            v = mvs[part][i][0]
                            s = bimean(sh0[v], sh1[v])
                        out[0][my * 16 + ly : my * 16 + ly + lh,
                               mx * 16 + lx : mx * 16 + lx + lw] = (
                            s[0][my * 16 + ly : my * 16 + ly + lh,
                                 mx * 16 + lx : mx * 16 + lx + lw]
                        )
                        for pi in (1, 2):
                            out[pi][
                                my * 8 + cy : my * 8 + cy + ch,
                                mx * 8 + cx : mx * 8 + cx + cw,
                            ] = s[pi][
                                my * 8 + cy : my * 8 + cy + ch,
                                mx * 8 + cx : mx * 8 + cx + cw,
                            ]
        return tuple(p.astype(np.uint8) for p in out)

    frames, prev = [f0], f0
    for _i in range(2):
        pfr = mc_shift_planes(*prev, two)
        frames.extend([mosaic(prev, pfr), pfr])
        prev = pfr
    nals, _stats = h264_encode_gop_b(
        frames, w, h,
        l0_candidates=[],
        l1_candidates=[],
        bi_candidates=[],
        p_candidates=[two],
        sub_candidates=[(modes, mvs)],
    )
    md5 = hashlib.md5()
    for fy, fcb, fcr in frames:
        md5.update(_yuv420_to_rgb(fy, fcb, fcr).tobytes())
    return annexb(nals), md5.hexdigest()


H264B8S_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("nal_count", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("b8x8_mbs", T.LongType()),
        T.StructField("b8_split_subs", T.LongType()),
        T.StructField("b8_motion_parts", T.LongType()),
        T.StructField("b8_l0_subs", T.LongType()),
        T.StructField("b8_l1_subs", T.LongType()),
        T.StructField("b8_bi_subs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("pskip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def synth_h264b8s_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a sub-8x8-split B GOP per row, plus the display-order
    source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264b8s(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264b8s_metadata(df: DataFrame) -> DataFrame:
    """Decode the sub-8x8-split B GOP and emit the oracle evidence:
    ``roundtrip_exact`` (twelve per-macroblock motion partitions, the
    two-loop §7.3.5.2 order with per-sub-partition medians — all
    bit-for-bit) and the split/partition census as pure geometry."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264B8S_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                assert sum(s["bl0"] + s["bl1"] + s["bbi"] + s["ipcm"]
                           + s["bskip"] + s["b8_dir"]
                           for s in bst) == 0
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["nal_count"].append(len(nals))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["b8x8_mbs"].append(sum(s["b8x8"] for s in bst))
                out["b8_split_subs"].append(
                    sum(s["b8_split"] for s in bst)
                )
                out["b8_motion_parts"].append(
                    sum(s["b8_parts"] for s in bst)
                )
                out["b8_l0_subs"].append(sum(s["b8_l0"] for s in bst))
                out["b8_l1_subs"].append(sum(s["b8_l1"] for s in bst))
                out["b8_bi_subs"].append(sum(s["b8_bi"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["pskip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264B8S_META_SCHEMA)


def synth_h264b8d_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a mixed B_Direct_8x8 GOP per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264b8d(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


H264B8D_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("nal_count", T.LongType()),
        T.StructField("mb_count", T.LongType()),
        T.StructField("b8x8_mbs", T.LongType()),
        T.StructField("b8_dir_subs", T.LongType()),
        T.StructField("b8_l0_subs", T.LongType()),
        T.StructField("b8_l1_subs", T.LongType()),
        T.StructField("b8_bi_subs", T.LongType()),
        T.StructField("p16_mbs", T.LongType()),
        T.StructField("pskip_mbs", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def h264b8d_metadata(df: DataFrame) -> DataFrame:
    """Decode the mixed B_Direct_8x8 GOP and emit the oracle
    evidence: ``roundtrip_exact`` (a parse-free temporal-direct
    quadrant derived from the DPB colocated field next to three
    parsed quadrants, the §7.3.5.2 loops skipping the direct one —
    all bit-for-bit) and the per-mode census as pure geometry."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264B8D_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                assert sum(s["bl0"] + s["bl1"] + s["bbi"] + s["ipcm"]
                           + s["bskip"] for s in bst) == 0
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["nal_count"].append(len(nals))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["b8x8_mbs"].append(sum(s["b8x8"] for s in bst))
                out["b8_dir_subs"].append(
                    sum(s["b8_dir"] for s in bst)
                )
                out["b8_l0_subs"].append(sum(s["b8_l0"] for s in bst))
                out["b8_l1_subs"].append(sum(s["b8_l1"] for s in bst))
                out["b8_bi_subs"].append(sum(s["b8_bi"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["pskip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264B8D_META_SCHEMA)


def synth_h264b8_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a B_8x8 sub-partition H.264 GOP per row, plus the
    display-order source hash the decode must reproduce."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("rec_md5", T.StringType()),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            pairs = [_write_h264b8(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [p for p, _ in pairs],
                    "rec_md5": [m for _, m in pairs],
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(par)
        .mapInPandas(_batches, schema=schema)
    )


def h264b8_metadata(df: DataFrame) -> DataFrame:
    """Decode the B_8x8 GOP and emit the oracle evidence:
    ``roundtrip_exact`` (four independent sub-macroblock motion
    derivations per macroblock, the two-loop §7.3.5.2 mvd order,
    per-list medians with refIdx −1 marks, weighted/implicit hooks,
    POC reordering — all bit-for-bit) and the mode census as pure
    geometry (every B macroblock B_8x8; 2/1/1 L0/L1/Bi sub-blocks
    per macroblock from the rotated pattern)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264B8_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, _mvx, _mvy = _h264b_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 7, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                assert sum(s["bl0"] + s["bl1"] + s["bbi"] + s["ipcm"]
                           + s["bskip"] for s in bst) == 0
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["nal_count"].append(len(nals))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["b8x8_mbs"].append(sum(s["b8x8"] for s in bst))
                out["b8_l0_subs"].append(sum(s["b8_l0"] for s in bst))
                out["b8_l1_subs"].append(sum(s["b8_l1"] for s in bst))
                out["b8_bi_subs"].append(sum(s["b8_bi"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["pskip_mbs"].append(sum(s["skip"] for s in pst))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264B8_META_SCHEMA)


def h264msb_metadata(df: DataFrame) -> DataFrame:
    """Decode the multi-slice-B GOP and emit the oracle evidence:
    ``roundtrip_exact`` (per-slice B headers with their own
    pred_weight_tables, §6.4.9 spatial-direct re-anchoring at slice
    boundaries, per-list medians across continuation slices, POC
    reordering — all bit-for-bit), the slice count parsed back from
    the stream, the seed/skip census whose slice-boundary geometry
    the SQL twin recomputes from doc_id alone, and the SUM of the
    per-slice L0 luma weights (pinning every slice's parsed table,
    not just the last one)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264MSB_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, n_sl, _mvx, _mvy = _h264ms_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + 5 * n_sl, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = w // 16, h // 16
                bst = [s for s in stats if s["is_b"]]
                pst = [s for s in stats if s["is_p"]]
                assert {s["n_slices"] for s in stats} == {n_sl}
                assert sum(s["bl1"] + s["bbi"] + s["bdir"] + s["ipcm"]
                           for s in bst) == 0
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["n_slices"].append(n_sl)
                out["nal_count"].append(len(nals))
                out["mb_count"].append(len(frames) * mb_w * mb_h)
                out["bl0_mbs"].append(sum(s["bl0"] for s in bst))
                out["bskip_mbs"].append(sum(s["bskip"] for s in bst))
                out["p16_mbs"].append(sum(s["p16"] for s in pst))
                out["pskip_mbs"].append(sum(s["skip"] for s in pst))
                out["idr_ipcm_mbs"].append(
                    sum(s["ipcm"] for s in stats
                        if not s["is_p"] and not s["is_b"])
                )
                out["wpb_luma_w_sum"].append(
                    sum(s["wpb_luma_w_sum"] for s in bst)
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264MSB_META_SCHEMA)


def h264pr_metadata(df: DataFrame) -> DataFrame:
    """Decode the inter-residual GOP through the full pipeline —
    Table 9-4 Inter cbp, mb_qp_delta, LumaLevel4x4 CAVLC (all 16 scan
    positions), chroma DC+AC residuals, all added to edge-extended MC
    prediction — and emit the oracle evidence: ``roundtrip_exact``
    (decode hashes to the encoder's closed loop bit-for-bit), the
    mode census (every P macroblock is P_L0_16x16 WITH residuals —
    pure geometry), the pinned luma error sum (real lossy coding:
    nonzero, QP-monotone-ish, frozen as 48 constants in the SQL
    twin), and ``p_smaller_than_idr`` (residual P slices undercut
    the I_PCM IDR — compression, not just prediction)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264PR_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5, err in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
                pdf["sum_abs_err"].astype("int64"),
            ):
                w, h, nf, qp, mvx, mvy = _h264pr_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["qp"].append(qp)
                out["mvx"].append(mvx)
                out["mvy"].append(mvy)
                out["mb_count"].append(nf * mb_w * mb_h)
                out["p16r_mbs"].append(sum(s["p16r"] for s in stats))
                out["ipcm_idr_mbs"].append(
                    sum(s["ipcm"] for s in stats if not s["is_p"])
                )
                out["sum_abs_err"].append(int(err))
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264PR_META_SCHEMA)


def h264p_metadata(df: DataFrame) -> DataFrame:
    """Decode the P-GOP stream through the motion-compensating
    decoder and emit the oracle evidence: ``roundtrip_exact`` (the
    decoded RGB sequence hashes to the encoder's closed loop — the
    P_Skip MV derivation, median predictor, MVD decode, skip-run
    state machine, and edge-extended MC all have to agree
    bit-for-bit), the EXACT macroblock mode census (skip / P_16x16 /
    replenishment-I_PCM counts, pure geometry formulas the SQL twin
    recomputes), and ``p_smaller_than_idr`` (all P slices together
    undercut the one I_PCM IDR — the point of inter prediction)."""
    from .h264_codec import h264_decode_gop, split_annexb

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in H264P_META_SCHEMA.fieldNames()}
            for doc_id, payload, rec_md5 in zip(
                pdf["doc_id"].astype("int64"),
                pdf["payload"],
                pdf["rec_md5"],
            ):
                w, h, nf, mvx, mvy = _h264p_dims(int(doc_id))
                nals = split_annexb(bytes(payload))
                assert len(nals) == 2 + nf, "unexpected NAL count"
                frames, stats = h264_decode_gop(nals)
                md5 = hashlib.md5()
                for fr in frames:
                    md5.update(fr.tobytes())
                mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["mvx"].append(mvx)
                out["mvy"].append(mvy)
                out["mb_count"].append(nf * mb_w * mb_h)
                out["skip_mbs"].append(sum(s["skip"] for s in stats))
                out["p16_mbs"].append(sum(s["p16"] for s in stats))
                out["ipcm_p_mbs"].append(
                    sum(s["ipcm"] for s in stats if s["is_p"])
                )
                out["roundtrip_exact"].append(
                    md5.hexdigest() == str(rec_md5)
                )
                out["p_smaller_than_idr"].append(
                    sum(len(n) for n in nals[3:]) < len(nals[2])
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=H264P_META_SCHEMA)
