"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

Two REAL image codecs run end-to-end here — uncompressed 24-bit BMP and
binary PPM (P6), decoded/encoded with the stdlib only — so
``extract_features`` computes actual pixel statistics and ``resize_media``
performs an actual nearest-neighbor resample for those formats.  Formats
needing external codec libs (png/jpeg/wav/mp4), absent from this container,
keep the clearly-marked stub path: on a production image PIL/ffmpeg drop
into the same ``decode_media`` seam.  Everything Spark-side — schema, batch
iteration shape, partitioning, mapInPandas plumbing — is identical for both
paths.

Scale notes: binary payloads ride the same DataFrame as metadata, so
partition sizing must respect ``spark.sql.files.maxPartitionBytes`` against
*decoded* size, not encoded; feature extraction emits fixed-width vectors so
downstream shuffles carry floats, never the blobs (project blobs away before
any join/groupBy).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),      # png|wav|mp4|...
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: utf-8 bytes of the text as an opaque blob +
    typed metadata.  Stands in for a real (id, image_bytes) table so the
    plumbing (BinaryType column, metadata struct, partitioning) is real."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit("raw").alias("format"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Real codecs (stdlib-only): uncompressed 24-bit BMP, binary PPM (P6).
# Decoded representation: (width, height, rgb) with rgb a top-down row-major
# bytes buffer of 3*width*height (R, G, B per pixel).
# ---------------------------------------------------------------------------


def _decode_bmp(content: bytes) -> tuple[int, int, bytes]:
    """Uncompressed (BI_RGB) 24-bit BMP -> (w, h, top-down RGB buffer)."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_off,) = struct.unpack_from("<I", content, 10)
    w, h = struct.unpack_from("<ii", content, 18)
    (bpp,) = struct.unpack_from("<H", content, 28)
    (compression,) = struct.unpack_from("<I", content, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rgb = bytearray(3 * w * h)
    for row in range(h):
        src_row = row if top_down else (h - 1 - row)
        base = data_off + src_row * stride
        out = row * w * 3
        for x in range(w):
            b, g, r = content[base + 3 * x : base + 3 * x + 3]
            rgb[out + 3 * x : out + 3 * x + 3] = bytes((r, g, b))
    return w, h, bytes(rgb)


def _encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """(w, h, top-down RGB) -> uncompressed 24-bit bottom-up BMP."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    data_size = stride * h
    out = bytearray(14 + 40 + data_size)
    struct.pack_into("<2sIHHI", out, 0, b"BM", len(out), 0, 0, 54)
    struct.pack_into("<IiiHHIIiiII", out, 14, 40, w, h, 1, 24, 0, data_size,
                     2835, 2835, 0, 0)
    for row in range(h):
        src = (h - 1 - row) * w * 3  # bottom-up storage
        base = 54 + row * stride
        for x in range(w):
            r, g, b = rgb[src + 3 * x : src + 3 * x + 3]
            out[base + 3 * x : base + 3 * x + 3] = bytes((b, g, r))
    return bytes(out)


def _decode_ppm(content: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6, maxval 255) -> (w, h, top-down RGB buffer)."""
    import re as _re

    m = _re.match(
        rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", content
    )
    if not m:
        raise ValueError("not a binary P6 PPM")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    rgb = content[m.end() : m.end() + 3 * w * h]
    if len(rgb) != 3 * w * h:
        raise ValueError("truncated PPM pixel data")
    return w, h, rgb


def _encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


_CODECS = {
    "bmp": (_decode_bmp, _encode_bmp),
    "ppm": (_decode_ppm, _encode_ppm),
}


def synthesize_bmp_media(
    df: DataFrame, id_col: str, text_col: str, width: int = 4, height: int = 4
) -> DataFrame:
    """Deterministic REAL media fixture: a valid 24-bit BMP per row whose
    pixels are the row's utf-8 text bytes (cycled to fill width*height).
    Unlike ``attach_media``'s opaque 'raw' blobs, these rows exercise the
    real decode -> pixel-statistics path end-to-end in distributed queries.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        need = 3 * width * height
        for pdf in batches:
            blobs = []
            for t in pdf["text"]:
                raw = (t or "").encode("utf-8") or b"\x00"
                rgb = (raw * (need // len(raw) + 1))[:need]
                blobs.append(_encode_bmp(width, height, rgb))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].reset_index(drop=True),
                    "content": blobs,
                    "media_type": "image",
                    "format": "bmp",
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    prepared = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(text_col).alias("text")
    )
    return prepared.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_media(content: bytes, fmt: str = "unknown") -> tuple[int, int, bytes]:
    """Decode a media blob to (width, height, top-down RGB buffer).

    Real stdlib decoders run for ``bmp`` and ``ppm``.  Compressed formats
    require codec libs not present in this container — on a production
    image, PIL.Image.open / soundfile.read drop in here (STUB retained,
    clearly marked)."""
    codec = _CODECS.get(fmt)
    if codec is None:
        raise NotImplementedError(
            f"decode of {fmt!r} requires PIL/ffmpeg on the cluster image; "
            "bmp/ppm decode natively, other formats use the deterministic "
            "fallback kernels for pipeline testing"
        )
    return codec[0](content)


def _nn_resize(w: int, h: int, rgb: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of a top-down RGB buffer."""
    out = bytearray(3 * tw * th)
    for y in range(th):
        sy = (y * h) // th
        row = sy * w * 3
        oy = y * tw * 3
        for x in range(tw):
            sx = (x * w) // tw
            out[oy + 3 * x : oy + 3 * x + 3] = rgb[row + 3 * sx : row + 3 * sx + 3]
    return bytes(out)


def _byte_histogram(content: bytes, buckets: int = 16) -> list[float]:
    """Deterministic fallback feature extractor for non-decodable formats:
    normalized byte histogram.  Stands in for a CNN/embedding forward pass
    with the same batch shape and feature width as the pixel path."""
    counts = [0] * buckets
    for byte in content:
        counts[byte % buckets] += 1
    total = len(content) or 1
    return [c / total for c in counts]


def _luminance_histogram(content: bytes, fmt: str, buckets: int) -> list[float]:
    """REAL pixel statistics for decodable formats: normalized luminance
    (BT.601 integer weights) histogram over decoded RGB pixels."""
    w, h, rgb = decode_media(content, fmt)
    counts = [0] * buckets
    for i in range(0, len(rgb), 3):
        lum = (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
        counts[(lum * buckets) // 256] += 1
    total = (w * h) or 1
    return [c / total for c in counts]


def extract_features(media: DataFrame, buckets: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary content via mapInPandas.

    Per-row format dispatch: bmp/ppm rows decode and yield real luminance
    statistics; other formats fall back to the byte histogram (same feature
    width, so one fixed-width vector schema downstream either way).  The
    iterator-of-batches shape is exactly what a GPU inference step needs
    (load model once per partition, process batches).
    """

    def features_of(content: bytes, fmt: str) -> list[float]:
        if fmt in _CODECS:
            return _luminance_histogram(content, fmt, buckets)
        return _byte_histogram(content, buckets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model load would happen here, once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len),
                    "features": [
                        features_of(bytes(c), f)
                        for c, f in zip(pdf["content"], pdf["format"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Fallback resize kernel for non-decodable formats: deterministic
    truncate-or-cycle of the blob to width*height bytes.  A real codec
    resize (PIL.Image.resize on the cluster image) replaces this per
    format; the Spark-side contract — bounded output size per row, 1:1
    batch shape — is identical."""
    target = width * height
    if not content:
        return bytes(target)
    reps = (target // len(content)) + 1
    return (content * reps)[:target]


def _real_resize(content: bytes, fmt: str, width: int, height: int) -> bytes:
    """REAL resize for decodable formats: decode -> nearest-neighbor
    resample -> re-encode in the same format."""
    w, h, rgb = decode_media(content, fmt)
    return _CODECS[fmt][1](width, height, _nn_resize(w, h, rgb, width, height))


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """1:1 Arrow-batched media resize via mapInPandas, format-dispatched:
    bmp/ppm rows go through a real decode -> nearest-neighbor -> re-encode;
    other formats use the deterministic fallback kernel.

    Scale note: output rows have a FIXED byte budget (width*height pixels
    plus a constant-size header), so downstream partition sizing becomes
    deterministic — the usual reason a pipeline resizes before shuffling
    media at all.
    """

    def resize_of(content: bytes, fmt: str) -> bytes:
        if fmt in _CODECS:
            return _real_resize(content, fmt, width, height)
        return _fake_resize(content, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pd.Series(
                [
                    resize_of(bytes(c), f)
                    for c, f in zip(pdf["content"], pdf["format"])
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].reset_index(drop=True),
                    "content": resized,
                    "width": width,
                    "height": height,
                    "n_bytes": resized.map(len),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """1:N frame sampling via mapInPandas (one video row -> n_frames rows).

    STUB frame extraction: the blob is split into n_frames contiguous
    chunks (a real ffmpeg keyframe sampler drops in per-row).  The Spark
    shape is the important part: mapInPandas may emit more rows than it
    consumes, so frame explosion happens WITHOUT a join or explode over
    re-encoded arrays — blobs never round-trip through an array column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                step = max(1, len(blob) // n_frames)
                for k in range(n_frames):
                    chunk = blob[k * step : (k + 1) * step]
                    if not chunk:
                        break
                    ids.append(mid)
                    idxs.append(k)
                    chunks.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": idxs,
                    "content": chunks,
                    "n_bytes": [len(c) for c in chunks],
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
