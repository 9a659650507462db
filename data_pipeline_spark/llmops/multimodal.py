"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly marked) behind deterministic fakes — but everything Spark-side is
real and tested: schema, batch iteration shape, partitioning, and the
mapInPandas plumbing that a real decoder (PIL/ffmpeg on the cluster image)
would drop into.

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


def decode_media(content: bytes) -> object:
    """STUB: real image/audio decode requires codec libs not present in this
    container.  On a production image, replace with PIL.Image.open /
    soundfile.read; everything around this function is real."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg on the cluster image; "
        "use extract_features (deterministic fake) for pipeline testing"
    )


def _byte_histogram(content: bytes, buckets: int = 16) -> list[float]:
    """Deterministic fake feature extractor: normalized byte histogram.
    Stands in for a CNN/embedding forward pass with the same batch shape."""
    counts = [0] * buckets
    for byte in content:
        counts[byte % buckets] += 1
    total = len(content) or 1
    return [c / total for c in counts]


def extract_features(media: DataFrame, buckets: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary content via mapInPandas.

    The iterator-of-batches shape is exactly what a GPU inference step needs
    (load model once per partition, process batches); the fake histogram
    keeps it testable here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model load would happen here, once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len),
                    "features": pdf["content"].map(
                        lambda c: _byte_histogram(bytes(c), buckets)
                    ),
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
    """STUB resize kernel: deterministic truncate-or-cycle of the blob to
    width*height bytes.  A real image resize (PIL.Image.resize on the
    cluster image) drops in here; the Spark-side contract — bounded output
    size per row, 1:1 batch shape — is what this preserves."""
    target = width * height
    if not content:
        return bytes(target)
    reps = (target // len(content)) + 1
    return (content * reps)[:target]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """1:1 Arrow-batched media resize via mapInPandas.

    Scale note: output rows have a FIXED byte budget (width*height), so
    downstream partition sizing becomes deterministic — the usual reason a
    pipeline resizes before shuffling media at all.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["content"].map(
                lambda c: _fake_resize(bytes(c), width, height)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
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
