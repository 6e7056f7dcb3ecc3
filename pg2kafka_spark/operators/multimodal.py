"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages. (SURVEY.md §7 M5 extras.)

The *decode* step is STUBBED (no image/audio libraries in this
container): ``decode_media(..., mode="fake")`` produces deterministic
pseudo-features derived from the bytes; ``mode="real"`` raises
``NotImplementedError`` at the exact point where PIL/ffmpeg/torchcodec
would plug in. Everything Spark-side — schema, partition-preserving
mapInPandas, Arrow batch shapes, downstream joins — is real and
tested; swapping the stub for a real codec changes one pandas
function.

Scale notes: media rows are large (MBs of binary); the mapInPandas
stage is map-only and partition-preserving, so decode parallelism ==
input splits. Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
modest (default 10k) so a batch of blobs fits executor memory;
metadata-only consumers should select typed columns, never the binary
(column pruning keeps blobs unread in parquet).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_TYPES = ("image", "audio", "video")

#: Canonical multimodal table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("source", T.StringType(), True),
    ]
)

#: Output schema of the decode/feature-extract stage.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text
    bytes stand in for an encoded payload (media_type round-robins by
    doc_id). Lets every downstream stage run on real testdata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.col("source"),
    )


def _fake_decode(media_type: str, content: bytes) -> dict:
    """Deterministic pseudo-decode: metadata + an 8-dim feature vector
    derived from md5(content). Stands in for PIL/ffmpeg; same bytes →
    same features on every executor."""
    digest = hashlib.md5(content).digest()
    words = [int.from_bytes(digest[i : i + 2], "big") for i in range(0, 16, 2)]
    feature = [round(w / 65535.0, 6) for w in words]
    out = {
        "n_bytes": len(content),
        "width": None,
        "height": None,
        "duration_ms": None,
        "feature": feature,
    }
    if media_type == "image":
        out["width"] = 16 + words[0] % 1024
        out["height"] = 16 + words[1] % 1024
    else:
        out["duration_ms"] = 1000 + words[2] % 600_000
    return out


def decode_media(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode/feature-extract stage over Arrow batches.

    ``mode="real"`` is the integration point for actual codecs —
    intentionally unimplemented here. ``mode="fake"`` exercises the
    full distributed path with deterministic output.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not present "
                    "in this environment; plug PIL/ffmpeg in here"
                )
            rows = [
                {
                    "media_id": mid,
                    "media_type": mtype,
                    **_fake_decode(mtype, bytes(content)),
                }
                for mid, mtype, content in zip(
                    pdf["media_id"], pdf["media_type"], pdf["content"]
                )
            ]
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


#: Output schema of the frame-sampling stage.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset_ms", T.LongType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, frames_per_item: int = 4) -> DataFrame:
    """Frame/segment sampling stage: video/audio rows emit
    ``frames_per_item`` evenly-spaced sample points, images emit one.

    The frame *decode* is the same stub as :func:`decode_media` (an
    md5 over the bytes at a deterministic stride stands in for the
    extracted frame); the distributed shape is the real thing — a
    partition-preserving ``mapInPandas`` whose output is a row per
    sampled frame, ready for a downstream embedding/dedup stage. Row
    explosion is bounded (``frames_per_item``) so a 100 TB video
    corpus fans out predictably.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                data = bytes(content)
                n = 1 if mtype == "image" else frames_per_item
                stride = max(1, len(data) // max(n, 1))
                for i in range(n):
                    chunk = data[i * stride : (i + 1) * stride] or b"\x00"
                    rows.append(
                        {
                            "media_id": mid,
                            "media_type": mtype,
                            "frame_idx": i,
                            "offset_ms": i * 1000,
                            "frame_fp": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def frame_overlap_pairs(frames: DataFrame, min_common: int = 2) -> DataFrame:
    """Media-level near-dup from frame-level fingerprints: pairs of
    items sharing ≥ ``min_common`` sampled-frame fingerprints (the
    standard video-dedup reduction: near-dup videos share most
    sampled frames even when container bytes differ).

    Same join shape as shingle dedup — equality join on a uniform
    128-bit key, pair-count aggregation — so the same scale
    properties hold: shuffle keys are hashes, per-key fan-out is
    bounded by duplicate multiplicity.
    """
    f = frames.select("media_id", "frame_fp").distinct()
    a, b = f.alias("a"), f.alias("b")
    return (
        a.join(
            b,
            (F.col("a.frame_fp") == F.col("b.frame_fp"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common_frames"))
        .filter(F.col("common_frames") >= min_common)
    )


def media_stats(features: DataFrame) -> DataFrame:
    """Typed-metadata rollup by media type (runs entirely on the
    decoded projection — never touches the binary column)."""
    return features.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
