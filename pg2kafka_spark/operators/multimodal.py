"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages. (SURVEY.md §7 M5 extras.)

Two decode paths share every Spark-side stage (schema, partition-
preserving mapInPandas, Arrow batch shapes, downstream joins):

* ``mode="real"`` — an actual bytes→samples/pixels decode for the two
  uncompressed containers expressible with numpy + struct alone (no
  codec libraries in this container): RIFF/WAVE PCM-16 audio and
  BMP 24-bpp images (``decode_wav_pcm16`` / ``decode_bmp_rgb``, with
  matching encoders for fixtures). Features are computed from the
  decoded signal (band RMS energies / channel+quadrant statistics),
  and in real mode frame fingerprints hash decoded content, so two
  containers that differ in bytes but carry identical audio/pixels
  dedup together. Compressed formats (JPEG/MP3/MP4...) still need
  PIL/ffmpeg and raise ``ValueError`` at the dispatch point.
* ``mode="fake"`` — deterministic pseudo-features derived from the
  raw bytes; keeps synthetic text-as-bytes fixtures usable.

Scale notes: media rows are large (MBs of binary); the mapInPandas
stage is map-only and partition-preserving, so decode parallelism ==
input splits. Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
modest (default 10k) so a batch of blobs fits executor memory;
metadata-only consumers should select typed columns, never the binary
(column pruning keeps blobs unread in parquet).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Real codecs: RIFF/WAVE PCM-16 and BMP 24-bpp, pure numpy + struct
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE container around ``samples``."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16,
        1,              # PCM
        1,              # mono
        rate,
        rate * 2,       # byte rate
        2,              # block align
        16,             # bits/sample
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container: walk the chunk list (fmt may be
    followed by LIST/INFO etc. before data), require PCM-16 mono.
    Returns (sample_rate, int16 samples)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_tag} ch={channels} bits={bits} "
                    "(PCM-16 mono only)"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, np.frombuffer(pcm, dtype="<i2")


def encode_bmp_rgb(pixels: np.ndarray) -> bytes:
    """24-bpp bottom-up BMP (BITMAPINFOHEADER) from an (H, W, 3)
    uint8 RGB array; rows padded to 4 bytes as the format requires."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up row order, BGR channel order
    body = b"".join(
        px[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def decode_bmp_rgb(data: bytes) -> np.ndarray:
    """Parse a 24-bpp uncompressed BMP into an (H, W, 3) uint8 RGB
    array (handles bottom-up and top-down row order)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def _real_decode(media_type: str, content: bytes) -> dict:
    """Actual decode for the supported containers, dispatched on magic
    bytes. Features come from the decoded signal (not the container
    bytes): audio → RMS energy of FEATURE_DIM equal time bands,
    normalized to [0,1]; image → channel means, luma std, and quadrant
    luma means, /255. Both rounded to 6 dp for cross-engine stability.
    """
    out = {
        "n_bytes": len(content),
        "width": None,
        "height": None,
        "duration_ms": None,
        "feature": None,
    }
    if content[:4] == b"RIFF":
        rate, samples = decode_wav_pcm16(content)
        out["duration_ms"] = int(len(samples) * 1000 // max(rate, 1))
        x = samples.astype(np.float64) / 32768.0
        bands = np.array_split(x, FEATURE_DIM)
        out["feature"] = [
            round(float(np.sqrt(np.mean(b * b))) if len(b) else 0.0, 6) for b in bands
        ]
    elif content[:2] == b"BM":
        px = decode_bmp_rgb(content)
        h, w, _ = px.shape
        out["width"], out["height"] = int(w), int(h)
        luma = px.astype(np.float64).mean(axis=2)
        quads = [
            luma[: h // 2 or 1, : w // 2 or 1],
            luma[: h // 2 or 1, w // 2 :],
            luma[h // 2 :, : w // 2 or 1],
            luma[h // 2 :, w // 2 :],
        ]
        feat = [px[:, :, c].mean() for c in range(3)] + [luma.std()] + [
            q.mean() if q.size else 0.0 for q in quads
        ]
        out["feature"] = [round(float(v) / 255.0, 6) for v in feat]
    else:
        raise ValueError(
            f"unsupported media container for media_type={media_type!r}: "
            "real mode decodes RIFF/WAVE PCM-16 and BMP-24 (compressed "
            "formats need PIL/ffmpeg)"
        )
    return out


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

    ``mode="real"`` decodes the payload bytes (WAV PCM-16 / BMP-24,
    see module docstring) and features the decoded signal;
    ``mode="fake"`` derives deterministic pseudo-features from the raw
    bytes. Same plan shape either way: partition-preserving
    mapInPandas, one output row per item.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")
    decode = _real_decode if mode == "real" else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": mid,
                    "media_type": mtype,
                    **decode(mtype, bytes(content)),
                }
                for mid, mtype, content in zip(
                    pdf["media_id"], pdf["media_type"], pdf["content"]
                )
            ]
            yield pd.DataFrame(rows)

    # project to the three columns the kernel reads BEFORE the opaque
    # stage: Spark cannot see which columns a mapInPandas touches, so
    # without this the scan ships (and at real scale, reads) every
    # MEDIA_SCHEMA column into the Python workers (guide §4.1)
    return media.select("media_id", "media_type", "content").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def synth_real_media(documents: DataFrame) -> DataFrame:
    """Media table with REAL encoded payloads, deterministically
    derived from each document: even doc_ids → 16×16 BMP-24 images,
    odd → 0.25 s/8 kHz PCM-16 WAVs, pixel/sample values seeded by
    md5(text) (so re-uploads of the same text encode identical
    content on any executor — no RNG state, no library versions).
    Video stays fixture-less: no uncompressed video container is
    expressible without codec libraries.

    Encoding runs in the same partition-preserving mapInPandas shape
    as decode — at 100 TB this stage IS the pipeline's ingest format
    conversion, so its distributed behavior is worth exercising, not
    just its output.
    """
    src = documents.select("doc_id", "text", "source")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
                digest = hashlib.md5(text.encode("utf-8")).digest()
                words = np.frombuffer(digest, dtype="<u2").astype(np.int64)
                if did % 2 == 0:
                    # gradient + per-digest offsets: decoded stats vary by doc
                    base = np.add.outer(np.arange(16), np.arange(16)) * 4
                    px = np.stack(
                        [(base + int(words[c] % 97)) % 256 for c in range(3)], axis=2
                    ).astype(np.uint8)
                    content, mtype = encode_bmp_rgb(px), "image"
                else:
                    t = np.arange(2000, dtype=np.float64)
                    freq = 200.0 + float(words[0] % 800)
                    wave = np.sin(2 * np.pi * freq * t / 8000.0)
                    content = encode_wav_pcm16(
                        np.round(wave * 12000).astype(np.int16), 8000
                    )
                    mtype = "audio"
                rows.append(
                    {
                        "media_id": did,
                        "media_type": mtype,
                        "content": content,
                        "source": source,
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(encode_batches, schema=MEDIA_SCHEMA)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL container-domain downsampling — the resize/resample stage
    of the multimodal plumbing (decode → exact integer resample →
    re-encode), the op a training pipeline runs to normalize media
    before feature extraction:

    * images (BMP-24): ``factor×factor`` box-mean — each output pixel
      is the integer mean (floor) of its source block; dimensions
      must divide by ``factor`` (raises loudly otherwise — silent
      crop is the data-lobotomy class this repo refuses everywhere);
    * audio (WAV PCM-16): decimation by ``factor`` — every
      ``factor``-th sample at ``rate/factor``, so duration is
      preserved and the container stays self-describing; the sample
      rate AND the sample count must divide by ``factor`` (raises
      loudly otherwise, mirroring the image branch — a floored rate
      or a ceil'd sample subset would silently drift pitch/duration).

    All-integer arithmetic end to end, so the output containers are
    bit-deterministic on any executor — and analytically derivable
    for the synthetic fixtures, which is what lets
    ``multimodal_resize_parity`` hash-check this path against a
    DuckDB oracle that never sees a container byte. Same
    partition-preserving ``mapInPandas`` shape and MEDIA_SCHEMA as
    encode/decode, so the stage composes with ``decode_media`` /
    ``decode_media_checked`` / ``sample_frames``. At 100 TB this
    stage is map-only: no shuffle, scales with bytes scanned."""
    factor = int(factor)
    if factor < 1:
        raise ValueError(f"resize factor must be >= 1, got {factor}")

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content, source in zip(
                pdf["media_id"],
                pdf["media_type"],
                pdf["content"],
                pdf["source"],
            ):
                data = bytes(content)
                if data[:4] == b"RIFF":
                    rate, samples = decode_wav_pcm16(data)
                    if rate % factor or len(samples) % factor:
                        raise ValueError(
                            f"audio {int(mid)} has rate {rate} and "
                            f"{len(samples)} samples: not divisible "
                            f"by resize factor {factor} — refusing a "
                            "silent pitch/duration drift (same "
                            "no-silent-degradation rule as the image "
                            "branch)"
                        )
                    out = encode_wav_pcm16(
                        samples[::factor], rate // factor
                    )
                elif data[:2] == b"BM":
                    px = decode_bmp_rgb(data)
                    h, w, _ = px.shape
                    if h % factor or w % factor:
                        raise ValueError(
                            f"image {int(mid)} is {h}x{w}: not "
                            f"divisible by resize factor {factor} — "
                            "refusing a silent crop"
                        )
                    blocks = px.astype(np.int64).reshape(
                        h // factor, factor, w // factor, factor, 3
                    )
                    out_px = (
                        blocks.sum(axis=(1, 3)) // (factor * factor)
                    ).astype(np.uint8)
                    out = encode_bmp_rgb(out_px)
                else:
                    raise ValueError(
                        "unsupported container in resize_media"
                    )
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "content": out,
                        "source": source,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize_batches, schema=MEDIA_SCHEMA)


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


def sample_frames(
    media: DataFrame, frames_per_item: int = 4, mode: str = "fake"
) -> DataFrame:
    """Frame/segment sampling stage: video/audio rows emit
    ``frames_per_item`` evenly-spaced sample points, images emit one.

    ``mode="fake"`` fingerprints strided slices of the *container
    bytes* (stub, works on any payload). ``mode="real"`` decodes
    first and fingerprints the *content*: evenly-spaced sample
    segments for WAV audio (offset_ms from the actual sample rate),
    the pixel array for BMP images — so two containers whose bytes
    differ (chunk order, padding) but whose signal is identical share
    every fingerprint, which is the invariant frame-dedup actually
    needs. Either way the distributed shape is identical: a
    partition-preserving ``mapInPandas`` with bounded row explosion
    (``frames_per_item``), so a 100 TB corpus fans out predictably.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown frame mode {mode!r}")

    def item_frames(mtype: str, data: bytes) -> list[tuple[int, int, str]]:
        if mode == "real":
            if data[:4] == b"RIFF":
                rate, samples = decode_wav_pcm16(data)
                n = frames_per_item
                stride = max(1, len(samples) // n)
                return [
                    (
                        i,
                        int(i * stride * 1000 // max(rate, 1)),
                        hashlib.md5(
                            np.ascontiguousarray(
                                samples[i * stride : (i + 1) * stride], dtype="<i2"
                            ).tobytes()
                        ).hexdigest(),
                    )
                    for i in range(n)
                ]
            if data[:2] == b"BM":
                px = decode_bmp_rgb(data)
                return [(0, 0, hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest())]
            raise ValueError("unsupported media container in real frame mode")
        n = 1 if mtype == "image" else frames_per_item
        stride = max(1, len(data) // max(n, 1))
        return [
            (i, i * 1000, hashlib.md5(data[i * stride : (i + 1) * stride] or b"\x00").hexdigest())
            for i in range(n)
        ]

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                for idx, off, fp in item_frames(mtype, bytes(content)):
                    rows.append(
                        {
                            "media_id": mid,
                            "media_type": mtype,
                            "frame_idx": idx,
                            "offset_ms": off,
                            "frame_fp": fp,
                        }
                    )
            yield pd.DataFrame(rows)

    # pre-prune to the kernel's inputs — see decode_media (guide §4.1)
    return media.select("media_id", "media_type", "content").mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )


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


#: Output schema of the integer-exact decode census (oracle twin).
DECODE_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sum_a", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("sum_c", T.LongType(), False),
    ]
)


def decode_media_checked(media: DataFrame) -> DataFrame:
    """Integer-exact census of the REAL decode path — the oracle twin
    of ``decode_media(mode="real")`` (round-5 verdict: the media
    queries were all rows-only; this makes the codecs themselves
    hash-checkable).

    Decodes every payload with the same ``decode_wav_pcm16`` /
    ``decode_bmp_rgb`` codecs and emits only INTEGER functionals of
    the decoded signal, so a DuckDB oracle that re-derives the
    expected samples/pixels analytically (the ``synth_real_media``
    payloads are deterministic in ``md5(text)``) matches bit-for-bit
    — no float summation-order caveats:

    * audio: ``sum_a`` = Σ samples, ``sum_b`` = Σ |samples|,
      ``sum_c`` = sample count (+ rate-derived ``duration_ms``);
    * image: ``sum_a``/``sum_b``/``sum_c`` = per-channel R/G/B pixel
      sums (+ ``width``/``height``).

    Any header corruption, chunk-walk bug, row-padding or BGR/top-down
    mistake in the codecs moves at least one of these integers. Same
    distributed shape as the production decode: partition-preserving
    ``mapInPandas``, one output row per item.
    """

    def census_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                data = bytes(content)
                if data[:4] == b"RIFF":
                    rate, samples = decode_wav_pcm16(data)
                    s = samples.astype(np.int64)
                    rows.append(
                        {
                            "media_id": mid,
                            "media_type": mtype,
                            "n_bytes": len(data),
                            "width": None,
                            "height": None,
                            "duration_ms": int(len(s) * 1000 // max(rate, 1)),
                            "sum_a": int(s.sum()),
                            "sum_b": int(np.abs(s).sum()),
                            "sum_c": int(len(s)),
                        }
                    )
                elif data[:2] == b"BM":
                    px = decode_bmp_rgb(data).astype(np.int64)
                    h, w, _ = px.shape
                    rows.append(
                        {
                            "media_id": mid,
                            "media_type": mtype,
                            "n_bytes": len(data),
                            "width": int(w),
                            "height": int(h),
                            "duration_ms": None,
                            "sum_a": int(px[:, :, 0].sum()),
                            "sum_b": int(px[:, :, 1].sum()),
                            "sum_c": int(px[:, :, 2].sum()),
                        }
                    )
                else:
                    raise ValueError("unsupported container in decode census")
            yield pd.DataFrame(rows)

    # pre-prune to the kernel's inputs — see decode_media (guide §4.1)
    return media.select("media_id", "media_type", "content").mapInPandas(
        census_batches, schema=DECODE_CHECK_SCHEMA
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
