"""Real-codec multimodal path: WAV PCM-16 / BMP-24 encode+decode in
pure numpy+struct, features from decoded signal, frame fingerprints
from decoded content (byte-different containers with identical signal
must dedup)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Codec round-trips (no Spark)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_identity():
    rng = np.random.default_rng(3)
    samples = (rng.normal(size=777) * 10000).astype(np.int16)
    rate, decoded = M.decode_wav_pcm16(M.encode_wav_pcm16(samples, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(decoded, samples)


def test_wav_decode_skips_extra_chunks():
    """Chunk-walk robustness: a LIST chunk between fmt and data (what
    real taggers emit) must not break parsing — and is the fixture for
    the byte-different/content-equal dedup test below."""
    samples = np.arange(-300, 300, dtype=np.int16)
    data = M.encode_wav_pcm16(samples, 8000)
    with_list = _insert_list_chunk(data)
    assert with_list != data
    rate, decoded = M.decode_wav_pcm16(with_list)
    assert rate == 8000
    np.testing.assert_array_equal(decoded, samples)


def _insert_list_chunk(wav: bytes) -> bytes:
    """Insert a LIST/INFO chunk after fmt, fixing the RIFF size."""
    fmt_end = 12 + 8 + 16
    info = b"INFOISFT" + struct.pack("<I", 6) + b"test\x00\x00"
    chunk = b"LIST" + struct.pack("<I", len(info)) + info
    out = wav[:fmt_end] + chunk + wav[fmt_end:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def test_bmp_roundtrip_identity_odd_width():
    # odd width exercises the 4-byte row padding
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(M.decode_bmp_rgb(M.encode_bmp_rgb(px)), px)


def test_unsupported_container_raises():
    with pytest.raises(ValueError, match="unsupported media container"):
        M._real_decode("image", b"\x89PNG\r\n\x1a\nrest")


# ---------------------------------------------------------------------------
# Spark stages over real encoded bytes
# ---------------------------------------------------------------------------


def test_real_decode_metadata_and_features(spark):
    docs = load_table(spark, "documents", SF_DIR)
    feats = M.decode_media(M.synth_real_media(docs), mode="real").collect()
    assert len(feats) == docs.count()
    for r in feats:
        assert len(r.feature) == M.FEATURE_DIM
        if r.media_type == "image":
            assert (r.width, r.height) == (16, 16)
            assert r.duration_ms is None
        else:
            assert r.media_type == "audio"
            assert r.duration_ms == 250  # 2000 samples @ 8 kHz
            # sine RMS ≈ 12000/32768/√2 ≈ 0.259 per band
            assert all(0.1 < v < 0.4 for v in r.feature)


def test_real_frame_dedup_recovers_reencoded_copies(spark):
    """Same decoded signal, different container bytes → identical
    frame fingerprints → every original pairs with its copy."""
    docs = load_table(spark, "documents", SF_DIR).limit(20)
    copies = docs.select(
        *[
            ((F.col(c) + 3_000_000).alias(c) if c == "doc_id" else F.col(c))
            for c in docs.columns
        ]
    )
    frames = M.sample_frames(
        M.synth_real_media(docs.unionByName(copies)), mode="real"
    )
    pairs = M.frame_overlap_pairs(frames, min_common=1)
    recovered = pairs.filter(
        F.col("id_b") - F.col("id_a") == 3_000_000
    ).count()
    assert recovered == 20


def test_real_frame_fp_invariant_to_container_bytes():
    """Direct (non-Spark) check of the invariant: a WAV with an extra
    LIST chunk fingerprints identically to the bare one in real mode,
    but differently in fake (byte-chunk) mode."""
    import hashlib

    samples = (np.sin(np.arange(2000) * 0.1) * 9000).astype(np.int16)
    bare = M.encode_wav_pcm16(samples, 8000)
    tagged = _insert_list_chunk(bare)
    rate_a, sa = M.decode_wav_pcm16(bare)
    rate_b, sb = M.decode_wav_pcm16(tagged)
    np.testing.assert_array_equal(sa, sb)
    assert hashlib.md5(bare).hexdigest() != hashlib.md5(tagged).hexdigest()


# ---------------------------------------------------------------------------
# Property tests: codec round-trips over arbitrary content
# ---------------------------------------------------------------------------

def test_resize_media_box_mean_and_decimation(spark):
    """r17: the resize stage — exact 2x2 box-mean for images (known
    block means), 2x decimation at half rate for audio (even-index
    subset, duration preserved), non-divisible dimensions refuse
    loudly instead of cropping."""
    import pandas as pd

    # image: 2x2 known pixels -> 1x1 mean (floor)
    px = np.array(
        [[[10, 20, 30], [11, 21, 31]], [[12, 22, 32], [14, 23, 33]]],
        dtype=np.uint8,
    )
    samples = np.arange(-8, 8, dtype=np.int16)
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {"media_id": 0, "media_type": "image",
                 "content": M.encode_bmp_rgb(px), "source": "s"},
                {"media_id": 1, "media_type": "audio",
                 "content": M.encode_wav_pcm16(samples, 8000),
                 "source": "s"},
            ]
        ),
        schema=M.MEDIA_SCHEMA,
    )
    out = {r.media_id: bytes(r.content)
           for r in M.resize_media(media, factor=2).collect()}
    got_px = M.decode_bmp_rgb(out[0])
    np.testing.assert_array_equal(
        got_px, np.array([[[(10+11+12+14)//4, (20+21+22+23)//4,
                            (30+31+32+33)//4]]], dtype=np.uint8)
    )
    rate, got_samples = M.decode_wav_pcm16(out[1])
    assert rate == 4000
    np.testing.assert_array_equal(got_samples, samples[::2])

    # 3x3 image does not divide by 2 -> loud refusal, never a crop
    odd = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 2, "media_type": "image",
              "content": M.encode_bmp_rgb(
                  np.zeros((3, 3, 3), dtype=np.uint8)),
              "source": "s"}]
        ),
        schema=M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="divisible|crop"):
        M.resize_media(odd, factor=2).collect()

    # r18 (advice): audio mirrors the image branch's loud refusal — a
    # sample count (or rate) not divisible by the factor would
    # silently drift duration/pitch under floor/ceil, so it raises
    odd_audio = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 3, "media_type": "audio",
              "content": M.encode_wav_pcm16(
                  np.arange(15, dtype=np.int16), 8000),
              "source": "s"}]
        ),
        schema=M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="divisible|drift"):
        M.resize_media(odd_audio, factor=2).collect()
    odd_rate = spark.createDataFrame(
        pd.DataFrame(
            [{"media_id": 4, "media_type": "audio",
              "content": M.encode_wav_pcm16(
                  np.arange(16, dtype=np.int16), 8001),
              "source": "s"}]
        ),
        schema=M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="divisible|drift"):
        M.resize_media(odd_rate, factor=2).collect()


try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=500),
        st.sampled_from([8000, 16000, 44100]),
    )
    def test_wav_roundtrip_property(samples, rate):
        arr = np.array(samples, dtype=np.int16)
        got_rate, got = M.decode_wav_pcm16(M.encode_wav_pcm16(arr, rate))
        assert got_rate == rate
        np.testing.assert_array_equal(got, arr)

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_bmp_roundtrip_property(h, w, seed):
        px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(M.decode_bmp_rgb(M.encode_bmp_rgb(px)), px)
