"""Multimodal column plumbing: schema, Arrow batch shape, deterministic fake
decode, feature extraction, and the NotImplementedError gate for real codecs."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import (
    FEATURE_DIM,
    attach_fake_media,
    decode_media,
    extract_features,
)
from map_reduce_ruby_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_fake_media(load_table(spark, sf_dir, "documents"))


def test_payload_schema_and_checksum(media, spark, sf_dir):
    row = media.filter(media.doc_id == 0).collect()[0]
    text = (
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0).collect()[0].text
    )
    assert bytes(row.payload) == text.encode("utf-8")
    assert row.payload_len == len(text.encode("utf-8"))
    assert row.checksum == hashlib.md5(text.encode("utf-8")).hexdigest()
    assert row.media_type == "image"  # doc_id 0 % 3


def test_decode_dims_deterministic(media):
    rows = {r.doc_id: r for r in decode_media(media).filter(F.col("doc_id") < 6).collect()}
    for doc_id, r in rows.items():
        h = int(r.checksum[:8], 16)
        assert r.width == 16 + h % 1024
        assert r.height == 16 + (h >> 10) % 1024
        if r.media_type == "image":
            assert r.n_frames == 1
        else:
            assert r.n_frames == 1 + (h >> 20) % 240


def test_unknown_codec_raises(spark):
    # mp4 has no decoder in any environment this suite runs in: the gate
    # must stay a loud NotImplementedError naming the codec, never a
    # silent fake decode
    bad = spark.createDataFrame(
        [(1, "video", "mp4", bytearray(b"\x00\x00"), 2, "00")],
        "doc_id long, media_type string, codec string, payload binary, payload_len long, checksum string",
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder available"):
        decode_media(bad).collect()


def _wav_bytes(n_frames: int, channels: int = 2, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(2 * channels * n_frames))
    return buf.getvalue()


def test_real_wav_decode(spark):
    """The REAL decoder path (stdlib wave, soft-registered like PIL): a
    genuine WAV payload decodes to its true channel count / bit depth /
    frame count through the same mapInPandas plumbing as the fake codec —
    and a mixed fake+wav batch dispatches per codec."""
    import hashlib

    wav1 = _wav_bytes(n_frames=123, channels=2)
    wav2 = _wav_bytes(n_frames=7, channels=1)
    fake = b"some opaque payload"
    rows = [
        (1, "audio", "wav", bytearray(wav1), len(wav1), hashlib.md5(wav1).hexdigest()),
        (2, "audio", "wav", bytearray(wav2), len(wav2), hashlib.md5(wav2).hexdigest()),
        (3, "image", "fake", bytearray(fake), len(fake), hashlib.md5(fake).hexdigest()),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, codec string, payload binary, payload_len long, checksum string",
    )
    got = {r.doc_id: r for r in decode_media(media).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (2, 16, 123)
    assert (got[2].width, got[2].height, got[2].n_frames) == (1, 16, 7)
    assert got[3].n_frames == 1  # fake image path unchanged in the mix


def test_pil_codecs_register_only_when_importable():
    import importlib.util

    from map_reduce_ruby_spark.operators.multimodal import available_decoders

    decoders = available_decoders()
    assert "fake" in decoders and "wav" in decoders
    has_pil = importlib.util.find_spec("PIL") is not None
    assert ("png" in decoders) == has_pil
    assert ("jpeg" in decoders) == has_pil


def test_features_match_numpy(media, spark, sf_dir):
    feats = {r.doc_id: np.array(r.feature) for r in extract_features(media).filter(F.col("doc_id") < 4).collect()}
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 4).collect()
    }
    for doc_id, vec in feats.items():
        arr = np.frombuffer(texts[doc_id].encode("utf-8"), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)[:FEATURE_DIM].astype("float64")
        expected = (hist / hist.sum()).astype("float32")
        assert vec.shape == (FEATURE_DIM,)
        np.testing.assert_array_equal(vec, expected)
        assert abs(vec.sum() - 1.0) < 1e-5


def test_resize_media_stride_sampling(media):
    """resize_media: uniform stride-k sampling to <=256 bytes, byte-exact
    against numpy on the driver."""
    from map_reduce_ruby_spark.operators import resize_media

    rows = {r.doc_id: r for r in resize_media(media).filter(F.col("doc_id") < 5).collect()}
    orig = {r.doc_id: bytes(r.payload) for r in media.filter(F.col("doc_id") < 5).collect()}
    for doc_id, r in rows.items():
        arr = np.frombuffer(orig[doc_id], dtype=np.uint8)
        step = max(1, -(-len(arr) // 256))
        expected = arr[::step].tobytes()
        assert bytes(r.payload_resized) == expected
        assert r.orig_len == len(arr)
        assert r.resized_len == len(expected) <= 256


def test_frame_energy_exact_vs_python(media, spark, sf_dir):
    from map_reduce_ruby_spark.operators.multimodal import frame_energy

    got = frame_energy(media, frame_len=64).toPandas()
    payloads = {
        r.doc_id: bytes(r.payload) for r in media.select("doc_id", "payload").collect()
    }
    for doc_id, grp in got.groupby("doc_id"):
        b = payloads[doc_id]
        n = len(b)
        expect_frames = (n + 63) // 64
        assert len(grp) == expect_frames, (doc_id, n)
        for row in grp.itertuples(index=False):
            lo, hi = row.frame_idx * 64, min((row.frame_idx + 1) * 64, n)
            assert row.frame_n == hi - lo
            assert row.sum_sq == sum(v * v for v in b[lo:hi]), (doc_id, row.frame_idx)


def test_phash_known_values_and_python_twin(media, spark):
    """dHash pinned two ways: a hand-computed fixture (bytes [10, 20] fall
    in grid cells 0 and 36 -> rows 0 and 4 each pack bit 0) and a full
    python re-derivation over the real payloads."""
    from map_reduce_ruby_spark.operators import phash_media
    from map_reduce_ruby_spark.operators.multimodal import MEDIA_SCHEMA

    import hashlib

    payload = bytes([10, 20])
    md5 = hashlib.md5(payload).hexdigest()
    tiny = spark.createDataFrame(
        # doc 7 carries the IDENTICAL payload: the dedup-family invariant
        # (shared hash -> one family, MIN doc_id keeper) is exercised on a
        # REAL duplicate, not vacuously (the parquet fixtures' texts are
        # all distinct)
        [
            (0, "image", "fake", payload, 2, md5),
            (7, "image", "fake", payload, 2, md5),
            (1, "audio", "fake", bytes([0, 10]), 2, hashlib.md5(bytes([0, 10])).hexdigest()),
        ],
        MEDIA_SCHEMA,
    )
    hashed = phash_media(tiny)
    by_doc = {r.doc_id: r.phash for r in hashed.collect()}
    assert by_doc[0] == "0100000001000000", by_doc
    assert by_doc[7] == by_doc[0]  # identical payloads share the hash
    # a zero first byte kills row 0's comparison: different hash
    assert by_doc[1] == "0000000001000000", by_doc
    fam = (
        hashed.groupBy("phash")
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert [(r.keep, r.n) for r in fam] == [(0, 2)]

    got = {r.doc_id: r.phash for r in phash_media(media).collect()}
    payloads = {
        r.doc_id: bytes(r.payload) for r in media.select("doc_id", "payload").collect()
    }
    for doc_id, b in payloads.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        n = len(arr)
        sums = np.bincount((np.arange(n) * 72) // n, weights=arr, minlength=72)
        grid = sums.reshape(8, 9)
        bits = grid[:, :-1] > grid[:, 1:]
        expect = "".join(
            f"{int((row * (1 << np.arange(8))).sum()):02x}" for row in bits
        )
        assert got[doc_id] == expect, doc_id
    # identical payloads must share a hash (the dedup family invariant)
    by_payload = {}
    for doc_id, b in payloads.items():
        by_payload.setdefault(b, set()).add(got[doc_id])
    assert all(len(hs) == 1 for hs in by_payload.values())
