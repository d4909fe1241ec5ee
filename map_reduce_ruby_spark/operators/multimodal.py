"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow batches via ``mapInPandas``.

``decode_media`` dispatches on a ``codec`` field through a SOFT-IMPORTED
decoder registry (``available_decoders``): the deterministic ``fake`` codec
(byte-stat "decode" — stable across engines and runs, the CI/oracle path)
and a REAL stdlib-``wave`` WAV decoder are always available; PIL-backed
png/jpeg decode activates automatically when PIL is importable in the
workers; any codec with no available decoder raises
``NotImplementedError`` naming it — never a silent fake. Everything
Spark-side — schema, Arrow batch shape, partition behavior, UDF
signatures — is real and tested (tests/test_multimodal.py, including a
real WAV fixture decoded by the real decoder).

Scale notes:
- Payloads stay in the executors: no collect, no driver hop; Arrow moves
  binary columns zero-copy into pandas.
- ``mapInPandas`` streams batches (spark.sql.execution.arrow.maxRecordsPerBatch
  bounds memory per batch regardless of payload size).
- Feature vectors come back as ``array<float>`` ready for the similarity
  operators (plans/similarity_queries.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

# media payload + typed metadata, the schema a 100 TB multimodal lake stores
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), False),  # fake|png|jpeg|wav|mp4
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("payload_len", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),  # md5 hex of payload
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary payload per document (UTF-8 bytes
    of the text — stands in for an image/audio blob; derived from driver
    testdata, never synthesized randomly, and byte-reproducible by the DuckDB
    oracle so the whole media chain stays hash-checkable)."""

    def make_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["text"].map(lambda t: t.encode("utf-8"))
            media_type = pdf["doc_id"].map(
                lambda i: ("image", "audio", "video")[int(i) % 3]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": media_type,
                    "codec": "fake",
                    "payload": payload,
                    "payload_len": payload.map(len).astype("int64"),
                    "checksum": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(make_payload, MEDIA_SCHEMA)


def _decode_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-stat 'decode' (vectorized): dimensions derived from
    the payload checksum — a stable stand-in for a real pixel decode."""
    h = pdf["checksum"].str[:8].map(lambda s: int(s, 16)).to_numpy(dtype="int64")
    out = pdf.copy()
    out["width"] = 16 + h % 1024
    out["height"] = 16 + (h >> 10) % 1024
    out["n_frames"] = np.where(
        (pdf["media_type"] == "image").to_numpy(), 1, 1 + (h >> 20) % 240
    )
    return out


def _decode_wav(pdf: pd.DataFrame) -> pd.DataFrame:
    """REAL WAV decode via the stdlib ``wave`` module (no external deps):
    width = channels, height = bits per sample, n_frames = PCM frames —
    the audio face of the decoded-dimensions contract."""
    import io
    import wave

    widths, heights, frames = [], [], []
    for b in pdf["payload"]:
        with wave.open(io.BytesIO(bytes(b))) as w:
            widths.append(w.getnchannels())
            heights.append(w.getsampwidth() * 8)
            frames.append(w.getnframes())
    out = pdf.copy()
    out["width"] = pd.Series(widths, dtype="int64", index=pdf.index)
    out["height"] = pd.Series(heights, dtype="int64", index=pdf.index)
    out["n_frames"] = pd.Series(frames, dtype="int64", index=pdf.index)
    return out


def _decode_image_pil(pdf: pd.DataFrame) -> pd.DataFrame:
    """REAL image decode via PIL (present only when the deployment installs
    it — see available_decoders)."""
    import io

    from PIL import Image

    widths, heights, frames = [], [], []
    for b in pdf["payload"]:
        with Image.open(io.BytesIO(bytes(b))) as img:
            w, h = img.size
            widths.append(w)
            heights.append(h)
            frames.append(int(getattr(img, "n_frames", 1)))
    out = pdf.copy()
    out["width"] = pd.Series(widths, dtype="int64", index=pdf.index)
    out["height"] = pd.Series(heights, dtype="int64", index=pdf.index)
    out["n_frames"] = pd.Series(frames, dtype="int64", index=pdf.index)
    return out


def available_decoders() -> dict:
    """codec -> per-batch decode function, resolved by SOFT IMPORT at call
    time (inside the Python worker): ``fake`` (deterministic byte-stat —
    the CI/oracle path) and ``wav`` (stdlib wave, a real decoder with no
    external dependency) are always present; ``png``/``jpeg`` appear when
    PIL is importable in the worker environment. Codecs with no available
    decoder keep the loud NotImplementedError — never a silent fake."""
    decoders: dict = {"fake": _decode_fake, "wav": _decode_wav}
    try:
        import importlib.util

        if importlib.util.find_spec("PIL") is not None:
            decoders["png"] = _decode_image_pil
            decoders["jpeg"] = _decode_image_pil
    except (ImportError, ValueError):  # pragma: no cover - env dependent
        pass
    return decoders


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payloads to typed dimensions, dispatching per codec through
    ``available_decoders``: the deterministic ``fake`` codec (oracle path)
    and real WAV decode ship built in; PIL-backed png/jpeg activates by
    soft import when the library exists in the workers; anything else
    raises NotImplementedError with the exact missing codecs — the Spark
    plumbing (Arrow batches, schema, partitioning) is identical for every
    codec."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders = available_decoders()  # resolved inside the worker
        for pdf in batches:
            unknown = set(pdf["codec"].unique()) - set(decoders)
            if unknown:
                raise NotImplementedError(
                    f"no decoder available for codecs {sorted(unknown)} "
                    "(install PIL for png/jpeg; 'fake' and 'wav' are built "
                    "in) — refusing to decode silently"
                )
            if len(pdf["codec"].unique()) == 1:
                yield decoders[pdf["codec"].iloc[0]](pdf)
            else:
                yield pd.concat(
                    [decoders[c](g) for c, g in pdf.groupby("codec", sort=True)]
                )

    return media.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-payload feature vector: L1-normalized 16-bin byte histogram
    (deterministic; a real pipeline swaps in a model forward pass — same
    signature, same Arrow batching)."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=dim)[:dim].astype("float64")
                total = hist.sum()
                vecs.append((hist / total if total else hist).astype("float32"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": vecs,
                }
            )

    return media.mapInPandas(features, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload_resized", T.BinaryType(), False),
        T.StructField("orig_len", T.LongType(), False),
        T.StructField("resized_len", T.LongType(), False),
    ]
)


def resize_media(media: DataFrame, target_len: int = 256) -> DataFrame:
    """Deterministic 'resize' for the fake codec: uniform stride-k byte
    sampling down to at most ``target_len`` bytes (stride = ceil(len /
    target)) — the stand-in for a real image downscale, with the same
    Arrow-batched mapInPandas plumbing a PIL/ffmpeg resize would use. At
    scale the point is that payloads shrink SCAN-SIDE before any shuffle
    or feature pass; a real pipeline chains resize -> extract_features."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, lens = [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                step = max(1, -(-len(arr) // target_len))  # ceil division
                out = arr[::step].tobytes()
                outs.append(out)
                lens.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_resized": outs,
                    "orig_len": pdf["payload_len"].astype("int64"),
                    "resized_len": pd.Series(lens, dtype="int64"),
                }
            )

    return media.mapInPandas(resize, RESIZE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Aggregate payload stats per media_type — pure column expressions
    (the oracle-checkable face of the multimodal path)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("payload_len").alias("total_bytes"),
        F.min("payload_len").alias("min_bytes"),
        F.max("payload_len").alias("max_bytes"),
    )


def sample_frames(decoded: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for video/audio payloads: one row per sampled frame
    index (0, k, 2k, ... < n_frames). Pure JVM explode — the decode of the
    sampled frame itself would be the per-frame Pandas UDF slot. At scale
    this multiplies rows scan-side BEFORE any shuffle, so downstream
    operators see only sampled frames."""
    return decoded.select(
        "doc_id",
        "media_type",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("sum_sq", T.LongType(), False),
        T.StructField("frame_n", T.LongType(), False),
    ]
)


def frame_energy(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame energy over payload bytes, audio-style: the payload is read
    as unsigned 8-bit samples, framed into tumbling ``frame_len`` windows
    (last frame short), and each frame reports its EXACT integer sum of
    squares + length — float math (RMS = sqrt(sum_sq / n)) is deferred to
    the caller so everything this kernel shuffles is order-independent
    int64. One vectorized numpy pass per Arrow batch (np.add.reduceat over
    the squared sample array); the real-codec version would frombuffer a
    decoded PCM array instead — identical plumbing."""

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, mtypes, fidx, ssq, fn = [], [], [], [], []
            for doc_id, mt, b in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                if len(arr) == 0:
                    continue
                sq = arr * arr
                starts = np.arange(0, len(arr), frame_len)
                sums = np.add.reduceat(sq, starts)
                lens = np.diff(np.append(starts, len(arr)))
                k = len(starts)
                doc_ids.extend([doc_id] * k)
                mtypes.extend([mt] * k)
                fidx.extend(range(k))
                ssq.extend(sums.tolist())
                fn.extend(lens.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "media_type": pd.Series(mtypes, dtype="object"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "sum_sq": pd.Series(ssq, dtype="int64"),
                    "frame_n": pd.Series(fn, dtype="int64"),
                }
            )

    return media.mapInPandas(energies, FRAME_ENERGY_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("phash", T.StringType(), False),  # 16 hex chars (64 bits)
    ]
)

_PHASH_ROWS, _PHASH_COLS = 8, 9  # 8x9 grid -> 8 comparisons per row = 64 bits


def phash_media(media: DataFrame) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint over the payload bytes.

    The payload is bucketed into an 8x9 intensity grid (byte j belongs to
    cell ``j * 72 // n`` — the same integer mapping the oracle re-derives
    from hex nibbles in SQL, and deliberately NOT np.add.reduceat, whose
    repeated-index semantics differ from an empty-bucket sum for payloads
    shorter than 72 bytes); each of the 8 rows yields 8 left>right
    comparisons, packed LSB-first into one byte, and the 8 row bytes hex-
    concatenate into a 64-bit hash string (strings sidestep int64 sign
    overflow identically on both engines). Identical payloads share a hash;
    payloads differing by small local edits usually do too — which is what
    makes dHash the standard cheap first tier of image dedup. A real pixel
    dHash replaces the byte grid with a decoded 9x8 grayscale thumbnail;
    the Spark plumbing (Arrow batches, hash-groupBy families) is identical.
    """

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_cells = _PHASH_ROWS * _PHASH_COLS
        for pdf in batches:
            doc_ids, mtypes, out = [], [], []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(arr)
                if n == 0:
                    continue
                seg = (np.arange(n, dtype=np.int64) * n_cells) // n
                sums = np.bincount(seg, weights=arr, minlength=n_cells)
                grid = sums.reshape(_PHASH_ROWS, _PHASH_COLS)
                bits = grid[:, :-1] > grid[:, 1:]  # 8x8 comparisons
                row_bytes = (bits * (1 << np.arange(8))).sum(axis=1).astype(int)
                doc_ids.append(doc_id)
                mtypes.append(mt)
                out.append("".join(f"{b:02x}" for b in row_bytes))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "media_type": pd.Series(mtypes, dtype="object"),
                    "phash": pd.Series(out, dtype="object"),
                }
            )

    return media.mapInPandas(hashes, PHASH_SCHEMA)
