"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas iterator
contracts, partition sizing — is real and tested. The actual codec calls are
STUBBED (this container ships no image/audio libraries): ``_decode_payload``
is a clearly-marked deterministic fake keyed on the payload bytes, and
``decode_media(..., real_codecs=True)`` raises NotImplementedError where a
PIL/ffmpeg call would go. Swapping the stub for a real codec changes ONE
function; nothing in the distributed plan moves.

Design notes for 100 TB of media:
- payloads stay binary end-to-end (no base64 round-trips);
- decode/feature UDFs are mapInPandas (iterator form) so one task processes
  many Arrow batches without re-initializing codec state;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory —
  media rows are wide, so callers should size it down (documented in
  session.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 64


def _decode_payload(payload: bytes, kind: str) -> dict:
    """DETERMINISTIC FAKE decode — stands in for PIL.Image.open /
    soundfile.read / ffmpeg. Derives stable pseudo-dimensions from a
    content digest so tests are reproducible. Replace this function with
    real codec calls when the libraries exist."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    a, b = int.from_bytes(digest[:4], "little"), int.from_bytes(digest[4:], "little")
    if kind == "image":
        return {"width": 64 + a % 1920, "height": 64 + b % 1080,
                "sample_rate": None, "n_frames": 1}
    if kind == "audio":
        return {"width": None, "height": None,
                "sample_rate": [8000, 16000, 44100][a % 3],
                "n_frames": 1 + b % 480_000}
    if kind == "video":
        return {"width": 128 + a % 1792, "height": 128 + b % 952,
                "sample_rate": None, "n_frames": 1 + b % 7200}
    raise ValueError(f"unknown media kind {kind!r}")


_DECODED_FIELDS = ("width int, height int, sample_rate int, n_frames int")


def decode_media(df: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Decode payloads to typed metadata columns. ``real_codecs=True`` marks
    where actual decoding belongs — not available in this container."""
    if real_codecs:
        raise NotImplementedError(
            "real image/audio codecs are not installed in this environment; "
            "wire PIL/soundfile/ffmpeg into _decode_payload")

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields
                           if f.name != "meta") + ", " + _DECODED_FIELDS

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(p), k)
                       for p, k in zip(pdf["payload"], pdf["kind"])]
            dec = pd.DataFrame(decoded)
            yield pd.concat([pdf.drop(columns=["meta"], errors="ignore")
                             .reset_index(drop=True), dec], axis=1)

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → float32 feature vector (array<float>). The fake extractor
    hashes payload windows into a fixed-dim signature — deterministic, and
    exactly the batch/shape contract a real CNN/CLAP embedder would use."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                raw = np.frombuffer(
                    hashlib.shake_256(bytes(p)).digest(dim * 4),
                    dtype=np.uint32)
                v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "feature": vecs})

    return df.mapInPandas(feats, schema="media_id long, feature array<float>")


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata transform (aspect-preserving clamp to max_side).
    Real pixel resampling is part of the stubbed codec; the metadata math
    and plan shape are the real contract."""
    scale = F.least(F.lit(1.0),
                    F.lit(max_side) / F.greatest("width", "height"))
    return (df.filter(F.col("kind") == "image")
            .withColumn("out_width", F.ceil(F.col("width") * scale).cast("int"))
            .withColumn("out_height", F.ceil(F.col("height") * scale).cast("int")))


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video → one row per sampled frame index (posexplode of the frame
    grid). Frame pixel extraction is codec work; the row fan-out, frame
    indexing, and partition shape are real."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                        F.lit(every_n))
    return (df.filter(F.col("kind") == "video")
            .select("media_id", "n_frames",
                    F.posexplode(frames).alias("sample_idx", "frame_idx")))


def synth_media(n: int, seed: int = 99) -> pd.DataFrame:
    """Deterministic fake media table for tests/bench."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"], dtype=object),
                       size=n, p=[0.6, 0.25, 0.15])
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(64, 4096, size=n)]
    return pd.DataFrame({
        "media_id": np.arange(n, dtype=np.int64),
        "kind": kinds,
        "payload": payloads,
        "meta": [None] * n,
    })


def perceptual_hash(df: DataFrame, pixel_col: str | None = None,
                    grid: int = 8) -> DataFrame:
    """media_id + 64-bit average-hash (aHash). The hash MATH is real —
    downsample grid, threshold at the mean, pack bits — and runs on
    whichever pixel source exists: ``pixel_col`` (array<float> of
    grid*grid luma values, the contract a real decoder fills) or, absent
    that, a DETERMINISTIC FAKE grid derived from the payload digest
    (stands in for decode; replace with real pixels when codecs exist).

    Near-identical pixel grids → near-identical hashes (Hamming), which
    is what phash_near_duplicates exploits. One Arrow pass, no shuffle.
    """
    n = grid * grid
    if n > 64:
        raise ValueError("grid*grid must fit in 64 bits")

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            if pixel_col is not None:
                src = pdf[pixel_col]
                grids = [np.asarray(v, dtype=np.float64) for v in src]
            else:
                grids = [np.frombuffer(
                    hashlib.shake_256(bytes(p)).digest(n), dtype=np.uint8)
                    .astype(np.float64) for p in pdf["payload"]]
            for g in grids:
                bits = (g > g.mean()).astype(np.uint64)
                h = np.uint64(0)
                for b in bits:
                    h = (h << np.uint64(1)) | b
                out.append(np.int64(h.astype(np.int64)))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "phash": out})

    return df.mapInPandas(ahash, schema="media_id long, phash long")


def phash_near_duplicates(hashes: DataFrame,
                          max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance:
    (id_a, id_b, hamming <= max_hamming). Pigeonhole banding, the same
    guarantee as the SimHash text path: split the 64 bits into
    ``max_hamming + 1`` bands — a pair differing in <= max_hamming bits
    cannot touch every band, so it MUST agree exactly on at least one
    (recall 1.0 by construction). Candidates come from an equi-join on
    (band, band_value), verified with JVM bit_count(xor). Never an
    all-pairs join.
    """
    if not (0 <= max_hamming <= 31):
        raise ValueError("max_hamming must be in [0, 31] for 64-bit bands")
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def band(i):
        e = F.shiftrightunsigned(F.col("phash"), width * i)
        if width < 64:  # a full-width mask won't fit a signed int64 literal
            e = e.bitwiseAND(F.lit((1 << width) - 1))
        return e

    banded = hashes.select(
        "media_id", "phash",
        F.posexplode(F.array(*[band(i) for i in range(n_bands)]))
        .alias("band", "band_val"))
    a = banded.select(F.col("media_id").alias("id_a"),
                      F.col("phash").alias("h_a"), "band", "band_val")
    b = banded.select(F.col("media_id").alias("id_b"),
                      F.col("phash").alias("h_b"), "band", "band_val")
    return (a.join(b, ["band", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming",
                        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .dropDuplicates(["id_a", "id_b"]))
