"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas iterators (`mapInPandas`).

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind `decode_payload` (clearly marked; swap in
PIL/torchaudio/ffmpeg in production). Everything around it — the
binary column schema, partitioning, Arrow batch shape, UDF signature,
feature schema — is real and oracle-checked: the feature extraction
(byte length, first byte, md5 digest) is computed by DuckDB from the
same payload bytes.

Scale shape: mapInPandas streams Arrow batches executor-side; payload
bytes never hit the driver, and the feature step is embarrassingly
parallel over input partitions (no shuffle at all).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.registry import register, table

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("digest", StringType()),
    ]
)


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate a multimodal table: documents' text bytes as opaque
    payloads with typed metadata (deterministic, so the oracle can derive
    the same payloads from the text column)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("meta_width"),
        (F.col("n_chars") % 1080).cast("int").alias("meta_height"),
    )


def decode_payload(payload: bytes, kind: str):
    """DETERMINISTIC FAKE decode — the real implementation would hand the
    bytes to PIL / torchaudio / ffmpeg, none of which exist in this
    container. The plumbing (Arrow batches, schema, partitioning) is the
    real contract being exercised."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "digest": hashlib.md5(payload).hexdigest(),
    }


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "digest": [f["digest"] for f in feats],
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END                         AS kind,
           octet_length(encode(text))                    AS n_bytes,
           ascii(substr(text, 1, 1))                     AS first_byte,
           md5(text)                                     AS digest
    FROM documents
    ORDER BY doc_id
    """,
    "binary-column feature extraction via Arrow-batched mapInPandas",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(binary_table(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Resize (images/videos): the resample itself is a DETERMINISTIC FAKE
# (crop to the first quarter of the payload — a real build hands the
# bytes to PIL/ffmpeg); the contract under test is the Arrow batch
# plumbing, the halved metadata dims, and the derived output bytes.
# ---------------------------------------------------------------------------
RESIZE_FRACTION = 4  # keep ceil(n/4) bytes

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
        StructField("out_digest", StringType()),
    ]
)


def resize_payload(payload: bytes, width, height):
    """DETERMINISTIC FAKE resize: crop to the first ceil(n/4) bytes and
    halve the metadata dims (stand-in for PIL's Image.resize)."""
    n = len(payload)
    keep = (n + RESIZE_FRACTION - 1) // RESIZE_FRACTION
    out = payload[:keep]
    return out, (width or 0) // 2, (height or 0) // 2


def resize_images(df: DataFrame) -> DataFrame:
    """Arrow-batched resize over image/video payloads (audio passed over)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"].isin(["image", "video"])]
            outs = [
                resize_payload(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["meta_width"], pdf["meta_height"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "out_width": [o[1] for o in outs],
                    "out_height": [o[2] for o in outs],
                    "out_bytes": [len(o[0]) for o in outs],
                    "out_digest": [hashlib.md5(o[0]).hexdigest() for o in outs],
                }
            )

    return df.mapInPandas(_resize, RESIZE_SCHEMA)


@register(
    "multimodal_resize",
    f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS kind,
           (n_chars % 1920) // 2                                  AS out_width,
           (n_chars % 1080) // 2                                  AS out_height,
           (octet_length(encode(text)) + {RESIZE_FRACTION - 1}) // {RESIZE_FRACTION} AS out_bytes,
           md5(substr(text, 1, CAST((octet_length(encode(text)) + {RESIZE_FRACTION - 1}) // {RESIZE_FRACTION} AS INTEGER))) AS out_digest
    FROM documents
    WHERE doc_id % 3 IN (0, 2)
    ORDER BY doc_id
    """,
    "binary-column resize via Arrow-batched mapInPandas (stubbed resampler, real plumbing)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_images(binary_table(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling (videos): emit one row per sampled fixed-size frame at a
# byte stride — the 1:N shape of a real ffmpeg frame extractor, with the
# decode stubbed to a deterministic byte slice.
# ---------------------------------------------------------------------------
FRAME_BYTES = 64
FRAME_STRIDE = 128

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Arrow-batched 1:N frame sampling over video payloads."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            rows = {k: [] for k in ("doc_id", "frame_idx", "frame_offset", "frame_bytes", "frame_digest")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, len(payload), FRAME_STRIDE)):
                    frame = payload[off : off + FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(len(frame))
                    rows["frame_digest"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(_frames, FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    f"""
    WITH vids AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
        SELECT doc_id,
               CAST(i AS INTEGER)                 AS frame_idx,
               CAST(i * {FRAME_STRIDE} AS BIGINT) AS frame_offset,
               CAST(least({FRAME_BYTES}, n - i * {FRAME_STRIDE}) AS BIGINT) AS frame_bytes,
               md5(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INTEGER), {FRAME_BYTES})) AS frame_digest
        FROM vids, LATERAL unnest(range(0, (n + {FRAME_STRIDE - 1}) // {FRAME_STRIDE})) t(i)
    )
    SELECT * FROM frames ORDER BY doc_id, frame_idx
    """,
    "1:N video frame sampling via Arrow-batched mapInPandas (stubbed decoder, real plumbing)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(binary_table(spark, sf_dir)).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# Audio chunking: overlapping fixed-size windows at a hop stride — the
# spectrogram/ASR pre-processing shape (window > hop ⇒ overlap), with
# the sample decode stubbed to deterministic byte windows. Same Arrow
# mapInPandas plumbing as frames: payload bytes stay executor-side, the
# 1:N expansion is embarrassingly parallel, no shuffle.
# ---------------------------------------------------------------------------
CHUNK_BYTES = 96
CHUNK_HOP = 64  # < CHUNK_BYTES: consecutive chunks overlap

CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_offset", LongType()),
        StructField("chunk_bytes", LongType()),
        StructField("chunk_digest", StringType()),
    ]
)


def chunk_audio(df: DataFrame) -> DataFrame:
    """Arrow-batched 1:N overlapping-window chunking over audio payloads."""

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            rows = {k: [] for k in ("doc_id", "chunk_idx", "chunk_offset", "chunk_bytes", "chunk_digest")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, max(len(payload) - CHUNK_BYTES + CHUNK_HOP, 1), CHUNK_HOP)):
                    chunk = payload[off : off + CHUNK_BYTES]
                    if not chunk:
                        break
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(idx)
                    rows["chunk_offset"].append(off)
                    rows["chunk_bytes"].append(len(chunk))
                    rows["chunk_digest"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(_chunks, CHUNK_SCHEMA)


# Oracle convention (applies to features/resize/frame_sample too): the
# synthetic payload is encode(text), and this DuckDB build cannot slice
# BLOBs (no substr(BLOB)/[..] on BLOB), so the oracle slices the VARCHAR
# by character offsets and md5s characters while Spark slices payload
# BYTES. The two agree exactly iff the text is pure ASCII — which the
# testdata generator guarantees (verified: 0 docs with octet_length <>
# length at sf0.001/0.01/0.1). If the generator ever emits multi-byte
# UTF-8, chunk boundaries and digests diverge: switch the oracle to a
# byte-slicing shape then (DuckDB gains substr-on-BLOB) or pre-filter to
# ASCII docs in BOTH engines.
@register(
    "multimodal_chunk_audio",
    f"""
    WITH aud AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n
        FROM documents WHERE doc_id % 3 = 1
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS INTEGER)               AS chunk_idx,
               CAST(i * {CHUNK_HOP} AS BIGINT)  AS chunk_offset,
               CAST(least({CHUNK_BYTES}, n - i * {CHUNK_HOP}) AS BIGINT) AS chunk_bytes,
               md5(substr(text, CAST(i * {CHUNK_HOP} + 1 AS INTEGER), {CHUNK_BYTES})) AS chunk_digest
        FROM aud, LATERAL unnest(range(0, greatest((n - {CHUNK_BYTES} + {CHUNK_HOP}
                                                    + {CHUNK_HOP - 1}) // {CHUNK_HOP}, 1))) t(i)
        WHERE i * {CHUNK_HOP} < n
    )
    SELECT * FROM chunks ORDER BY doc_id, chunk_idx
    """,
    "1:N overlapping audio chunking via Arrow-batched mapInPandas (stubbed decode)",
)
def multimodal_chunk_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_audio(binary_table(spark, sf_dir)).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Exact dedup over OPAQUE binary payloads — the multimodal twin of
# dedup_exact: identical media files (re-uploads, mirrors) collapse on
# their content digest without ever decoding them. Digest + hash-agg
# only: the payload bytes never shuffle (md5 projects them down to 32
# chars before the groupBy), which is what makes this viable when the
# payload column is images/video at 100 TB. Oracle derives the same
# digests from the text column (payload = text bytes; ASCII convention
# documented at multimodal_chunk_audio).
# ---------------------------------------------------------------------------
@register(
    "multimodal_dedup",
    """
    WITH bt AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               md5(text) AS payload_digest
        FROM documents
    )
    SELECT kind, payload_digest,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM bt
    GROUP BY kind, payload_digest
    ORDER BY kind, keeper_id
    """,
    "exact multimodal dedup: per-kind content-digest groupBy, payload bytes never shuffle",
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    bt = binary_table(spark, sf_dir)
    return (
        bt.select("doc_id", "kind", F.md5("payload").alias("payload_digest"))
        .groupBy("kind", "payload_digest")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("kind", "payload_digest", "keeper_id", "n_copies")
        .orderBy("kind", "keeper_id")
    )
