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
