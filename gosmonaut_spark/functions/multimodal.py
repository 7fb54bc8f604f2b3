"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata struct.
The Spark-side machinery — schemas, Arrow batch shapes, partition sizing,
UDF signatures — is real and tested; the *codec* step is stubbed behind
``NotImplementedError`` (no image/audio libraries in this container) with a
deterministic fake used by tests (`fake=True`) so the batch plumbing is
exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,duration_ms:int,codec:string>"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def attach_media_meta(df: DataFrame, payload: str = "payload", kind: str = "kind") -> DataFrame:
    """Derive cheap metadata natively (no decode): byte length + a stable
    content key for dedup of identical payloads."""
    return df.withColumn("n_bytes", F.length(F.col(payload)).cast("long")).withColumn(
        "content_key", F.sha2(F.col(payload), 256)
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: sha256-derived floats.
    Replaces image-decode/resize/frame-sample in this container."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_media_features(
    media: DataFrame, fake: bool = False, batch_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas`` (Arrow batches).

    Real pipeline shape: one batch = many payloads, decoded vectorized,
    features emitted as ``array<float>``. The codec call is the only stub.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs are unavailable in this container; "
                    "run with fake=True for the deterministic stand-in"
                )
            feats = [_fake_feature(bytes(p), batch_dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded payload bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), (64, 48, 16000, 1200, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
