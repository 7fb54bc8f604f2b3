"""Multimodal columns: opaque binary payloads + typed metadata + features.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract runs as Arrow-batched ``mapInPandas``
(one batch = many payloads, no per-row Python UDF calls).

All three kinds are REAL: payloads are genuine PNG / WAV / Y4M bytes and
feature extraction decodes them with the pure-Python codecs in
:mod:`gosmonaut_spark.functions.codecs` (PNG chunk walk + inflate +
unfilter; RIFF PCM16 parse; YUV4MPEG2 header + planar frame walk).
Unknown kinds raise ``NotImplementedError``; ``fake=True`` substitutes
the deterministic sha-derived feature for any kind (codec-free plumbing
runs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,duration_ms:int,codec:string>"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FEATURE_DIM = 8


def attach_media_meta(df: DataFrame, payload: str = "payload", kind: str = "kind") -> DataFrame:
    """Derive cheap metadata natively (no decode): byte length + a stable
    content key for dedup of identical payloads."""
    return df.withColumn("n_bytes", F.length(F.col(payload)).cast("long")).withColumn(
        "content_key", F.sha2(F.col(payload), 256)
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic codec-free stand-in: sha256-derived floats."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def image_feature(payload: bytes) -> list[float]:
    """Real PNG decode -> [w, h, channels, mean(ch0..2 padded), std, bit_depth]."""
    from .codecs import png_decode, png_parse_header

    hdr = png_parse_header(payload)
    px = png_decode(payload).astype(np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    means = [float(px[:, :, c].mean()) for c in range(px.shape[2])]
    means += [0.0] * (3 - len(means[:3]))
    return [
        float(hdr["width"]),
        float(hdr["height"]),
        float(hdr["channels"]),
        means[0],
        means[1],
        means[2],
        float(px.std()),
        float(hdr["bit_depth"]),
    ]


def audio_feature(payload: bytes) -> list[float]:
    """Real WAV parse -> [rate, channels, frames, duration_s, rms, zcr, peak, mean]."""
    from .codecs import wav_parse

    w = wav_parse(payload)
    s = w["samples"].astype(np.float64) / 32768.0
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if s.size > 1 else 0.0
    return [
        float(w["sample_rate"]),
        float(w["channels"]),
        float(w["n_frames"]),
        w["n_frames"] / w["sample_rate"] if w["sample_rate"] else 0.0,
        float(np.sqrt(np.mean(s**2))) if s.size else 0.0,
        zcr,
        float(np.abs(s).max()) if s.size else 0.0,
        float(s.mean()) if s.size else 0.0,
    ]


def video_feature(payload: bytes) -> list[float]:
    """Real Y4M parse -> [w, h, n_frames, fps, duration_s, mean luma,
    std luma, mean |frame-to-frame luma delta| (motion proxy)]."""
    from .codecs import y4m_parse

    v = y4m_parse(payload)
    y = v["y_planes"].astype(np.float64)
    motion = (
        float(np.abs(np.diff(y, axis=0)).mean()) if v["n_frames"] > 1 else 0.0
    )
    return [
        float(v["width"]),
        float(v["height"]),
        float(v["n_frames"]),
        float(v["fps"]),
        v["n_frames"] / v["fps"] if v["fps"] else 0.0,
        float(y.mean()) if y.size else 0.0,
        float(y.std()) if y.size else 0.0,
        motion,
    ]


def extract_media_features(
    media: DataFrame, fake: bool = False, batch_dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas`` (Arrow batches).

    ``fake=False`` (default): REAL decode per kind — PNG for ``image``,
    WAV for ``audio``, Y4M for ``video``; any other kind raises
    ``NotImplementedError``. ``fake=True``: the deterministic sha-derived
    stand-in for every kind (codec-free plumbing runs)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                b = bytes(p)
                if fake:
                    feats.append(_fake_feature(b, batch_dim))
                elif kind == "image":
                    feats.append(image_feature(b))
                elif kind == "audio":
                    feats.append(audio_feature(b))
                elif kind == "video":
                    feats.append(video_feature(b))
                else:
                    raise NotImplementedError(
                        f"no pure-Python codec for kind={kind!r}; "
                        "run with fake=True for the deterministic stand-in"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64, real: bool = True) -> DataFrame:
    """Deterministic media table. ``real=True``: image rows carry genuine
    PNGs (gradient pixels, alternating None/Up filters), audio rows carry
    genuine PCM16 WAVs (seeded sine), video rows carry genuine Y4M
    streams (seeded mono luma ramps, 2-5 frames). ``real=False`` keeps
    every payload opaque."""
    from .codecs import png_encode, wav_encode, y4m_encode

    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if real and kind == "image":
            h, w = 6 + i % 5, 8 + i % 3
            arr = ((np.arange(h * w * 3, dtype=np.int64) * (i + 7)) % 251).astype(
                np.uint8
            ).reshape(h, w, 3)
            payload = png_encode(arr, filter_type=0 if i % 2 == 0 else 2)
            meta = (w, h, 0, 0, "png")
        elif real and kind == "audio":
            sr = 8000
            t = np.arange(160 + i % 40)
            s = (np.sin(2 * np.pi * (220 + i) * t / sr) * 3000).astype(np.int16)
            payload = wav_encode(s, sr)
            meta = (0, 0, sr, int(round(len(t) * 1000 / sr)), "pcm16")
        elif real and kind == "video":
            nf, h, w = 2 + i % 4, 4 + i % 3, 6 + i % 2
            frames = (
                (np.arange(nf * h * w, dtype=np.int64) * (i + 13)) % 253
            ).astype(np.uint8).reshape(nf, h, w)
            payload = y4m_encode(frames, fps_num=24 + i % 2, fps_den=1)
            meta = (w, h, 0, int(round(nf * 1000 / (24 + i % 2))), "y4m")
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
            meta = (64, 48, 16000, 1200, "fake")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
