"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
mapInPandas signatures, partition behavior. The actual media codecs are
NOT (no PIL/ffmpeg/torchaudio in this container): `decode` raises
NotImplementedError unless the deterministic fake decoder is requested,
which derives pseudo-pixels/samples from sha256(payload) so every
downstream stage (resize, frame-sample, feature-extract) runs with real
data flow and stable golden values.

Table shape:
    media(media_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, sample_rate INT,
                      duration_ms INT, codec STRING>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "duration_ms:int, codec:string>")

FEATURE_DIM = 32


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fixture: payload = seeded bytes, metadata typed."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 5)
        rows.append((
            i, kind, bytearray(payload),
            {"width": 16 + (i % 8) * 16 if kind != "audio" else None,
             "height": 16 + (i % 4) * 16 if kind != "audio" else None,
             "sample_rate": 16000 if kind == "audio" else None,
             "duration_ms": 1000 + i * 10 if kind != "image" else None,
             "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind]},
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _meta_int(meta, key: str, default: int) -> int:
    """Arrow structs surface missing int fields as NaN (truthy!) — coerce."""
    v = meta.get(key) if isinstance(meta, dict) else None
    if v is None or (isinstance(v, float) and v != v):
        return default
    return int(v)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-decode: sha256 stream → uint8 HxWx3."""
    need = w * h * 3
    out = bytearray()
    seed = hashlib.sha256(payload).digest()
    while len(out) < need:
        seed = hashlib.sha256(seed).digest()
        out.extend(seed)
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w, 3)


def decode_and_featurize(df: DataFrame, fake: bool = False,
                         target: int = 8) -> DataFrame:
    """media → (media_id, kind, feature array<float>, n_bytes int).

    mapInPandas so one Arrow batch holds many payloads (binary columns
    transfer zero-copy); the decode step is the stub boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"],
                                           pdf["meta"]):
                if not fake:
                    raise NotImplementedError(
                        "real media decode needs PIL/ffmpeg — not in this "
                        "container; pass fake=True for the deterministic stub")
                w = _meta_int(meta, "width", 16)
                h = _meta_int(meta, "height", 16)
                if kind == "audio":
                    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                    sig = raw[: 4096].astype(np.float32) / 255.0
                else:
                    px = _fake_pixels(bytes(payload), w, h)
                    # "resize": mean-pool to target x target, channel-avg
                    ph, pw = px.shape[0] // target or 1, px.shape[1] // target or 1
                    pooled = px[: ph * target, : pw * target].reshape(
                        target, ph, target, pw, 3).mean(axis=(1, 3, 4))
                    sig = pooled.ravel().astype(np.float32)
                # feature: first FEATURE_DIM bins of a fixed-size fold
                pad = np.zeros(FEATURE_DIM, dtype=np.float32)
                chunks = sig[: (sig.size // FEATURE_DIM) * FEATURE_DIM]
                if chunks.size:
                    pad = chunks.reshape(-1, FEATURE_DIM).mean(axis=0)
                feats.append(pad.tolist())
                nbytes.append(len(payload))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "feature": feats, "n_bytes": nbytes})

    return df.mapInPandas(
        run, schema="media_id long, kind string, feature array<float>, n_bytes int")


def frame_sample(df: DataFrame, every_ms: int = 250, fake: bool = False) -> DataFrame:
    """video rows → one row per sampled frame timestamp:
    (media_id, ts_ms int, frame_feature array<float>)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, ts, ff = [], [], []
            for media_id, kind, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind != "video":
                    continue
                if not fake:
                    raise NotImplementedError("real frame decode needs ffmpeg")
                dur = _meta_int(meta, "duration_ms", 0)
                for t in range(0, int(dur), every_ms):
                    px = _fake_pixels(bytes(payload) + t.to_bytes(4, "little"),
                                      8, 8)
                    mid.append(media_id)
                    ts.append(t)
                    ff.append((px.mean(axis=2).ravel() / 255.0)
                              .astype(np.float32).tolist())
            # explicit dtypes: an all-skipped batch would otherwise default
            # to float64 columns, which Arrow can't cast to list<float>
            yield pd.DataFrame({
                "media_id": pd.Series(mid, dtype="int64"),
                "ts_ms": pd.Series(ts, dtype="int32"),
                "frame_feature": pd.Series(ff, dtype="object")})

    return df.mapInPandas(
        run, schema="media_id long, ts_ms int, frame_feature array<float>")
