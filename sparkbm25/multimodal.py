"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed through mapInPandas stages.

The decode kernels are STUBBED (the sandbox has no image/audio
libraries — see the NotImplementedError / deterministic-fake switch),
but the Spark-side contract is real and tested: schemas, Arrow batch
shapes, UDF signatures, partition-size control. Swapping a stub for a
Pillow/torchaudio kernel changes ONE function body, nothing in the
plan.

Schema convention (one row per asset):
    asset_id: long, kind: string(image|audio|video),
    payload: binary, meta: struct<width:int, height:int,
    sample_rate:int, n_frames:int, codec:string>
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = ("asset_id bigint, kind string, feature array<float>, "
                  "feat_dim int, n_bytes int")
THUMB_SCHEMA = "asset_id bigint, thumb binary, width int, height int"
FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame binary"

# Flip to True only where real decoders exist; False => deterministic
# fake kernels (hash-derived), keeping the pipeline testable here.
REAL_DECODERS = False


def make_fake_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary asset table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        payload = rng.bytes(int(rng.integers(256, 4096)))
        meta = {
            "width": int(rng.integers(64, 1920)) if kinds[i] != "audio" else 0,
            "height": int(rng.integers(64, 1080)) if kinds[i] != "audio" else 0,
            "sample_rate": 16000 if kinds[i] == "audio" else 0,
            "n_frames": int(rng.integers(1, 300)) if kinds[i] == "video" else 1,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kinds[i]],
        }
        rows.append((i, kinds[i], payload, meta))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: hash-seeded vector."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def extract_features(assets: DataFrame, dim: int = 64, batch_rows: int = 256) -> DataFrame:
    """binary payload -> float feature vector, Arrow-batched.

    The real kernel would run a vision/audio encoder per batch
    (iterator-of-batches pattern: model loaded once per worker —
    SURVEY P8 analog). Stubbed deterministically when REAL_DECODERS is
    False. Memory bound: incoming Arrow batches are re-chunked to
    batch_rows INSIDE the stage — no session-global
    arrow.maxRecordsPerBatch mutation (round-1 leaked that conf change
    into every later job in the session; ADVICE fix)."""

    def feats(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                if REAL_DECODERS:
                    raise NotImplementedError(
                        "plug a real image/audio encoder here (e.g. PIL + model)")
                vecs = [_fake_feature(p, dim) for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "kind": chunk["kind"],
                        "feature": [v.tolist() for v in vecs],
                        "feat_dim": dim,
                        "n_bytes": chunk["payload"].map(len).astype("int32"),
                    }
                )

    return assets.mapInPandas(feats, schema=FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """image payload -> thumbnail payload (stub: truncated content
    hash chain standing in for resized pixels)."""

    def resize(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if len(pdf) == 0:
                continue
            if REAL_DECODERS:
                raise NotImplementedError("plug PIL Image.resize here")
            thumbs = [hashlib.sha256(p).digest() * ((width * height) // 32 + 1)
                      for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "thumb": [t[: width * height] for t in thumbs],
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(resize, schema=THUMB_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """video payload -> sampled frame rows (flatMap shape: one asset
    row fans out to n_frames/every_n frame rows)."""

    def frames(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if len(pdf) == 0:
                continue
            if REAL_DECODERS:
                raise NotImplementedError("plug pyav/ffmpeg frame sampling here")
            out_id, out_idx, out_frame = [], [], []
            for row in pdf.itertuples(index=False):
                n = max(int(row.meta["n_frames"]) // every_n, 1)
                for fi in range(n):
                    out_id.append(row.asset_id)
                    out_idx.append(fi * every_n)
                    out_frame.append(hashlib.sha256(
                        row.payload + fi.to_bytes(4, "little")).digest())
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return assets.mapInPandas(frames, schema=FRAME_SCHEMA)
