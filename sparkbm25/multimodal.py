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

# Real-decoder availability, probed per library (round-2 VERDICT item
# 10): when Pillow exists the image kernels run for real; otherwise
# the deterministic hash-derived fakes keep the pipeline testable.
# Each stage takes mode='fake'|'real'|'auto':
#   fake — deterministic kernels (the SQL-oracle mode; default)
#   real — require the library, raise NotImplementedError if absent
#   auto — real when available, fake otherwise
try:  # pragma: no cover - depends on environment
    from PIL import Image as _PILImage  # noqa: N813

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

# kept for backwards compatibility: True iff any real decoder exists
REAL_DECODERS = HAVE_PIL


def _use_real(mode: str, lib_ok: bool, what: str) -> bool:
    if mode == "fake":
        return False
    if mode == "real":
        if not lib_ok:
            raise NotImplementedError(
                f"real {what} kernel requires a library not installed "
                "in this environment (pip install pillow)")
        return True
    if mode != "auto":
        raise ValueError(f"mode must be fake|real|auto, got {mode!r}")
    return lib_ok


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


def _pil_feature(payload: bytes, dim: int) -> np.ndarray:
    """Real image kernel: decode with Pillow, downsample to a fixed
    grid, emit normalized per-cell channel means — a deterministic
    visual fingerprint (the slot a learned encoder plugs into)."""
    import io

    side = max(int(np.sqrt(dim // 3)) or 1, 1)
    img = _PILImage.open(io.BytesIO(payload)).convert("RGB").resize((side, side))
    arr = np.asarray(img, dtype=np.float32) / 255.0        # (side, side, 3)
    vec = arr.reshape(-1)
    if vec.size < dim:
        vec = np.pad(vec, (0, dim - vec.size))
    return vec[:dim].astype(np.float32)


def extract_features(assets: DataFrame, dim: int = 64, batch_rows: int = 256,
                     mode: str = "fake") -> DataFrame:
    """binary payload -> float feature vector, Arrow-batched.

    The real kernel runs per batch (iterator-of-batches pattern: any
    model state loads once per worker — SURVEY P8 analog); with
    mode='real'/'auto' + Pillow installed, image payloads decode for
    real (non-image kinds keep the fake). Memory bound: incoming Arrow
    batches are re-chunked to batch_rows INSIDE the stage — no
    session-global arrow.maxRecordsPerBatch mutation (round-1 leaked
    that conf change into every later job in the session; ADVICE
    fix)."""
    use_real = _use_real(mode, HAVE_PIL, "image feature")

    def feats(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                vecs = [
                    _pil_feature(p, dim)
                    if use_real and k == "image"
                    else _fake_feature(p, dim)
                    for p, k in zip(chunk["payload"], chunk["kind"])
                ]
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


def resize_images(assets: DataFrame, width: int = 64, height: int = 64,
                  mode: str = "fake") -> DataFrame:
    """image payload -> thumbnail payload. mode='real'/'auto' with
    Pillow: a true decode + resize + PNG re-encode; fake: truncated
    content-hash chain standing in for resized pixels."""
    use_real = _use_real(mode, HAVE_PIL, "image resize")

    def resize(batches):
        import io

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if len(pdf) == 0:
                continue
            if use_real:
                thumbs = []
                for p in pdf["payload"]:
                    img = _PILImage.open(io.BytesIO(p)).convert("RGB")
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format="PNG")
                    thumbs.append(buf.getvalue())
            else:
                thumbs = [
                    (hashlib.sha256(p).digest()
                     * ((width * height) // 32 + 1))[: width * height]
                    for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "thumb": thumbs,
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(resize, schema=THUMB_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 30,
                  mode: str = "fake") -> DataFrame:
    """video payload -> sampled frame rows (flatMap shape: one asset
    row fans out to n_frames/every_n frame rows). No video-decode
    library ships in any supported environment yet, so mode='real'
    always raises (the pyav/ffmpeg slot); fake emits hash-derived
    frames with the real fan-out shape."""
    _use_real(mode, False, "video frame sampling")

    def frames(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if len(pdf) == 0:
                continue
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
