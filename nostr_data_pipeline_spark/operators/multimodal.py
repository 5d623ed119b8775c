"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries ship in this container): each stub either
raises ``NotImplementedError`` (``strict=True``) or produces a deterministic
fake derived from the payload bytes (``strict=False``, default — keeps the
Spark-side plumbing, schemas, partitioning, and batch shapes fully real and
testable).

Swap-in point for production: replace the inlined `fake_feature` kernel with
PIL/ffmpeg calls inside the same mapInPandas generator; nothing else changes.
(The kernel is inlined INSIDE the generator on purpose — cloudpickle ships it
by value so executors never need this module importable; keep any edits
there, it is the single copy.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (i, kind, payload,
             int(rng.integers(16, 512)) if kind == "image" else None,
             int(rng.integers(16, 512)) if kind == "image" else None,
             int(rng.integers(1000, 60000)) if kind != "image" else None,
             {"image": "png", "audio": "wav", "video": "mp4"}[kind])
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). ``strict``
    raises NotImplementedError at the decode point (the honest stub).

    The generator must be SELF-CONTAINED (no references to this module's
    globals): cloudpickle serializes module-level functions by reference, so
    a worker whose PYTHONPATH lacks this package would fail to unpickle.
    Inlining keeps the job runnable from any driver cwd / without --py-files.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import hashlib as _hl

        import numpy as _np
        import pandas as pd

        def fake_feature(payload: bytes, d: int) -> _np.ndarray:
            h = _hl.sha256(payload).digest()
            seed = int.from_bytes(h[:8], "big")
            hist = _np.bincount(_np.frombuffer(payload, dtype=_np.uint8), minlength=256)
            base = hist[:d] if d <= 256 else _np.pad(hist, (0, d - 256))
            mix = _np.random.default_rng(seed).standard_normal(d) * 0.01
            v = base.astype(_np.float64) / max(len(payload), 1) + mix
            return (v / max(_np.linalg.norm(v), 1e-12)).astype(_np.float32)

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this container"
                )
            feats = [fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sample video payloads: split each payload into n_frames equal
    chunks (stub for real keyframe extraction); one output row per frame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            out_ids, out_idx, out_payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    # the LAST frame takes the remainder so the frames
                    # PARTITION the payload (floor-div alone drops up to
                    # n_frames-1 trailing bytes); empty frames (payload
                    # shorter than n_frames) are skipped, not emitted
                    hi = len(payload) if i == n_frames - 1 else (i + 1) * step
                    chunk = bytes(payload[i * step:hi])
                    if not chunk:
                        continue
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_payloads.append(chunk)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_payload": out_payloads}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(gen, FRAME_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata transform (aspect-preserving); the pixel resize itself
    is the stubbed decode step — metadata math is real and tested."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.filter(F.col("kind") == "image").select(
        "media_id", "payload",
        # round, not truncate: cast('int') floors, so a 322-wide image at
        # max_side=256 came out 255 and short sides were off by one
        F.round(F.col("width") * scale).cast("int").alias("new_width"),
        F.round(F.col("height") * scale).cast("int").alias("new_height"),
        F.round(scale, 6).alias("scale"),
    )
