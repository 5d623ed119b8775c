"""Multimodal plumbing: schemas, batch shapes, deterministic fake kernels,
and the honest strict-stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30, seed=7)


def test_feature_extraction_shape_and_determinism(spark, media):
    feats = extract_features(media, dim=64)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 64 for r in rows)
    # unit-norm features
    for r in rows[:5]:
        assert sum(x * x for x in r["feature"]) == pytest.approx(1.0, abs=1e-3)
    rows2 = extract_features(media, dim=64).collect()
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]


def test_strict_stub_raises(spark, media):
    import py4j.protocol

    with pytest.raises(Exception) as exc:
        extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(exc.value)


def test_frame_sampling(spark, media):
    frames = sample_frames(media, n_frames=4)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(pdf) == n_videos * 4
    assert set(pdf["frame_idx"]) == {0, 1, 2, 3}
    assert (pdf["frame_payload"].map(len) > 0).all()


def test_resize_metadata(spark, media):
    resized = resize_images(media, max_side=128).collect()
    for r in resized:
        assert max(r["new_width"], r["new_height"]) <= 128
        assert r["new_width"] >= 1 and r["new_height"] >= 1
        assert 0 < r["scale"] <= 1.0


def test_frames_partition_payload_exactly(spark, media):
    """Frames must PARTITION the payload: no trailing bytes dropped."""
    frames = sample_frames(media, n_frames=4).toPandas()
    sizes = frames.groupby("media_id")["frame_payload"].apply(
        lambda s: sum(len(b) for b in s))
    payloads = {r["media_id"]: len(r["payload"])
                for r in media.filter(F.col("kind") == "video").collect()}
    for mid, total in sizes.items():
        assert total == payloads[mid]


def test_resize_rounds_not_truncates(spark):
    """322px at max_side=256 must come out 256 (truncation gave 255)."""
    import pyspark.sql.types as T
    df = spark.createDataFrame(
        [(1, "image", b"x", 322, 128, None, "png"),
         (2, "image", b"x", 257, 128, None, "png")],
        spark.read.schema if False else __import__(
            "nostr_data_pipeline_spark.operators.multimodal",
            fromlist=["MEDIA_SCHEMA"]).MEDIA_SCHEMA)
    out = {r["media_id"]: (r["new_width"], r["new_height"])
           for r in resize_images(df, max_side=256).collect()}
    assert out[1] == (256, 102)   # round(128*256/322) = 102
    assert out[2] == (256, 128)   # round(128*256/257) = 128 (was 127)
