"""Multimodal plumbing tests: schema, batch shape, determinism, fan-out.
(Decode kernels are stubbed — see operators/multimodal.py docstring.)"""

from __future__ import annotations

import pytest

from stackai_vector_db_spark.operators.multimodal import (
    _decode_image_real,
    extract_image_features,
    make_fake_media,
    sample_frames,
)


def test_image_features_schema_and_determinism(spark):
    media = make_fake_media(spark, n=30)
    feats = extract_image_features(media, feature_dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,mean_luma:double,"
        "feature:array<float>>"
    )
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in extract_image_features(media, 8).collect()}
    assert all(rows[k]["mean_luma"] == rows2[k]["mean_luma"] for k in rows)
    assert all(len(r["feature"]) == 8 for r in rows.values())
    assert all(0.0 <= r["mean_luma"] <= 1.0 for r in rows.values())


def test_frame_sampling_fanout(spark):
    media = make_fake_media(spark, n=30)
    frames = sample_frames(media, every_ms=500)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    metas = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter("kind = 'video'").select("media_id", "meta").collect()
    }
    assert set(per_media) == set(metas)
    for mid, dur in metas.items():
        assert per_media[mid] == len(range(0, dur, 500))


def test_resize_images_shapes(spark):
    from stackai_vector_db_spark.operators.multimodal import make_fake_media, resize_images

    media = make_fake_media(spark, n=12)
    out = resize_images(media, width=16, height=16).collect()
    assert len(out) == 4  # every 3rd is an image
    assert all(r.width == 16 and r.height == 16 for r in out)
    assert all(0 < len(bytes(r.payload)) <= 16 * 16 // 64 for r in out)
    # determinism
    again = resize_images(make_fake_media(spark, n=12), width=16, height=16).collect()
    assert sorted(bytes(r.payload) for r in out) == sorted(
        bytes(r.payload) for r in again
    )


def test_audio_features_shapes(spark):
    from stackai_vector_db_spark.operators.multimodal import (
        extract_audio_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=12)
    out = extract_audio_features(media, feature_dim=6).collect()
    assert len(out) == 4  # every 3rd+1 is audio
    assert all(len(r.feature) == 6 for r in out)
    assert all(0.0 <= r.rms <= 1.0 for r in out)
    assert all(r.duration_ms >= 1000 for r in out)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\xff\xd8")
