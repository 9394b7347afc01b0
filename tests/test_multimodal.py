"""Multimodal column plumbing: schema/batch contracts are real, decode
kernels stubbed (north-star extension; no reference analog)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    from eland_spark.operators.multimodal import attach_fake_media

    base = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    return attach_fake_media(base, "doc_id")


def _as_audio(df):
    # rewrite the media struct's mime to audio/fake (field-level surgery
    # keeps the rest of the struct intact)
    m = F.col("media")
    return df.withColumn(
        "media",
        F.struct(
            m["data"].alias("data"),
            F.lit("audio/fake").alias("mime"),
            m["width"].alias("width"),
            m["height"].alias("height"),
            m["n_frames"].alias("n_frames"),
        ),
    )


def test_resize_updates_shape_and_bytes(media_df):
    from eland_spark.operators.multimodal import resize_images

    out = resize_images(media_df, 8, 6).select("doc_id", "media").collect()
    assert len(out) == 40
    for r in out:
        assert r["media"]["width"] == 8
        assert r["media"]["height"] == 6
        assert len(r["media"]["data"]) == 8 * 6 * 3
    # schema unchanged -> stages compose
    twice = resize_images(resize_images(media_df, 16, 16), 4, 4)
    r0 = twice.orderBy("doc_id").first()
    assert r0["media"]["width"] == 4 and len(r0["media"]["data"]) == 4 * 4 * 3


def test_resize_deterministic(media_df):
    from eland_spark.operators.multimodal import resize_images

    a = {r["doc_id"]: bytes(r["media"]["data"]) for r in resize_images(media_df, 8, 8).collect()}
    b = {r["doc_id"]: bytes(r["media"]["data"]) for r in resize_images(media_df, 8, 8).collect()}
    assert a == b


def test_resize_null_media_passthrough(spark):
    from eland_spark.operators.multimodal import MEDIA_SCHEMA, resize_images
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", MEDIA_SCHEMA)]
    )
    df = spark.createDataFrame([(1, None)], schema)
    out = resize_images(df, 8, 8).collect()
    assert out[0]["media"] is None


def test_audio_features_shape_and_range(media_df):
    from eland_spark.operators.multimodal import extract_audio_features

    rows = extract_audio_features(_as_audio(media_df)).collect()
    assert len(rows) == 40
    for r in rows:
        rms, zcr, peak = r["audio_features"]
        assert 0.0 < rms < 1.0
        assert 0.0 <= zcr <= 1.0
        assert rms <= peak <= 1.0


def test_audio_features_non_audio_mime_yields_null(media_df):
    from eland_spark.operators.multimodal import extract_audio_features

    rows = extract_audio_features(media_df).collect()  # image/fake mime
    assert all(r["audio_features"] is None for r in rows)
