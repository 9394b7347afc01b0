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


def _make_png(arr):
    """Minimal PNG encoder (filter 0 rows) for test fixtures."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(typ, body):
        c = typ + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_stdlib_png_decode_roundtrip(spark):
    import numpy as np

    from eland_spark.operators.multimodal import _decode_png, decode_image_features

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(12, 9, 3), dtype="uint8")
    png = _make_png(img)
    assert (_decode_png(png) == img).all()

    # through the Spark plumbing: real PNG mime decodes, features real
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1]})
    sdf = spark.createDataFrame(pdf).withColumn(
        "media",
        F.struct(
            F.lit(bytearray(png)).alias("data"),
            F.lit("image/png").alias("mime"),
            F.lit(9).cast("int").alias("width"),
            F.lit(12).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ),
    )
    row = decode_image_features(sdf).collect()[0]
    feats = np.array(row["img_features"])
    assert np.allclose(feats[:3], img.mean(axis=(0, 1)), atol=1e-3)
    assert np.allclose(feats[3:], img.std(axis=(0, 1)), atol=1e-3)


def test_png_filtered_rows_and_modes():
    import io
    import struct
    import zlib

    import numpy as np

    from eland_spark.operators.multimodal import _decode_png

    # exercise Sub/Up/Average/Paeth by re-encoding with varied filters
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype="uint8")
    stride = 5 * 3

    def filt(y, f0):
        line = img[y].reshape(-1).astype(np.int32)
        prev = img[y - 1].reshape(-1).astype(np.int32) if y else np.zeros(stride, np.int32)
        out = np.zeros(stride, np.int32)
        for x in range(stride):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            pred = {1: a, 2: b, 3: (a + b) // 2}.get(f0)
            if f0 == 4:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (line[x] - (pred or 0)) & 0xFF
        return bytes([f0]) + bytes(out.astype(np.uint8))

    raw = b"".join(filt(y, [0, 1, 2, 3, 4, 2][y]) for y in range(6))

    def chunk(typ, body):
        c = typ + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (_decode_png(png) == img).all()


def test_stdlib_wav_decode(spark):
    import io
    import wave

    import numpy as np

    from eland_spark.operators.multimodal import _decode_wav, extract_audio_features

    t = np.arange(2000)
    wave16 = (np.sin(t / 10.0) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(wave16.tobytes())
    data = buf.getvalue()
    pcm = _decode_wav(data)
    assert np.allclose(pcm, wave16.astype(np.float32) / 32768.0)

    import pandas as pd

    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1]})).withColumn(
        "media",
        F.struct(
            F.lit(bytearray(data)).alias("data"),
            F.lit("audio/wav").alias("mime"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ),
    )
    row = extract_audio_features(sdf).collect()[0]
    rms, zcr, peak = row["audio_features"]
    exp = wave16.astype(np.float64) / 32768.0
    assert abs(rms - np.sqrt(np.mean(exp**2))) < 1e-3
    assert abs(peak - np.abs(exp).max()) < 1e-3


def test_resize_then_decode_composes(spark):
    import numpy as np
    import pandas as pd

    from eland_spark.operators.multimodal import (
        decode_image_features, resize_images,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(10, 8, 3), dtype="uint8")
    png = _make_png(img)
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1]})).withColumn(
        "media",
        F.struct(
            F.lit(bytearray(png)).alias("data"),
            F.lit("image/png").alias("mime"),
            F.lit(8).cast("int").alias("width"),
            F.lit(10).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ),
    )
    small = resize_images(sdf, 4, 5)
    row = small.collect()[0]["media"]
    assert row["mime"] == "image/raw-rgb8"
    assert (row["width"], row["height"]) == (4, 5)
    # decode composes on the resized raw struct
    feats = np.array(decode_image_features(small).collect()[0]["img_features"])
    ys = (np.arange(5) * 10 // 5).astype(int)
    xs = (np.arange(4) * 8 // 4).astype(int)
    exp = img[np.ix_(ys, xs)]
    assert np.allclose(feats[:3], exp.mean(axis=(0, 1)), atol=1e-3)
