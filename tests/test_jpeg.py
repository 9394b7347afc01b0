"""Baseline JPEG codec tests (operators/jpeg.py).

No external fixtures or libraries: the module's own minimal encoder
(spec Annex K tables) produces the streams, so the decoder is
round-trip-checked across subsampling layouts, restart intervals,
grayscale, and the non-multiple-of-8 padding path. Error bounds follow
from the Annex K quantization tables (quality ~50): smooth content
reconstructs within ~10 levels.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from eland_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(yy * 5 + 30, 0, 255),
            np.clip(xx * 4 + 40, 0, 255),
            np.clip(yy * 2 + xx * 2 + 50, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


def test_solid_color_near_exact():
    img = np.full((16, 24, 3), (200, 40, 90), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("size", [(16, 16), (21, 29), (37, 45)])
def test_gradient_roundtrip_within_quant_error(subsample, size):
    img = _gradient(*size)
    dec = decode_jpeg(encode_jpeg_baseline(img, subsample))
    assert dec.shape == img.shape  # padding cropped back
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12, err.max()
    assert err.mean() <= 4.0


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_markers(interval):
    img = _gradient(24, 40)
    blob = encode_jpeg_baseline(img, "4:2:0", restart_interval=interval)
    assert b"\xff\xdd" in blob  # DRI present
    dec = decode_jpeg(blob)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_grayscale_stream():
    img = _gradient(19, 23)
    dec = decode_jpeg(encode_jpeg_baseline(img, grayscale=True))
    lum = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    assert dec.shape == img.shape  # gray replicated to 3 channels
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert np.abs(dec[:, :, 0].astype(float) - lum).max() <= 8


def test_noise_image_correlates():
    # noise is the worst case for a quality-50 quantizer; demand strong
    # correlation, not closeness
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img))
    corr = np.corrcoef(
        dec.reshape(-1).astype(float), img.reshape(-1).astype(float)
    )[0, 1]
    assert corr > 0.8


def test_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # progressive SOF2 must raise the explicit boundary error
    img = _gradient(8, 8)
    blob = bytearray(encode_jpeg_baseline(img))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_jpeg_mime_through_spark_plumbing(spark):
    """image/jpeg flows through the mapInPandas decode stage for real —
    per-channel mean/std features match the source image within the
    codec's quantization error."""
    from eland_spark.operators.multimodal import decode_image_features

    img = _gradient(16, 16)
    blob = encode_jpeg_baseline(img)
    sdf = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.struct(
            F.lit(bytearray(blob)).alias("data"),
            F.lit("image/jpeg").alias("mime"),
            F.lit(16).cast("int").alias("width"),
            F.lit(16).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("media"),
    )
    row = decode_image_features(sdf).collect()[0]
    feats = np.array(row["img_features"])
    assert np.allclose(feats[:3], img.mean(axis=(0, 1)), atol=3.0)
    assert np.allclose(feats[3:], img.std(axis=(0, 1)), atol=3.0)


def test_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker — real
    web-crawl JPEGs pad with them (ADVICE r3). Inject fill runs before
    every header marker and require an identical decode."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    base = decode_jpeg(blob)

    # re-emit the stream with 1-3 fill bytes before each marker that
    # follows a segment boundary (skip SOI itself and entropy data)
    out = bytearray(blob[:2])
    pos = 2
    import struct as _s

    while pos < len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        out += b"\xff" * (1 + (marker % 3))  # fill run, then the real marker
        if marker == 0xDA:  # SOS: copy the rest verbatim (entropy data)
            out += blob[pos:]
            break
        ln = _s.unpack(">H", blob[pos + 2 : pos + 4])[0]
        out += blob[pos : pos + 2 + ln]
        pos += 2 + ln
    padded = decode_jpeg(bytes(out))
    assert np.array_equal(base, padded)


def test_truncated_streams_raise_valueerror():
    """Corrupt/truncated input must raise ValueError, never IndexError
    (ADVICE r3): cut the stream inside the header, inside a segment
    body, and inside the entropy data."""
    import numpy as np
    import pytest as _pytest

    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    sos = blob.find(b"\xff\xda")
    for cut in (3, 6, sos + 3, len(blob) - 3):
        trunc = blob[:cut]
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(trunc)
    # fill bytes at EOF (marker never arrives)
    with _pytest.raises(ValueError):
        decode_jpeg(blob[:2] + b"\xff\xff\xff")
