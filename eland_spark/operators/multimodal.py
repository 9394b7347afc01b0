"""Multimodal (image/audio/video) column operators.

No reference analog (eland's NLP import is text-only); this is the
training-data-pipeline extension. Design per SURVEY north star: media
are opaque ``binary`` columns + typed metadata struct; decode/resize/
feature-extract run as Arrow-batched mapInPandas stages. The decode
kernels themselves are STUBBED (no image/audio libs in this container,
deterministic fakes keep the pipeline testable) — the Spark-side
contract (schema, batching, partitioning) is real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_image_features",
    "sample_video_frames",
    "resize_images",
    "extract_audio_features",
]

# media column contract: raw bytes + typed metadata (mime drives dispatch)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media blobs derived from the id — exercises
    binary-column plumbing (size accounting, shuffle of binary payloads)
    without real codecs."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("data"),
            F.lit("image/fake").alias("mime"),
            (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ),
    )


def _decode_stub(data: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: derives a deterministic pseudo-image from the bytes.
    A real implementation would be e.g. PIL.Image.open(io.BytesIO(data));
    raise NotImplementedError for real mime types to make the boundary
    explicit."""
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "img_features",
    batch_size: int = 256,
) -> DataFrame:
    """Decode + feature-extract: mean/std per RGB channel (6 floats).
    Arrow-batched mapInPandas; decode kernel is stubbed (see
    ``_decode_stub``) — swap in a real codec without touching the plan."""
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), True)
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                feats = []
                for m in chunk[media_col]:
                    if m is None or m["data"] is None:
                        feats.append(None)
                        continue
                    if m["mime"] != "image/fake":
                        raise NotImplementedError(
                            f"real decoder for mime {m['mime']!r} not available "
                            "in this environment"
                        )
                    img = _decode_stub(m["data"], m["width"], m["height"])
                    feats.append(
                        np.concatenate(
                            [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                        ).astype("float32").tolist()
                    )
                chunk[out_col] = feats
                yield chunk

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    media_col: str = "media",
    every_nth: int = 10,
    out_col: str = "frame_idx",
) -> DataFrame:
    """Frame-sampling plan: explode selected frame indices per video.
    Pure expressions (sequence+explode); the per-frame decode would be a
    downstream mapInPandas like decode_image_features.

    Zero-frame media yield no rows (no phantom frame 0); null n_frames
    rows are kept with a null frame index (explode_outer of the null
    sequence that when() falls through to)."""
    n = F.col(f"{media_col}.n_frames")
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1, F.lit(every_nth)))
    return df.withColumn(out_col, F.explode_outer(idx)).filter(
        n.isNull() | (n >= 1)
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    batch_size: int = 256,
) -> DataFrame:
    """Resize every image to (width, height), replacing the media struct
    in place (same MEDIA_SCHEMA out — resize stages compose). The kernel
    is the stubbed decode + nearest-neighbor index sampling; a real
    implementation swaps in PIL/cv2 inside the same mapInPandas batch
    loop. Null media rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                out = []
                for m in chunk[media_col]:
                    if m is None or m["data"] is None:
                        out.append(m)
                        continue
                    if m["mime"] != "image/fake":
                        raise NotImplementedError(
                            f"real resize for mime {m['mime']!r} not available "
                            "in this environment"
                        )
                    img = _decode_stub(m["data"], m["width"], m["height"])
                    ys = (np.arange(height) * m["height"] // height).astype(int)
                    xs = (np.arange(width) * m["width"] // width).astype(int)
                    resized = img[np.ix_(ys, xs)]
                    out.append(
                        {
                            "data": resized.tobytes(),
                            "mime": m["mime"],
                            "width": width,
                            "height": height,
                            "n_frames": m["n_frames"],
                        }
                    )
                chunk[media_col] = out
                yield chunk

    return df.mapInPandas(run, df.schema)


def _pcm_stub(data: bytes, n: int = 4096) -> np.ndarray:
    """STUB audio decoder: deterministic fake PCM waveform in [-1, 1)
    derived from the bytes (real path: soundfile/librosa load)."""
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[4:8], "big")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=n)


def _pcm_stub_portable(data: bytes, n: int = 4096) -> np.ndarray:
    """Engine-portable twin of :func:`_pcm_stub`: the waveform is a
    64-bit LCG over (md5-derived seed + sample index) in plain modular
    arithmetic — no numpy RNG state — so a SQL engine reproduces it
    bit-for-bit (HUGEINT multiply-mod in the driver oracle). Same
    honest-fake contract; a real decoder swaps in at the same point."""
    seed = int.from_bytes(
        hashlib.md5((data or b"").hex().encode()).digest()[:8], "big"
    )
    i = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        state = (np.uint64(seed) + i) * np.uint64(
            6364136223846793005
        ) + np.uint64(1442695040888963407)
    u = (state >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return u * 2.0 - 1.0


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "audio_features",
    batch_size: int = 256,
    portable: bool = False,
) -> DataFrame:
    """Audio feature extraction: (rms, zero-crossing rate, peak) per
    clip as array<float>. Same stub-kernel / real-plumbing contract as
    decode_image_features; audio mime gate is 'audio/fake'.
    ``portable=True`` swaps the fake-PCM kernel for the LCG variant the
    driver's SQL oracle reproduces bit-for-bit."""
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), True)
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                feats = []
                for m in chunk[media_col]:
                    if m is None or m["data"] is None:
                        feats.append(None)
                        continue
                    if not m["mime"].startswith("audio/"):
                        feats.append(None)  # non-audio rows: null, not error
                        continue
                    if m["mime"] != "audio/fake":
                        raise NotImplementedError(
                            f"real audio decoder for mime {m['mime']!r} not "
                            "available in this environment"
                        )
                    pcm = (
                        _pcm_stub_portable(m["data"])
                        if portable
                        else _pcm_stub(m["data"])
                    )
                    rms = float(np.sqrt(np.mean(pcm**2)))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0))
                    peak = float(np.max(np.abs(pcm)))
                    feats.append([rms, zcr, peak])
                chunk[out_col] = feats
                yield chunk

    return df.mapInPandas(run, out_schema)
