"""Multimodal (image/audio/video) column operators.

No reference analog (eland's NLP import is text-only); this is the
training-data-pipeline extension. Design per SURVEY north star: media
are opaque ``binary`` columns + typed metadata struct; decode/resize/
feature-extract run as Arrow-batched mapInPandas stages. PNG,
baseline JPEG and 16-bit WAV decode for REAL via stdlib+numpy codecs
(zlib/wave/operators.jpeg — see _decode_png/_decode_wav/_decode_image);
mimes needing external libs (progressive jpeg, mp3) keep deterministic
stub kernels with an explicit NotImplementedError boundary, and the
Spark-side contract (schema, batching, partitioning) is real either
way.
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


def _decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode via stdlib only (zlib + struct): 8-bit gray/
    RGB/RGBA, all five scanline filters — returns (h, w, 3) uint8.
    No PIL needed; this de-stubs the most common training-image mime
    in dependency-free environments."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            meta = (w, h, depth, color, interlace)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, interlace = meta
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} unsupported"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f0 = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f0 == 0:
            pass
        elif f0 == 2:  # Up
            line += prev
        elif f0 in (1, 3, 4):  # Sub / Average / Paeth need a scan
            line32 = line.astype(np.int32)
            p32 = prev.astype(np.int32)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = p32[x]
                c = p32[x - ch] if x >= ch else 0
                if f0 == 1:
                    pred = a
                elif f0 == 3:
                    pred = (a + b) // 2
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line32[x] + pred) & 0xFF
            line = rec.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f0}")
        out[y] = line
        prev = out[y]
    img = out.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    elif ch == 4:
        img = img[:, :, :3]
    return img


def _decode_wav(data: bytes) -> np.ndarray:
    """Real WAV decode via the stdlib wave module: 16-bit PCM ->
    float32 mono waveform in [-1, 1]."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as f:
        nch, sw, nframes = f.getnchannels(), f.getsampwidth(), f.getnframes()
        if sw != 2:
            raise NotImplementedError(f"WAV sample width {sw} unsupported")
        pcm = np.frombuffer(f.readframes(nframes), dtype="<i2").astype(np.float32)
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm / 32768.0


def _decode_image(m) -> np.ndarray:
    """Mime-dispatched image decode: real stdlib PNG and baseline JPEG
    codecs, the deterministic stub for 'image/fake',
    NotImplementedError otherwise (the boundary stays explicit)."""
    if m["mime"] == "image/png":
        return _decode_png(m["data"])
    if m["mime"] == "image/jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(m["data"])
    if m["mime"] == "image/raw-rgb8":
        return np.frombuffer(m["data"], dtype=np.uint8).reshape(
            m["height"], m["width"], 3
        )
    if m["mime"] == "image/fake":
        return _decode_stub(m["data"], m["width"], m["height"])
    raise NotImplementedError(
        f"real decoder for mime {m['mime']!r} not available "
        "in this environment"
    )


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
                    img = _decode_image(m)
                    feats.append(
                        np.concatenate(
                            [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                        ).astype("float32").tolist()
                    )
                chunk[out_col] = feats
                yield chunk

    from .parallelism import spread_for_compute

    return spread_for_compute(df).mapInPandas(run, out_schema)


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
                    img = _decode_image(m)
                    ih, iw = img.shape[0], img.shape[1]
                    ys = (np.arange(height) * ih // height).astype(int)
                    xs = (np.arange(width) * iw // width).astype(int)
                    resized = img[np.ix_(ys, xs)]
                    out.append(
                        {
                            "data": resized.tobytes(),
                            # decoded output is raw interleaved RGB —
                            # advertise that, so a downstream decode
                            # composes instead of re-parsing a codec
                            # container that is no longer there
                            "mime": "image/raw-rgb8",
                            "width": width,
                            "height": height,
                            "n_frames": m["n_frames"],
                        }
                    )
                chunk[media_col] = out
                yield chunk

    from .parallelism import spread_for_compute

    return spread_for_compute(df).mapInPandas(run, df.schema)


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
                    if m["mime"] in ("audio/wav", "audio/x-wav"):
                        pcm = _decode_wav(m["data"])
                    elif m["mime"] == "audio/fake":
                        pcm = (
                            _pcm_stub_portable(m["data"])
                            if portable
                            else _pcm_stub(m["data"])
                        )
                    else:
                        raise NotImplementedError(
                            f"real audio decoder for mime {m['mime']!r} not "
                            "available in this environment"
                        )
                    rms = float(np.sqrt(np.mean(pcm**2)))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0))
                    peak = float(np.max(np.abs(pcm)))
                    feats.append([rms, zcr, peak])
                chunk[out_col] = feats
                yield chunk

    from .parallelism import spread_for_compute

    return spread_for_compute(df).mapInPandas(run, out_schema)
