"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata.

Decode routing is sniff-first, per payload: uncompressed 24-bit BMP and
RIFF/WAVE PCM payloads decode through the built-in pure-numpy parsers
(`decode_bmp` / `decode_wav`) — REAL pixel/sample values, library-free,
so the container's missing PIL/soundfile no longer forces stubs for
formats numpy can parse. Other formats route through the optional-import
seam: with PIL/soundfile installed they decode for real; otherwise they
fall back to clearly-marked deterministic stubs keyed on the payload
hash. Every output row carries a per-row ``decoder`` stamp
('numpy-bmp' / 'numpy-wav' / 'pil' / 'soundfile' / 'stub') so downstream
can never mistake stub features for real ones. Everything Spark-side is
real and tested: schema, Arrow batch shapes, mapInPandas signatures,
partition-size control for wide binary rows.

Scale notes: binary payloads dominate row size, so operators here
repartition by a size-aware key before any wide shuffle, keep metadata
columns separate from payloads (late materialization: filter on
metadata first, join payloads back by id), and cap Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Optional-import seam: deployments with real codec libraries get real
# decodes; this sandbox (no pip/apt) gets the deterministic stubs. The
# active decoder is stamped into every output row (``decoder`` column)
# so downstream can never mistake stub features for real ones.
try:  # pragma: no cover — PIL absent in the sandbox
    from PIL import Image as _PILImage
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False
try:  # pragma: no cover — soundfile absent in the sandbox
    import soundfile as _soundfile
    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

# Fallback decoder names for payloads the numpy parsers can't handle
# (non-BMP images / non-WAV audio). Kept as module constants so driver
# oracles can interpolate the environment's fallback at import time.
IMAGE_DECODER = "pil" if _HAVE_PIL else "stub"
AUDIO_DECODER = "soundfile" if _HAVE_SOUNDFILE else "stub"

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, media_kind string, "
    "width int, height int, n_frames int, sample_rate int"
)


# ------------------------------------------------ pure-numpy codecs
# Library-free parsers for the two classic uncompressed formats — the
# formats a validation engine can always decode without a codec stack.
# Scope is deliberately narrow and checked: 24-bit BI_RGB BMP and
# PCM 8/16-bit or IEEE-float RIFF/WAVE; anything else raises and routes
# to the PIL/soundfile/stub fallback.

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up, BGR, rows padded to 4 bytes) —
    the datagen/test twin of decode_bmp."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    h, w = px.shape[:2]
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    file_size = 14 + 40 + len(data)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BMP → (H, W, 3)
    uint8 RGB. Handles bottom-up (positive height) and top-down
    (negative height) layouts and 4-byte row padding; rejects
    compressed / non-24bpp variants (they fall through to the
    PIL-or-stub path)."""
    buf = bytes(payload)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        raise ValueError("unsupported BMP variant (need 24bpp BI_RGB)")
    n_rows = abs(h)
    row_size = (w * 3 + 3) & ~3
    need = pix_offset + row_size * n_rows
    if len(buf) < need:
        raise ValueError("truncated BMP payload")
    data = np.frombuffer(buf, np.uint8, count=row_size * n_rows,
                         offset=pix_offset)
    rows = data.reshape(n_rows, row_size)[:, : w * 3].reshape(n_rows, w, 3)
    if h > 0:  # bottom-up storage → flip to top-down
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM-16 RIFF/WAVE — the
    datagen/test twin of decode_wav."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy decode of a RIFF/WAVE payload → (float32 mono samples
    in [-1, 1], sample_rate). Supports PCM 8/16-bit and IEEE-float32;
    multi-channel is averaged to mono (matching the soundfile path).
    Walks the chunk list properly (word-aligned), so extra chunks
    (LIST/INFO) don't break the parse."""
    buf = bytes(payload)
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos:pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > len(buf):
            # a declared chunk running past the buffer is a truncated/
            # corrupt payload — surface as a decode error (mirroring
            # decode_bmp's 'truncated BMP payload'), never a silent
            # short decode with wrong duration/rms
            raise ValueError("truncated WAVE chunk")
        body = buf[pos + 8: pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, n_ch, sr, _, _, bits = fmt
    if audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        samples = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 3 and bits == 32:
        samples = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAVE format {audio_format}/{bits}")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return samples, sr


def _decode_image_bytes(payload: bytes) -> tuple[np.ndarray, str]:
    """Image decode kernel → (RGB array, decoder stamp). Sniff-first:
    BMP magic routes to the pure-numpy parser (real pixels, any
    environment); otherwise PIL when installed; otherwise a
    clearly-marked deterministic STUB (4x4 'image' seeded from the
    payload digest so tests are stable). Raises for None to mirror
    real decoder behavior."""
    if payload is None:
        raise ValueError("empty payload")
    if bytes(payload[:2]) == b"BM":
        return decode_bmp(payload), "numpy-bmp"
    if _HAVE_PIL:  # pragma: no cover — exercised where PIL exists
        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img), "pil"
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8), "stub"


def attach_fake_payloads(docs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Deterministic binary payloads derived from the ref string —
    stands in for an object-store fetch; lets the plumbing be tested
    with real bytes flowing through Arrow."""
    return docs.withColumn(
        "payload",
        F.when(F.col(ref_col).isNotNull(), F.to_binary(F.sha2(F.col(ref_col), 256), F.lit("hex"))),
    )


def extract_image_features(media: DataFrame, id_cols: tuple[str, ...] = ("doc_id", "media_ref"),
                           payload_col: str = "payload") -> DataFrame:
    """mapInPandas: decode each binary payload (stubbed), emit a small
    feature vector (mean RGB + dims). Batch-shaped: one numpy pass per
    Arrow batch; bad payloads emit nulls + an error tag instead of
    failing the task (violation-row philosophy, not fail-the-job)."""
    out_schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", mean_r double, mean_g double, mean_b double, width int, height int, "
        "decode_error string, decoder string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the decode is inherently per-payload (that's the stubbed
            # kernel's unit of work), but the row assembly is columnar:
            # preallocated numpy arrays, one DataFrame build per batch —
            # no iterrows, no per-row dict construction
            n = len(pdf)
            mean_rgb = np.full((n, 3), np.nan)
            dims = np.full((n, 2), np.nan)
            errs = np.full(n, None, dtype=object)
            decoders = np.full(n, IMAGE_DECODER, dtype=object)
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    img, decoders[i] = _decode_image_bytes(payload)
                    mean_rgb[i] = img.reshape(-1, 3).mean(axis=0)
                    dims[i] = (img.shape[1], img.shape[0])
                except Exception as e:  # noqa: BLE001 — violation, not crash
                    errs[i] = str(e)
            out = pd.DataFrame({c: pdf[c].to_numpy() for c in id_cols})
            out["mean_r"] = mean_rgb[:, 0]
            out["mean_g"] = mean_rgb[:, 1]
            out["mean_b"] = mean_rgb[:, 2]
            out["width"] = pd.Series(dims[:, 0]).astype("Int32")
            out["height"] = pd.Series(dims[:, 1]).astype("Int32")
            out["decode_error"] = errs
            out["decoder"] = decoders
            yield out

    return media.select(*id_cols, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int,
                  id_cols: tuple[str, ...] = ("doc_id", "media_ref"),
                  payload_col: str = "payload") -> DataFrame:
    """mapInPandas resize: decode (stubbed) → nearest-neighbor resample
    → re-emit raw RGB bytes + new dims. The resample itself is a numpy
    index operation (vectorizable per image, no Python pixel loops);
    the binary round-trip through Arrow is the real plumbing under
    test. Bad payloads emit null bytes + an error tag."""
    out_schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", resized binary, width int, height int, resize_error string, decoder string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = np.full(n, None, dtype=object)
            errs = np.full(n, None, dtype=object)
            decoders = np.full(n, IMAGE_DECODER, dtype=object)
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    img, decoders[i] = _decode_image_bytes(payload)
                    # indices derived from THIS image's shape — a real
                    # decoder returns arbitrary dims (the stub happens
                    # to emit 4x4, but hardcoding that would silently
                    # crop/crash on real decodes)
                    idx_y = np.linspace(0, img.shape[0] - 1, height).round().astype(int)
                    idx_x = np.linspace(0, img.shape[1] - 1, width).round().astype(int)
                    resized = img[idx_y][:, idx_x]  # nearest-neighbor
                    payloads[i] = resized.tobytes()
                except Exception as e:  # noqa: BLE001
                    errs[i] = str(e)
            out = pd.DataFrame({c: pdf[c].to_numpy() for c in id_cols})
            out["resized"] = payloads
            out["width"] = pd.Series(np.where(pd.isna(errs), width, np.nan)).astype("Int32")
            out["height"] = pd.Series(np.where(pd.isna(errs), height, np.nan)).astype("Int32")
            out["resize_error"] = errs
            out["decoder"] = decoders
            yield out

    return media.select(*id_cols, payload_col).mapInPandas(run, schema=out_schema)


def _decode_audio_bytes(payload: bytes,
                        sample_rate: int = 16000) -> tuple[np.ndarray, int, str]:
    """Audio decode kernel → (float32 mono samples, sample_rate,
    decoder stamp). Sniff-first: RIFF/WAVE magic routes to the
    pure-numpy PCM parser (real samples + the file's own rate, any
    environment); otherwise soundfile when installed; otherwise a
    clearly-marked deterministic STUB (one second of float32 samples
    seeded from the payload digest). Raises for None to mirror real
    decoder behavior; ``sample_rate`` is only the stub's nominal rate."""
    if payload is None:
        raise ValueError("empty payload")
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE":
        samples, sr = decode_wav(payload)
        return samples, sr, "numpy-wav"
    if _HAVE_SOUNDFILE:  # pragma: no cover — exercised where it exists
        samples, sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        return samples, sr, "soundfile"
    seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "big")
    rng = np.random.RandomState(seed)
    return (rng.uniform(-1.0, 1.0, size=sample_rate).astype(np.float32),
            sample_rate, "stub")


def extract_audio_features(media: DataFrame,
                           id_cols: tuple[str, ...] = ("doc_id", "media_ref"),
                           payload_col: str = "payload",
                           sample_rate: int = 16000) -> DataFrame:
    """mapInPandas audio features: decode (stubbed) → duration / RMS /
    peak / zero-crossing-rate, all numpy reductions per clip. Columnar
    row assembly, violation-row error handling — same contract as
    extract_image_features."""
    out_schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", duration_sec double, rms double, peak double, zcr double, "
        "decode_error string, decoder string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            feats = np.full((n, 4), np.nan)
            errs = np.full(n, None, dtype=object)
            decoders = np.full(n, AUDIO_DECODER, dtype=object)
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    samples, sr, decoders[i] = _decode_audio_bytes(payload, sample_rate)
                    feats[i, 0] = len(samples) / sr
                    feats[i, 1] = float(np.sqrt(np.mean(samples ** 2)))
                    feats[i, 2] = float(np.abs(samples).max())
                    feats[i, 3] = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
                except Exception as e:  # noqa: BLE001
                    errs[i] = str(e)
            out = pd.DataFrame({c: pdf[c].to_numpy() for c in id_cols})
            out["duration_sec"] = feats[:, 0]
            out["rms"] = feats[:, 1]
            out["peak"] = feats[:, 2]
            out["zcr"] = feats[:, 3]
            out["decode_error"] = errs
            out["decoder"] = decoders
            yield out

    return media.select(*id_cols, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10,
                      n_frames_col: str = "n_frames") -> DataFrame:
    """Video frame-sampling *plan*: expand (doc_id, n_frames) into the
    frame indices to decode — pure JVM sequence/filter; the decode
    itself would be a mapInPandas like extract_image_features."""
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return media.withColumn("frame_indices", idx)
