"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata.

The decode kernels route through an optional-import seam: with
PIL/soundfile installed they decode for real; in this sandbox (no
image/audio libraries) they fall back to clearly-marked deterministic
stubs keyed on the payload hash. Every output row carries a ``decoder``
column ('pil'/'soundfile' vs 'stub') so downstream can never mistake
stub features for real ones. Everything Spark-side is real and tested:
schema, Arrow batch shapes, mapInPandas signatures, partition-size
control for wide binary rows.

Scale notes: binary payloads dominate row size, so operators here
repartition by a size-aware key before any wide shuffle, keep metadata
columns separate from payloads (late materialization: filter on
metadata first, join payloads back by id), and cap Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
"""

from __future__ import annotations

import hashlib
import io
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

IMAGE_DECODER = "pil" if _HAVE_PIL else "stub"
AUDIO_DECODER = "soundfile" if _HAVE_SOUNDFILE else "stub"

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, media_kind string, "
    "width int, height int, n_frames int, sample_rate int"
)


def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """Image decode kernel. With PIL installed this is a real decode;
    otherwise a clearly-marked deterministic STUB: a 4x4 'image' seeded
    from the payload digest so tests are stable. Raises for None to
    mirror real decoder behavior."""
    if payload is None:
        raise ValueError("empty payload")
    if _HAVE_PIL:  # pragma: no cover — exercised where PIL exists
        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)


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
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    img = _decode_image_bytes(payload)
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
            out["decoder"] = IMAGE_DECODER
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
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    img = _decode_image_bytes(payload)
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
            out["decoder"] = IMAGE_DECODER
            yield out

    return media.select(*id_cols, payload_col).mapInPandas(run, schema=out_schema)


def _decode_audio_bytes(payload: bytes, sample_rate: int = 16000) -> np.ndarray:
    """Audio decode kernel. With soundfile installed this is a real
    decode; otherwise a clearly-marked deterministic STUB: one second of
    float32 samples seeded from the payload digest. Raises for None to
    mirror real decoder behavior."""
    if payload is None:
        raise ValueError("empty payload")
    if _HAVE_SOUNDFILE:  # pragma: no cover — exercised where it exists
        samples, _sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
        return samples if samples.ndim == 1 else samples.mean(axis=1)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "big")
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=sample_rate).astype(np.float32)


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
            for i, payload in enumerate(pdf[payload_col].to_numpy()):
                try:
                    samples = _decode_audio_bytes(payload, sample_rate)
                    feats[i, 0] = len(samples) / sample_rate
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
            out["decoder"] = AUDIO_DECODER
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
