"""Pure-numpy BMP/WAV codecs (operators/multimodal.decode_bmp /
decode_wav) and their routing through the feature operators: real
pixel/sample VALUES asserted from planted payloads — no PIL/soundfile
needed — while non-BMP/non-WAV payloads still route to the stub with
its own decoder stamp (mixed batches carry per-row stamps)."""

import struct

import numpy as np
import pytest

from intent_classifier_service_spark.operators import multimodal


# ------------------------------------------------------------ unit: BMP

def test_bmp_roundtrip_exact_pixels():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd width → row padding
    out = multimodal.decode_bmp(multimodal.encode_bmp(px))
    assert out.dtype == np.uint8 and out.shape == (5, 3, 3)
    assert np.array_equal(out, px)


def test_bmp_top_down_layout():
    """Negative biHeight = top-down storage; decode must NOT flip."""
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = bytearray(multimodal.encode_bmp(px))
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)  # flag as top-down…
    # …and rewrite pixel data in top-down row order (encode wrote bottom-up)
    row_size = (2 * 3 + 3) & ~3
    data = np.zeros((2, row_size), dtype=np.uint8)
    data[:, : 2 * 3] = px[:, :, ::-1].reshape(2, 2 * 3)
    buf[54:] = data.tobytes()
    assert np.array_equal(multimodal.decode_bmp(bytes(buf)), px)


def test_bmp_rejects_unsupported_variants():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(multimodal.encode_bmp(px))
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"PNG\x00" + bytes(good[4:]))
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 32)  # 32bpp unsupported
    with pytest.raises(ValueError):
        multimodal.decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError):
        multimodal.decode_bmp(bytes(good[:-4]))  # truncated pixel data


# ------------------------------------------------------------ unit: WAV

def test_wav_roundtrip_pcm16():
    s = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    samples, sr = multimodal.decode_wav(multimodal.encode_wav_pcm16(s, 8000))
    assert sr == 8000 and len(samples) == 1600
    assert np.allclose(samples, s.astype(np.float32) / 32768.0)


def test_wav_extra_chunks_and_word_alignment():
    """LIST chunk with an ODD size before data — the walker must skip
    the pad byte or it misreads every later chunk."""
    s = np.full(100, 4096, dtype=np.int16)
    base = multimodal.encode_wav_pcm16(s, 16000)
    fmt_chunk = base[12:36]           # 'fmt ' + size + 16 bytes
    data_chunk = base[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # odd size + pad
    body = fmt_chunk + extra + data_chunk
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, sr = multimodal.decode_wav(wav)
    assert sr == 16000 and len(samples) == 100
    assert np.allclose(samples, 4096 / 32768.0)


def test_wav_pcm8_float32_and_stereo():
    # PCM-8 (unsigned, 128-centered)
    pcm8 = np.array([128, 255, 0, 128], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 36 + len(pcm8)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm8)) + pcm8.tobytes())
    s8, _ = multimodal.decode_wav(wav8)
    assert np.allclose(s8, [0.0, 127 / 128, -1.0, 0.0])
    # IEEE float32
    f32 = np.array([0.5, -0.25], dtype="<f4")
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wavf = (b"RIFF" + struct.pack("<I", 36 + f32.nbytes) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmtf
            + b"data" + struct.pack("<I", f32.nbytes) + f32.tobytes())
    sf, _ = multimodal.decode_wav(wavf)
    assert np.allclose(sf, [0.5, -0.25])
    # stereo PCM-16 → mono mean
    st = np.array([1000, 3000, -2000, 2000], dtype=np.int16)  # L,R,L,R
    fmt2 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav2 = (b"RIFF" + struct.pack("<I", 36 + st.nbytes) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt2
            + b"data" + struct.pack("<I", st.nbytes) + st.tobytes())
    s2, _ = multimodal.decode_wav(wav2)
    assert np.allclose(s2, [2000 / 32768.0, 0.0])


def test_wav_truncated_data_chunk_raises():
    """A data chunk whose declared size runs past the buffer must raise
    (→ decode_error row), never silently decode short with a wrong
    duration/rms — parity with decode_bmp's 'truncated BMP payload'."""
    import pytest

    s = np.full(200, 1000, dtype=np.int16)
    full = multimodal.encode_wav_pcm16(s, 8000)
    truncated = full[:-100]  # header intact, data chunk cut short
    with pytest.raises(ValueError, match="truncated WAVE chunk"):
        multimodal.decode_wav(truncated)
    # intact payload still decodes
    samples, sr = multimodal.decode_wav(full)
    assert sr == 8000 and len(samples) == 200


# ------------------------------------------- operators: real values

def test_image_features_real_bmp_values(spark):
    """Planted constant-color BMP → EXACT known mean RGB / dims with
    the 'numpy-bmp' stamp; a non-BMP payload in the SAME batch routes
    to the stub with its own stamp (per-row routing)."""
    bmp = multimodal.encode_bmp(np.full((6, 4, 3), (10, 200, 30), np.uint8))
    media = spark.createDataFrame(
        [("real", "r1", bytearray(bmp)),
         ("junk", "r2", bytearray(b"\x00\x01not an image")),
         ("null", "r3", None)],
        "doc_id string, media_ref string, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            multimodal.extract_image_features(media).collect()}
    real = rows["real"]
    assert real["decoder"] == "numpy-bmp" and real["decode_error"] is None
    assert (real["mean_r"], real["mean_g"], real["mean_b"]) == (10.0, 200.0, 30.0)
    assert (real["width"], real["height"]) == (4, 6)
    assert rows["junk"]["decoder"] == multimodal.IMAGE_DECODER  # stub here
    assert rows["junk"]["decode_error"] is None if multimodal._HAVE_PIL else True
    assert rows["null"]["decode_error"] == "empty payload"


def test_resize_real_bmp_content(spark):
    """Constant-color in → constant-color out: the resample produced
    REAL pixels, not stub noise."""
    bmp = multimodal.encode_bmp(np.full((5, 7, 3), (9, 8, 7), np.uint8))
    media = spark.createDataFrame(
        [("d", "r", bytearray(bmp))],
        "doc_id string, media_ref string, payload binary")
    row = multimodal.resize_images(media, 8, 6).collect()[0]
    assert row["decoder"] == "numpy-bmp" and row["resize_error"] is None
    out = np.frombuffer(bytes(row["resized"]), np.uint8).reshape(6, 8, 3)
    assert np.array_equal(out, np.full((6, 8, 3), (9, 8, 7), np.uint8))


def test_audio_features_real_wav_values(spark):
    """Constant-amplitude PCM-16 WAV → exact rms == peak == a/32768,
    zcr == 0, duration from the file's own rate, 'numpy-wav' stamp."""
    wav = multimodal.encode_wav_pcm16(np.full(800, 8192, np.int16), 8000)
    media = spark.createDataFrame(
        [("real", "r1", bytearray(wav)),
         ("junk", "r2", bytearray(b"not audio at all")),],
        "doc_id string, media_ref string, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            multimodal.extract_audio_features(media).collect()}
    real = rows["real"]
    assert real["decoder"] == "numpy-wav" and real["decode_error"] is None
    assert real["duration_sec"] == 0.1          # 800 / 8000 — file's rate
    assert real["rms"] == real["peak"] == 8192 / 32768
    assert real["zcr"] == 0.0
    assert rows["junk"]["decoder"] == multimodal.AUDIO_DECODER
