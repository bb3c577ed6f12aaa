"""REAL audio decode through the multimodal boundary: WAV payloads are
synthesized with the stdlib wave writer, pushed through the Arrow-batched
mapInPandas decode, and the emitted features must equal a locally computed
reference — no stub, no external codec."""

from __future__ import annotations

import array
import io
import math
import wave

from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    _decode_one_stub,
    decode_stub_features,
)


def _make_wav(freq_hz: float, n_frames: int = 800, rate: int = 8000) -> bytes:
    samples = array.array(
        "h",
        [
            int(20000 * math.sin(2 * math.pi * freq_hz * i / rate))
            for i in range(n_frames)
        ],
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _reference_features(payload: bytes) -> list[float]:
    with wave.open(io.BytesIO(payload), "rb") as w:
        raw = w.readframes(w.getnframes())
    mono = array.array("h")
    mono.frombytes(raw)
    size = len(mono)
    out = []
    for i in range(FEATURE_DIM):
        seg = mono[i * size // FEATURE_DIM : (i + 1) * size // FEATURE_DIM]
        out.append((sum(abs(s) for s in seg) / len(seg)) / 32768.0)
    return out


def test_wav_payloads_decode_for_real(spark):
    wavs = {1: _make_wav(440.0), 2: _make_wav(100.0)}
    rows = [
        (mid, "audio", "audio/wav", payload, (None, None, 100, 8000))
        for mid, payload in wavs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: list(r["features"])
        for r in decode_stub_features(media).collect()
    }
    for mid, payload in wavs.items():
        assert feats[mid] == _reference_features(payload), mid
        # a real decode, not the byte-hash stub
        assert feats[mid] != _decode_one_stub(payload)
    # higher-frequency tone has higher mean |amplitude| in every slice than
    # a DC-ish low tone ramping through zero? just sanity: all in [0, 1]
    assert all(0.0 <= f <= 1.0 for fs in feats.values() for f in fs)


def test_non_wav_audio_still_falls_back_to_stub(spark):
    rows = [(9, "audio", "audio/ogg", b"OggS not a wav", (None, None, 5, 44100))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (row,) = decode_stub_features(media).collect()
    assert list(row["features"]) == _decode_one_stub(b"OggS not a wav")


def test_corrupt_wav_falls_back_to_stub(spark):
    # RIFF/WAVE magic intact but the chunk table is garbage: wave.open
    # raises inside the kernel, which must degrade to the stub, not fail
    bad = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"garbage" * 10
    rows = [(7, "audio", "audio/wav", bad, (None, None, 1, 8000))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (row,) = decode_stub_features(media).collect()
    assert list(row["features"]) == _decode_one_stub(bad)


# --- real IMAGE decode (pure-stdlib PPM / BMP kernels) ---------------------

import struct

from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    _decode_bmp,
    _decode_ppm,
)


def _luma(r, g, b):
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


def _make_ppm(pixels_rgb):
    return (
        f"P6 {len(pixels_rgb)} 1 255\n".encode()
        + b"".join(bytes(p) for p in pixels_rgb)
    )


def _make_bmp(rows_rgb):
    """Uncompressed 24-bit bottom-up BMP from row-major RGB tuples."""
    h, w = len(rows_rgb), len(rows_rgb[0])
    stride = (3 * w + 3) // 4 * 4
    body = b""
    for row in reversed(rows_rgb):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def test_ppm_decodes_to_luma_slices(spark):
    pix = [(255, 255, 255), (0, 0, 0), (255, 0, 0), (0, 255, 0)] * 2
    payload = _make_ppm(pix)
    rows = [(3, "image", "image/x-portable-pixmap", payload, (8, 1, None, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (row,) = decode_stub_features(media).collect()
    assert list(row["features"]) == [_luma(*p) for p in pix]
    assert list(row["features"]) != _decode_one_stub(payload)


def test_bmp_decodes_top_down_with_row_padding(spark):
    rows_rgb = [
        [(255, 0, 0), (0, 255, 0)],   # top row
        [(0, 0, 255), (255, 255, 255)],  # bottom row
    ]
    payload = _make_bmp(rows_rgb)
    want_pixels = [p for row in rows_rgb for p in row]  # row-major top-down
    feats = _decode_bmp(payload)
    # 4 pixels over 8 slices: odd slices carry the pixels, even are empty
    assert feats[1::2] == [_luma(*p) for p in want_pixels]
    rows = [(4, "image", "image/bmp", payload, (2, 2, None, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (row,) = decode_stub_features(media).collect()
    assert list(row["features"]) == feats


def test_ppm_comment_and_truncation_handling(spark):
    with_comment = b"P6\n# a comment\n2 1 255\n" + bytes(
        (10, 20, 30)
    ) + bytes((40, 50, 60))
    assert _decode_ppm(with_comment) is not None
    truncated = _make_ppm([(1, 2, 3)] * 4)[:-5]
    assert _decode_ppm(truncated) is None  # falls back to stub upstream


# --- real PNG decode (stdlib zlib + full filter reconstruction) ------------

import zlib

from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    _decode_png,
    _gray_slice_features,
    _paeth,
)


def _chunk(typ, data):
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _make_png(rows, filters, ch=3):
    """Minimal PNG encoder applying the requested filter per row, so the
    decoder must invert every filter type."""
    w, h = len(rows[0]), len(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    raw = b""
    prev = bytes(w * ch)
    for row, f in zip(rows, filters):
        line = bytes(v for px in row for v in px)
        out = bytearray(line)
        for i in range(len(line)):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 1:
                out[i] = (line[i] - a) & 0xFF
            elif f == 2:
                out[i] = (line[i] - b) & 0xFF
            elif f == 3:
                out[i] = (line[i] - (a + b) // 2) & 0xFF
            elif f == 4:
                out[i] = (line[i] - _paeth(a, b, c)) & 0xFF
        raw += bytes([f]) + bytes(out)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_decodes_across_all_filter_types(spark):
    rows_rgb = [
        [(255, 0, 0), (0, 255, 0), (10, 20, 30), (200, 100, 50)],
        [(0, 0, 255), (255, 255, 255), (5, 5, 5), (90, 80, 70)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (250, 249, 248)],
        [(100, 100, 100), (0, 0, 0), (255, 255, 255), (42, 42, 42)],
        [(9, 9, 9), (8, 8, 8), (7, 7, 7), (6, 6, 6)],
    ]
    payload = _make_png(rows_rgb, filters=[0, 1, 2, 3, 4])
    want = _gray_slice_features(
        [_luma(*p) for row in rows_rgb for p in row]
    )
    assert _decode_png(payload) == want
    media = spark.createDataFrame(
        [(5, "image", "image/png", payload, (4, 5, None, None))], MEDIA_SCHEMA
    )
    (row,) = decode_stub_features(media).collect()
    assert list(row["features"]) == want


def test_png_rgba_and_rejections():
    rgba = [[(10, 20, 30, 255), (200, 100, 50, 128)]]
    payload = _make_png(rgba, filters=[4], ch=4)
    assert _decode_png(payload) == _gray_slice_features(
        [_luma(r, g, b) for (r, g, b, _a) in rgba[0]]
    )
    assert _decode_png(b"\x89PNG\r\n\x1a\n" + b"junk") is None
    truncated = _make_png([[(1, 2, 3)]], filters=[0])[:-20]
    assert _decode_png(truncated) is None
