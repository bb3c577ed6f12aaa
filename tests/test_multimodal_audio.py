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


# --- real baseline-JPEG decode (stdlib + numpy IDCT) ------------------------

import numpy as np
import pytest

from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    _decode_jpeg,
    _decode_one,
)


def _dct_m():
    m = np.empty((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_M = _dct_m()
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitW:
    """MSB-first bit writer with 0xFF byte stuffing and 1-padding."""

    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, val, bits):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.put(1, 1)


def _category(v):
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_jpeg(gray, n_comp=1, quant=8, restart=0):
    """Minimal baseline encoder: single-length canonical Huffman tables
    (every symbol at code length 8 — the decoder must rebuild canonical
    codes, not pattern-match Annex K), quality = uniform quant table,
    optional restart markers. n_comp=3 appends constant chroma planes so
    the decoder must entropy-decode non-luma blocks to stay in sync."""
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    assert h % 8 == 0 and w % 8 == 0
    # quantized blocks in scan order
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = gray[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            blocks.append(
                np.rint((_M @ blk @ _M.T) / quant).astype(int).ravel()
            )
    def tokens():
        """(is_ac, symbol, value, value_bits) stream — ONE definition of the
        emission order so symbol gathering and bit writing cannot drift
        (restart markers reset the DC predictors in both passes)."""
        preds = [0] * n_comp
        for i, b in enumerate(blocks):
            if restart and i and i % restart == 0:
                yield ("RST", None, None, None)
                preds = [0] * n_comp
            for ci in range(n_comp):
                zz = (
                    [int(b[_ZZ[k]]) for k in range(64)]
                    if ci == 0
                    else [0] * 64  # constant-128 chroma: diff 0, EOB
                )
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                t = _category(diff)
                yield (0, t, diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = max((k for k in range(64) if zz[k]), default=0)
                for k in range(1, 64):
                    if k > last_nz:
                        yield (1, 0x00, 0, 0)  # EOB
                        break
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        yield (1, 0xF0, 0, 0)
                        run -= 16
                    s = _category(zz[k])
                    v = zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1
                    yield (1, (run << 4) | s, v, s)
                    run = 0

    dc_syms, ac_syms = {0}, {0x00}
    for kind, sym, _v, _n in tokens():
        if kind == 0:
            dc_syms.add(sym)
        elif kind == 1:
            ac_syms.add(sym)
    dc_list, ac_list = sorted(dc_syms), sorted(ac_syms)
    dc_code = {s: i for i, s in enumerate(dc_list)}
    ac_code = {s: i for i, s in enumerate(ac_list)}

    def dht(tc, syms):
        counts = bytes(len(syms) if i == 7 else 0 for i in range(16))
        return bytes([tc << 4]) + counts + bytes(syms)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    qtbl = bytes([0]) + bytes(quant for _ in range(64))
    comps_sof = b"".join(
        bytes([cid, 0x11, 0]) for cid in range(1, n_comp + 1)
    )
    comps_sos = b"".join(bytes([cid, 0x00]) for cid in range(1, n_comp + 1))
    head = (
        b"\xff\xd8"
        + seg(0xDB, qtbl)
        + seg(
            0xC0,
            bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + bytes([n_comp]) + comps_sof,
        )
        + seg(0xC4, dht(0, dc_list))
        + seg(0xC4, dht(1, ac_list))
        + (seg(0xDD, restart.to_bytes(2, "big")) if restart else b"")
        + seg(0xDA, bytes([n_comp]) + comps_sos + bytes([0, 63, 0]))
    )
    wbits = _BitW()
    rst = 0
    for kind, sym, v, nbits in tokens():
        if kind == "RST":
            wbits.align()
            wbits.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            continue
        wbits.put(dc_code[sym] if kind == 0 else ac_code[sym], 8)
        if nbits:
            wbits.put(v, nbits)
    wbits.align()
    return head + bytes(wbits.out) + b"\xff\xd9", blocks


def _expected_features(blocks, h, w, quant):
    """Mirror of the decoder's dequant→IDCT→shift→clip pipeline."""
    bw = w // 8
    plane = np.zeros((h, w))
    for i, b in enumerate(blocks):
        by, bx = divmod(i, bw)
        coef = np.array(b, dtype=float).reshape(8, 8) * quant
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _M.T @ coef @ _M
    gray = np.clip(plane + 128.0, 0.0, 255.0) / 255.0
    return _gray_slice_features([float(x) for x in gray.ravel()])


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.clip(40.0 + 7.0 * x + 3.0 * y + 20.0 * np.sin(x / 3.0), 0, 255)


def test_jpeg_grayscale_roundtrip():
    gray = _gradient(16, 24)
    payload, blocks = _encode_jpeg(gray, n_comp=1)
    got = _decode_jpeg(payload)
    assert got is not None
    want = _expected_features(blocks, 16, 24, 8)
    assert got == pytest.approx(want, abs=1e-9)
    # and the decode is faithful to the source image, not just self-consistent
    src = _gray_slice_features([float(v) / 255.0 for v in gray.ravel()])
    assert got == pytest.approx(src, abs=0.05)


def test_jpeg_restart_markers_same_features():
    gray = _gradient(16, 24)
    plain, _ = _encode_jpeg(gray, n_comp=1)
    with_rst, _ = _encode_jpeg(gray, n_comp=1, restart=2)
    assert with_rst != plain
    assert _decode_jpeg(with_rst) == _decode_jpeg(plain)


def test_jpeg_three_component_chroma_sync():
    # constant chroma adds entropy-coded blocks the decoder must consume
    # (not transform) to keep the luma bitstream in sync
    gray = _gradient(8, 16)
    mono, _ = _encode_jpeg(gray, n_comp=1)
    color, _ = _encode_jpeg(gray, n_comp=3)
    assert len(color) > len(mono)
    assert _decode_jpeg(color) == _decode_jpeg(mono)


def test_jpeg_arithmetic_and_garbage_reject():
    gray = _gradient(8, 8)
    payload, _ = _encode_jpeg(gray)
    arithmetic = payload.replace(b"\xff\xc0", b"\xff\xc9", 1)
    assert _decode_jpeg(arithmetic) is None
    assert _decode_jpeg(b"\xff\xd8\x00\x01") is None
    assert _decode_jpeg(b"not a jpeg") is None


def test_jpeg_dispatch_beats_stub():
    gray = _gradient(16, 16)
    payload, _ = _encode_jpeg(gray)
    feats = _decode_one(payload)
    assert feats == _decode_jpeg(payload)
    assert feats != _decode_one_stub(payload)


# --- progressive JPEG (SOF2): in-test encoder + decode parity ---------------


def _encode_jpeg_progressive(gray, n_comp=1, quant=8, dc_al=1, ac_al=1):
    """Minimal spec-correct progressive encoder: an interleaved DC-first
    scan (point transform ``dc_al``), per-component AC-first scans with
    real EOB-run accumulation, an interleaved DC-refinement scan, and
    per-component AC-refinement scans emitting the jdphuff correction-bit
    walk (newly-visible coefficients as ±1<<Al with positionally-ordered
    buffered bits, ZRL splitting, cross-block refinement EOB runs).
    Chroma planes are constant so their scans are trivial, but they are
    REAL scans — the decoder must skip them by structure, not luck."""
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    assert h % 8 == 0 and w % 8 == 0
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = gray[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            blocks.append(np.rint((_M @ blk @ _M.T) / quant).astype(int).ravel())
    zero = np.zeros(64, dtype=int)

    def comp_blocks(ci):
        return blocks if ci == 0 else [zero] * len(blocks)

    class _Scan:
        """One scan's symbol+bit stream with its own Huffman table built
        from the symbols actually emitted (single-length canonical)."""

        def __init__(self):
            self.items = []  # ("sym", s) | ("bits", val, n)

        def sym(self, s):
            self.items.append(("sym", s))

        def bits(self, v, n):
            if n:
                self.items.append(("bits", v, n))

        def bit(self, b):
            self.bits(b, 1)

        def serialize(self):
            syms = sorted({it[1] for it in self.items if it[0] == "sym"} | {0})
            code = {s: i for i, s in enumerate(syms)}
            wb = _BitW()
            for it in self.items:
                if it[0] == "sym":
                    wb.put(code[it[1]], 8)
                else:
                    wb.put(it[1], it[2])
            wb.align()
            return syms, bytes(wb.out)

    def dc_first_scan():
        sc = _Scan()
        preds = [0] * n_comp
        for i in range(len(blocks)):
            for ci in range(n_comp):
                v = int(comp_blocks(ci)[i][0]) >> dc_al  # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                t = _category(diff)
                sc.sym(t)
                sc.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return sc

    def dc_refine_scan():
        sc = _Scan()
        for i in range(len(blocks)):
            for ci in range(n_comp):
                sc.bit(int(comp_blocks(ci)[i][0]) & 1)  # two's-complement bit
        return sc

    def ac_first_scan(ci):
        sc = _Scan()
        eob_run = 0

        def flush():
            nonlocal eob_run
            if eob_run:
                r = eob_run.bit_length() - 1
                sc.sym(r << 4)
                sc.bits(eob_run - (1 << r), r)
                eob_run = 0

        for b in comp_blocks(ci):
            a = [0] * 64
            for k in range(1, 64):
                c = int(b[_ZZ[k]])
                t = abs(c) >> ac_al  # AC point transform truncates to zero
                a[k] = t if c >= 0 else -t
            nz = [k for k in range(1, 64) if a[k]]
            if not nz:
                eob_run += 1
                if eob_run == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for k in range(1, nz[-1] + 1):
                if a[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    sc.sym(0xF0)
                    run -= 16
                s = _category(a[k])
                sc.sym((run << 4) | s)
                sc.bits(a[k] if a[k] > 0 else a[k] + (1 << s) - 1, s)
                run = 0
            if nz[-1] < 63:
                eob_run += 1
        flush()
        return sc

    def ac_refine_scan(ci):
        # Ah = ac_al, Al = ac_al - 1: one successive-approximation step
        ah, al = ac_al, ac_al - 1
        sc = _Scan()
        eob_run, eob_bits = 0, []

        def flush():
            nonlocal eob_run, eob_bits
            if eob_run:
                r = eob_run.bit_length() - 1
                sc.sym(r << 4)
                sc.bits(eob_run - (1 << r), r)
                for b in eob_bits:
                    sc.bit(b)
                eob_run, eob_bits = 0, []

        for b in comp_blocks(ci):
            # positional event stream, exactly what the decoder walks
            events = []  # "zero" | ("bit", b) | ("new", sign)
            for k in range(1, 64):
                c = int(b[_ZZ[k]])
                t_prev, t_now = abs(c) >> ah, abs(c) >> al
                if t_prev != 0:
                    events.append(("bit", t_now & 1))
                elif t_now == 0:
                    events.append("zero")
                else:  # newly visible, magnitude is exactly 1 at this Al
                    events.append(("new", 1 if c > 0 else -1))
            if not any(ev[0] == "new" for ev in events if ev != "zero"):
                eob_run += 1
                eob_bits.extend(ev[1] for ev in events if ev != "zero")
                if eob_run == 0x7FFF:
                    flush()
                continue
            flush()
            i = 0
            while i < len(events):
                j, zeros, nxt = i, 0, None
                while j < len(events):
                    if events[j] != "zero" and events[j][0] == "new":
                        nxt = j
                        break
                    if events[j] == "zero":
                        zeros += 1
                    j += 1
                if nxt is None:
                    break  # tail joins a refinement EOB run
                while zeros > 15:
                    sc.sym(0xF0)  # ZRL consumes 16 zero-history positions
                    cnt = 0
                    while cnt < 16:
                        if events[i] == "zero":
                            cnt += 1
                        else:
                            sc.bit(events[i][1])
                        i += 1
                    zeros -= 16
                sc.sym((zeros << 4) | 1)
                sc.bit(1 if events[nxt][1] > 0 else 0)  # sign of the new coef
                while i < nxt:  # buffered correction bits, positional order
                    if events[i] != "zero":
                        sc.bit(events[i][1])
                    i += 1
                i = nxt + 1
            if i < len(events):
                eob_run = 1
                eob_bits = [ev[1] for ev in events[i:] if ev != "zero"]
        flush()
        return sc

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dht(tc, th, syms):
        counts = bytes(len(syms) if i == 7 else 0 for i in range(16))
        return bytes([(tc << 4) | th]) + counts + bytes(syms)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(quant for _ in range(64)))
    out += seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([n_comp])
        + b"".join(bytes([cid, 0x11, 0]) for cid in range(1, n_comp + 1)),
    )

    def sos(scan, comps_ids, tc, ss, se, ah, al):
        syms, data = scan.serialize()
        # table ids are always 0 in this encoder; Td<<4|Ta byte:
        body = bytes([len(comps_ids)]) + b"".join(
            bytes([cid, 0x00]) for cid in comps_ids
        ) + bytes([ss, se, (ah << 4) | al])
        return seg(0xC4, dht(tc, 0, syms)) + seg(0xDA, body) + data

    cids = list(range(1, n_comp + 1))
    out += sos(dc_first_scan(), cids, 0, 0, 0, 0, dc_al)
    for ci in range(n_comp):
        out += sos(ac_first_scan(ci), [cids[ci]], 1, 1, 63, 0, ac_al)
    out += sos(dc_refine_scan(), cids, 0, 0, 0, dc_al, dc_al - 1)
    for ci in range(n_comp):
        out += sos(ac_refine_scan(ci), [cids[ci]], 1, 1, 63, ac_al, ac_al - 1)
    out += b"\xff\xd9"
    return bytes(out), blocks


def _flat_patch_gradient(h, w):
    g = _gradient(h, w).copy()
    g[:, w // 2 :] = 100.0  # flat blocks → real EOB runs in the AC scans
    return g


def test_jpeg_progressive_roundtrip_grayscale():
    gray = _flat_patch_gradient(16, 32)
    payload, blocks = _encode_jpeg_progressive(gray, n_comp=1)
    got = _decode_jpeg(payload)
    assert got is not None
    assert got == _expected_features(blocks, 16, 32, 8)
    # cross-check against the independently-tested baseline path: the
    # refinement scans restore full precision, so both encodings of the
    # same quantized blocks must decode to identical features
    base_payload, _ = _encode_jpeg(gray, n_comp=1)
    assert got == _decode_jpeg(base_payload)


def test_jpeg_progressive_three_component():
    gray = _flat_patch_gradient(16, 24)
    payload, blocks = _encode_jpeg_progressive(gray, n_comp=3)
    got = _decode_jpeg(payload)
    assert got is not None
    assert got == _expected_features(blocks, 16, 24, 8)


def test_jpeg_progressive_deeper_successive_approximation():
    gray = _gradient(24, 16)
    payload, blocks = _encode_jpeg_progressive(gray, n_comp=1, dc_al=1, ac_al=1)
    payload2, blocks2 = _encode_jpeg_progressive(gray, n_comp=1, dc_al=2, ac_al=1)
    # dc_al=2 leaves the DC one refinement short (bit 1 never sent) → the
    # decode is a legal partial reconstruction and must differ from full
    full = _decode_jpeg(payload)
    partial = _decode_jpeg(payload2)
    assert full == _expected_features(blocks, 24, 16, 8)
    assert partial is not None and partial != full
