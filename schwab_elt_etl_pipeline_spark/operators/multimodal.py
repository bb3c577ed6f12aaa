"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, and runs decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages — the only places Python belongs in the
hot path, because codec work can't be expressed as Spark expressions.

Codec selection is a TRY-IMPORT: when Pillow is importable the image kernels
decode/resize real payloads (per executor-side batch — the import happens in
the worker, never on the driver path); otherwise, and for any payload the
codec rejects, a deterministic byte-derived stub keeps the pipeline testable
end-to-end. The Spark-side plumbing — schema, Arrow batch iteration,
partition sizing, UDF signature — is identical in both modes, so tests and
oracles pin it regardless of which codec is present.
"""

from __future__ import annotations

import array
import hashlib
import io
import math
import sys
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional real image codec — absent in this container, used if present
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAS_PIL = False

#: media row: opaque payload + typed metadata (schema contract for sources)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_one_stub(payload: bytes) -> list[float]:
    """STUB decode: deterministic pseudo-features from the payload bytes —
    the fallback when no codec is importable or the payload isn't decodable
    (synthetic test payloads land here by design, keeping oracles stable)."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) > 44
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _decode_audio(payload: bytes) -> list[float] | None:
    """REAL audio decode via the stdlib ``wave`` reader (no external codec
    needed): 16-bit PCM frames → FEATURE_DIM mean-absolute-amplitude
    features over equal time slices of the first channel, normalized to
    [0, 1]. Returns None for parameters the kernel doesn't handle (then the
    caller falls back to the stub) — never raises into the executor."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n, ch, sw = w.getnframes(), w.getnchannels(), w.getsampwidth()
            raw = w.readframes(n)
    except Exception:
        return None
    if sw != 2 or n == 0 or ch == 0:
        return None
    samples = array.array("h")
    samples.frombytes(raw[: (len(raw) // (2 * ch)) * 2 * ch])
    if sys.byteorder == "big":  # WAV is little-endian
        samples.byteswap()
    mono = samples[::ch]
    size = len(mono)
    if size == 0:
        return None
    feats = []
    for i in range(FEATURE_DIM):
        lo, hi = i * size // FEATURE_DIM, (i + 1) * size // FEATURE_DIM
        seg = mono[lo:hi]
        feats.append(
            (sum(abs(s) for s in seg) / len(seg)) / 32768.0 if seg else 0.0
        )
    return feats


def _gray_slice_features(gray: list[float]) -> list[float]:
    """FEATURE_DIM box-averaged slices of a [0,1] grayscale pixel run.

    Same SHAPE as the Pillow path's thumbnail signature, not bit-identical
    to it (Pillow uses integer ITU-R 601 luma + bicubic resampling). The
    stdlib kernels run BEFORE the Pillow branch precisely so WAV/PPM/BMP/PNG
    features are environment-independent: adding or removing Pillow never
    changes the feature values of formats these kernels own."""
    size = len(gray)
    out = []
    for i in range(FEATURE_DIM):
        seg = gray[i * size // FEATURE_DIM : (i + 1) * size // FEATURE_DIM]
        out.append(sum(seg) / len(seg) if seg else 0.0)
    return out


def _decode_ppm(payload: bytes) -> list[float] | None:
    """REAL image decode for binary PPM (P6), pure stdlib: header parse +
    raw RGB triplets → luma → slice features. None when not P6/8-bit."""
    try:
        if not payload.startswith(b"P6"):
            return None
        # header: P6 <width> <height> <maxval> then one whitespace byte
        fields, pos = [], 2
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        rgb = payload[pos : pos + 3 * w * h]
        if len(rgb) < 3 * w * h:
            return None
        gray = [
            (0.299 * rgb[i] + 0.587 * rgb[i + 1] + 0.114 * rgb[i + 2]) / 255.0
            for i in range(0, 3 * w * h, 3)
        ]
        return _gray_slice_features(gray)
    except Exception:
        return None


def _decode_bmp(payload: bytes) -> list[float] | None:
    """REAL image decode for uncompressed 24-bit BMP, pure stdlib: BITMAPINFO
    header + padded BGR rows (bottom-up) → luma → slice features."""
    try:
        if not payload.startswith(b"BM") or len(payload) < 54:
            return None
        offset = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        rows = abs(h)
        stride = (3 * w + 3) // 4 * 4
        if len(payload) < offset + stride * rows:
            return None
        gray = []
        order = range(rows - 1, -1, -1) if h > 0 else range(rows)  # bottom-up
        for r in order:
            base = offset + r * stride
            for c in range(w):
                b, g, rr = payload[base + 3 * c : base + 3 * c + 3]
                gray.append((0.299 * rr + 0.587 * g + 0.114 * b) / 255.0)
        return _gray_slice_features(gray)
    except Exception:
        return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> list[float] | None:
    """REAL image decode for 8-bit RGB/RGBA PNG, pure stdlib: chunk walk +
    zlib inflate + full filter reconstruction (None/Sub/Up/Average/Paeth)
    → luma → slice features. Palette/16-bit/interlaced → None (stub)."""
    try:
        if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
            return None
        pos, w, h, depth, ctype, interlace, idat = 8, None, None, None, None, None, b""
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln  # length + type + data + crc
            if typ == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ctype, interlace = data[8], data[9], data[12]
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if not w or not h or depth != 8 or ctype not in (2, 6) or interlace:
            return None
        ch = 3 if ctype == 2 else 4
        raw = zlib.decompress(idat)
        stride = w * ch
        if len(raw) < h * (stride + 1):
            return None
        gray: list[float] = []
        prev = bytearray(stride)
        at = 0
        for _ in range(h):
            ftype = raw[at]
            line = bytearray(raw[at + 1 : at + 1 + stride])
            at += 1 + stride
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 2:
                    line[i] = (line[i] + b) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
                elif ftype != 0:
                    return None
            for x in range(w):
                r, g, bl = line[x * ch], line[x * ch + 1], line[x * ch + 2]
                gray.append((0.299 * r + 0.587 * g + 0.114 * bl) / 255.0)
            prev = line
        return _gray_slice_features(gray)
    except Exception:
        return None


#: zigzag scan order → natural (row*8+col) coefficient index
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_IDCT_M = None  # lazy 8×8 DCT-III basis (numpy), built once per worker


class _JpegBits:
    """MSB-first bit reader over entropy-coded JPEG data: un-stuffs
    0xFF 0x00, stops at any real marker (restart handling consumes RSTn
    explicitly via :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.bit = data, pos, 0

    def _cur(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise EOFError
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt != 0x00:  # a real marker terminates entropy data
                raise EOFError
        return b

    def read_bit(self) -> int:
        b = self._cur()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1  # skip the stuffed 0x00
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict) -> int:
        code, size = 0, 0
        while size <= 16:
            code = (code << 1) | self.read_bit()
            size += 1
            sym = table.get((size, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RST marker")
        self.pos += 2


def _jpeg_extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_decode_block(
    reader, blk, Ss, Se, Ah, Al, dct, act, pred, ci, eobrun
):
    """Decode ONE block's contribution from the current scan into ``blk``
    (a 64-int coefficient list), covering every Huffman scan kind T.81
    defines: sequential (Ss=0, Se=63, Ah=Al=0 — DC + AC in one pass),
    progressive DC first (Ss=Se=0, Ah=0: diff-coded, stored << Al),
    progressive DC refinement (Ah>0: one bit, OR-ed at Al), progressive AC
    first (Ss>0, Ah=0: run/size with EOBn band-skip runs), and progressive
    AC refinement (Ss>0, Ah>0: the libjpeg jdphuff correction-bit walk —
    newly visible coefficients arrive as ±1<<Al, history coefficients read
    one correction bit each in positional order). Returns the remaining
    EOB-run count (blocks after this one still inside the band skip)."""
    zz = _JPEG_ZIGZAG
    if Ss == 0:  # scan carries DC
        if Ah == 0:
            t = reader.huff(dct)
            pred[ci] += _jpeg_extend(reader.receive(t), t)
            blk[0] = pred[ci] << Al
        elif reader.read_bit():
            blk[0] |= 1 << Al
        if Se == 0:
            return eobrun  # progressive DC-only scan
        k = 1
    else:
        k = Ss
    if Ah == 0:  # sequential AC / progressive AC-first band
        if Ss > 0 and eobrun > 0:
            return eobrun - 1  # whole band skipped by an EOB run
        while k <= Se:
            rs = reader.huff(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1  # this block consumes one
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += 16
                continue
            k += r
            if k > Se:
                raise ValueError("AC run past band end")
            blk[zz[k]] = _jpeg_extend(reader.receive(s), s) << Al
            k += 1
        return eobrun
    # progressive AC refinement (Ss > 0, Ah > 0)
    p1, m1 = 1 << Al, -1 << Al

    def correct(z):
        if reader.read_bit() and (blk[z] & p1) == 0:
            blk[z] += p1 if blk[z] >= 0 else m1

    if eobrun == 0:
        while k <= Se:
            rs = reader.huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: a run of 16 zero-history positions, no placement
            else:  # s must be 1 in a refinement scan
                val = p1 if reader.read_bit() else m1
            while k <= Se:  # advance: history coefs read bits, zeros eat r
                z = zz[k]
                if blk[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                blk[zz[k]] = val
            k += 1
    if eobrun > 0:  # EOB: refine every remaining history coef in the band
        while k <= Se:
            z = zz[k]
            if blk[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg(payload: bytes) -> list[float] | None:
    """REAL image decode for Huffman JPEG — baseline/extended-sequential
    (SOF0/SOF1, interleaved or per-component scans, restart markers) AND
    progressive (SOF2: interleaved DC first/refinement scans, per-component
    AC first/refinement scans with EOB-run band skips, successive
    approximation) — pure stdlib + numpy (IDCT as two 8×8 matmuls). Scans
    accumulate into one luma coefficient grid and dequant+IDCT runs once at
    the end. Only the LUMA component is inverse-transformed (features are
    grayscale); chroma blocks inside interleaved scans are entropy-decoded
    to keep the bitstream in sync then discarded, and pure-chroma scans are
    skipped wholesale (their entropy data carries no luma bits — the
    per-scan structure progressive decoding requires anyway). Arithmetic
    coding, lossless/hierarchical modes, 12-bit precision, and 16-bit quant
    tables → None (stub fallback)."""
    try:
        if not payload.startswith(b"\xff\xd8"):
            return None
        import numpy as np

        global _JPEG_IDCT_M
        if _JPEG_IDCT_M is None:
            m = np.empty((8, 8))
            for u in range(8):
                cu = (1.0 / math.sqrt(2)) if u == 0 else 1.0
                for x in range(8):
                    m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
            _JPEG_IDCT_M = m
        qt: dict[int, list[int]] = {}
        hufftabs: dict[tuple[int, int], dict] = {}
        comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
        w = h = None
        restart = 0
        pos = 2
        # (scan comps, Ss, Se, Ah, Al, data_start, restart, table snapshot)
        scans: list[tuple] = []
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue  # no segment body
            if marker == 0xD9:
                break
            ln = int.from_bytes(payload[pos : pos + 2], "big")
            seg = payload[pos + 2 : pos + ln]
            if marker == 0xDB:  # DQT (possibly several tables)
                at = 0
                while at < len(seg):
                    if seg[at] >> 4:
                        return None  # 16-bit quant tables → unsupported
                    tid = seg[at] & 0x0F
                    tbl = [0] * 64
                    for i in range(64):
                        tbl[_JPEG_ZIGZAG[i]] = seg[at + 1 + i]
                    qt[tid] = tbl
                    at += 65
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
                if seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                n = seg[5]
                comps = [
                    (seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                     seg[7 + 3 * i] & 0x0F, seg[8 + 3 * i])
                    for i in range(n)
                ]
            elif marker == 0xC4:  # DHT (possibly several tables)
                at = 0
                while at < len(seg):
                    tc, th = seg[at] >> 4, seg[at] & 0x0F
                    counts = seg[at + 1 : at + 17]
                    syms = seg[at + 17 : at + 17 + sum(counts)]
                    table, code, si = {}, 0, 0
                    for size in range(1, 17):
                        for _ in range(counts[size - 1]):
                            table[(size, code)] = syms[si]
                            code += 1
                            si += 1
                        code <<= 1
                    hufftabs[(tc, th)] = table
                    at += 17 + sum(counts)
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS: record the scan, skip entropy data
                if not comps:
                    return None
                ns = seg[0]
                cid_index = {c[0]: i for i, c in enumerate(comps)}
                sc = [
                    (cid_index[seg[1 + 2 * i]], seg[2 + 2 * i] >> 4,
                     seg[2 + 2 * i] & 0x0F)
                    for i in range(ns)
                ]
                Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                data_start = pos + ln
                p = data_start  # entropy data ends at the next real marker
                while p + 1 < len(payload):
                    if payload[p] != 0xFF:
                        p += 1
                    elif payload[p + 1] == 0x00 or 0xD0 <= payload[p + 1] <= 0xD7:
                        p += 2
                    else:
                        break
                scans.append(
                    (sc, Ss, Se, ahal >> 4, ahal & 0x0F, data_start,
                     restart, dict(hufftabs))
                )
                pos = p
                continue
            elif marker == 0xC3 or 0xC5 <= marker <= 0xCF:
                return None  # lossless / arithmetic / hierarchical
            pos += ln
        if not scans or not comps or w is None:
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        dims = []  # per-comp non-interleaved block grid (bw, bh)
        for _cid, ch, cv, _tq in comps:
            cw = (w * ch + hmax - 1) // hmax
            chh = (h * cv + vmax - 1) // vmax
            dims.append(((cw + 7) // 8, (chh + 7) // 8))
        ly = comps[0]  # luma is the first SOF component by convention
        gw, gh = mcux * ly[1], mcuy * ly[2]  # padded (interleaved) luma grid
        coef_y = [[0] * 64 for _ in range(gw * gh)]
        for sc, Ss, Se, Ah, Al, dstart, rst, tabs in scans:
            if all(ci != 0 for ci, _d, _a in sc):
                continue  # pure-chroma scan: no luma bits in its data
            reader = _JpegBits(payload, dstart)
            pred = [0] * len(comps)
            eobrun = 0
            if len(sc) == 1:  # non-interleaved: MCU = one block, comp grid
                ci, dc_id, ac_id = sc[0]
                bw, bh = dims[ci]
                for bi in range(bw * bh):
                    if rst and bi and bi % rst == 0:
                        reader.restart()
                        pred = [0] * len(comps)
                        eobrun = 0
                    by, bx = divmod(bi, bw)
                    eobrun = _jpeg_decode_block(
                        reader, coef_y[by * gw + bx], Ss, Se, Ah, Al,
                        tabs.get((0, dc_id)), tabs.get((1, ac_id)),
                        pred, ci, eobrun,
                    )
            else:  # interleaved MCU scan (all of sequential; progressive DC)
                for mcu in range(mcux * mcuy):
                    if rst and mcu and mcu % rst == 0:
                        reader.restart()
                        pred = [0] * len(comps)
                        eobrun = 0
                    my, mx = divmod(mcu, mcux)
                    for ci, dc_id, ac_id in sc:
                        _, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = (
                                    coef_y[(my * cv + by) * gw + mx * ch + bx]
                                    if ci == 0
                                    else [0] * 64  # sync-only chroma decode
                                )
                                eobrun = _jpeg_decode_block(
                                    reader, blk, Ss, Se, Ah, Al,
                                    tabs.get((0, dc_id)),
                                    tabs.get((1, ac_id)),
                                    pred, ci, eobrun,
                                )
        plane = np.zeros((gh * 8, gw * 8))
        lq = np.array(qt[ly[3]], dtype=float).reshape(8, 8)
        M = _JPEG_IDCT_M
        for i, blk in enumerate(coef_y):
            row, col = divmod(i, gw)
            block = M.T @ (np.array(blk, dtype=float).reshape(8, 8) * lq) @ M
            plane[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = block
        lh = (h * ly[2] + vmax - 1) // vmax
        lw = (w * ly[1] + hmax - 1) // hmax
        gray = np.clip(plane[:lh, :lw] + 128.0, 0.0, 255.0) / 255.0
        return _gray_slice_features([float(x) for x in gray.ravel()])
    except Exception:
        return None


def _decode_one(payload: bytes) -> list[float]:
    """Feature kernel: WAV audio and PPM/BMP/PNG/baseline-JPEG images decode
    for real through pure-stdlib readers (always available, and taking
    precedence so those formats' features never depend on which codecs are
    installed);
    with Pillow present, any OTHER image format decodes to a grayscale
    signature of the same shape (Pillow's own luma/resampling weights);
    otherwise — or when the bytes aren't decodable — the deterministic
    stub."""
    if _is_wav(payload):
        feats = _decode_audio(payload)
        if feats is not None:
            return feats
    if payload:
        for kernel in (_decode_ppm, _decode_bmp, _decode_png, _decode_jpeg):
            feats = kernel(payload)
            if feats is not None:
                return feats
    if HAS_PIL and payload:
        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("L")
            thumb = img.resize((FEATURE_DIM, 1))
            return [p / 255.0 for p in thumb.getdata()]
        except Exception:
            pass  # not a decodable image → stub fallback
    return _decode_one_stub(payload)


def decode_stub_features(media: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    Batch shape: the iterator yields pandas frames of Arrow-batch size;
    payloads never round-trip through the driver. Partition count governs
    parallelism — repartition upstream if media blobs are few-but-huge.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "features": pdf["payload"].map(_decode_one),
                }
            )

    return media.mapInPandas(decode_batches, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Binary→binary transform plumbing (image resize shape): ``mapInPandas``
    stage that rewrites the payload and the typed metadata in one pass.

    Kernel: with Pillow present, decodable payloads are REALLY resized and
    re-encoded (PNG); otherwise — or for undecodable bytes — the payload is
    truncated in proportion to the pixel-count change (deterministic stub).
    What this pins down in both modes: output schema keeps the binary column
    + meta struct contract, payloads stay executor-side, and the stage
    preserves row count and partitioning."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(row):
                payload = row["payload"] or b""
                if HAS_PIL and payload:
                    try:
                        img = _PILImage.open(io.BytesIO(payload))
                        buf = io.BytesIO()
                        img.resize((width, height)).save(buf, format="PNG")
                        return buf.getvalue()
                    except Exception:
                        pass  # undecodable → stub fallback below
                meta = row["meta"] or {}  # meta is nullable in MEDIA_SCHEMA
                old_px = max((meta.get("width") or 1) * (meta.get("height") or 1), 1)
                keep = max(1, int(len(payload) * min(1.0, width * height / old_px)))
                return payload[:keep]

            def remeta(m):
                m = m or {}
                return {
                    "width": width,
                    "height": height,
                    "duration_ms": m.get("duration_ms"),
                    "sample_rate": m.get("sample_rate"),
                }

            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf.apply(shrink, axis=1),
                    "meta": pdf["meta"].map(remeta),
                }
            )
            yield out

    return media.mapInPandas(resize_batches, schema=_RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: the sample timestamps are a
    native ``sequence`` explode (pure Spark); only the per-frame decode would
    be a ``mapInPandas`` stage (stubbed out, same shape as
    :func:`decode_stub_features`)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_at_ms"),
        )
    )
