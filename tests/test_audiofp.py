"""Audio fingerprint (Haitsma-Kalker shape): the Spark 63-bit sign
fingerprint must equal a pure-Python reference bit-for-bit (the same
claim the DuckDB all-pairs oracle certifies on the catalog query), the
pigeonhole guard must hold, blocked candidates must lose no pair inside
the radius, and the PCM bridge must agree over a REAL stdlib-decoded
WAV."""

from __future__ import annotations

import io
import random
import struct
import wave

import pytest

from schwab_elt_etl_pipeline_spark.operators.audiofp import (
    afp63,
    afp_from_pcm,
    afp_verified_pairs,
    level_cells,
    pcm_cells,
)


def _py_afp(cells: dict[tuple[int, int], int]) -> int:
    """Reference fingerprint: double-difference sign bits over a sparse
    {(frame, band): energy} grid."""

    def e(f: int, b: int) -> int:
        return cells.get((f, b), 0)

    h = 0
    for k in range(63):
        n, m = k // 7 + 1, k % 7
        if (e(n, m) - e(n, m + 1)) - (e(n - 1, m) - e(n - 1, m + 1)) > 0:
            h |= 1 << k
    return h


def _cells_from_text(text: str) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    n = len(text)
    for i, ch in enumerate(text, start=1):
        key = (((i - 1) * 10) // n, ord(ch) % 8)
        cells[key] = cells.get(key, 0) + 1
    return cells


def _cells_from_pcm(samples: list[int]) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    n = len(samples)
    for i, s in enumerate(samples):
        key = ((i * 10) // n, (s + 32768) // 8192)
        cells[key] = cells.get(key, 0) + 1
    return cells


def test_afp63_matches_python_reference(spark):
    rng = random.Random(13)
    texts = [
        "".join(rng.choice("abcdefgh ijklmnop") for _ in range(rng.randint(40, 200)))
        for _ in range(6)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.id: r.afp for r in afp63(level_cells(docs)).collect()}
    assert got == {i: _py_afp(_cells_from_text(t)) for i, t in enumerate(texts)}


def test_afp_verified_pairs_finds_near_dup_not_distinct(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("theta", "thetaq", 1)  # one char inserted
    far = "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {
        (r.a_id, r.b_id): r.hamming for r in afp_verified_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 7
    assert (1, 3) not in pairs and (2, 3) not in pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        afp_verified_pairs(docs, blocks=8, max_hamming=8)


def test_afp_blocked_candidates_lose_nothing_inside_radius(spark):
    """Verified pairs == brute-force all-pairs Hamming <= radius (recall
    1.0 inside the pigeonhole radius, exactly what the catalog oracle
    certifies at scale)."""
    rng = random.Random(29)
    vocab = ["alpha", "beta", "gamma", "delta", "zeta", "kappa"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(20, 60)))
        for _ in range(24)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fps = {i: _py_afp(_cells_from_text(t)) for i, t in enumerate(texts)}
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 7
    }
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in afp_verified_pairs(docs, blocks=8, max_hamming=7).collect()
    }
    assert got == want


def test_afp_from_pcm_real_wav(spark):
    """End-to-end over REAL audio: synthesize a 16-bit mono WAV, decode it
    with the stdlib reader (the ``operators/multimodal.py`` path), and the
    PCM-bridge fingerprint must match the Python reference over the same
    samples; a quieter rendition of the same signal stays near, a
    different signal does not pair."""

    def triangle(n: int, period: int, amp: int) -> list[int]:
        return [
            amp * (abs((i % period) - period // 2) - period // 4) // (period // 4)
            for i in range(n)
        ]

    sig = triangle(800, 80, 30000)
    quiet = [s * 7 // 8 for s in sig]
    other = [((i * 2654435761) % 65536) - 32768 for i in range(800)]

    def to_wav(samples: list[int]) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    def from_wav(payload: bytes) -> list[int]:
        with wave.open(io.BytesIO(payload), "rb") as w:
            raw = w.readframes(w.getnframes())
        return list(struct.unpack(f"<{len(raw) // 2}h", raw))

    decoded = {i: from_wav(to_wav(s)) for i, s in enumerate([sig, quiet, other])}
    assert decoded[0] == sig  # the WAV round-trip is lossless

    tracks = spark.createDataFrame(
        [(i, s) for i, s in decoded.items()], "media_id long, pcm array<long>"
    )
    got = {r.id: r.afp for r in afp_from_pcm(tracks).collect()}
    want = {i: _py_afp(_cells_from_pcm(s)) for i, s in decoded.items()}
    assert got == want

    ham = lambda a, b: bin(got[a] ^ got[b]).count("1")  # noqa: E731
    assert ham(0, 1) <= 7  # same signal, lower gain -> near
    assert ham(0, 2) > 7  # different signal -> far


def test_pcm_cells_bands_and_frames(spark):
    tracks = spark.createDataFrame(
        [(5, [-32768, -1, 0, 32767])], "media_id long, pcm array<long>"
    )
    rows = {(r.frame, r.band): r.e for r in pcm_cells(tracks).collect()}
    # positions 0..3 over 4 samples -> frames 0, 2, 5, 7; bands 0, 3, 4, 7
    assert rows == {(0, 0): 1, (2, 3): 1, (5, 4): 1, (7, 7): 1}


def test_level_cells_drops_empty_docs(spark):
    """Empty-text docs must vanish before the explode: sequence(1, 0)
    steps -1 and would emit a NULL-frame row that kills afp63 with a
    NULL map key — while the DuckDB oracle's generate_series(1, 0) is
    simply empty. Both engines now agree: no fingerprint row."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "abcdef")], "doc_id long, text string"
    )
    cells = level_cells(docs)
    assert {r.id for r in cells.collect()} == {2}
    fps = afp63(cells).collect()  # must not raise on the mixed corpus
    assert [r.id for r in fps] == [2]
