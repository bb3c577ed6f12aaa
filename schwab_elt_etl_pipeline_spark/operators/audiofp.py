"""Audio-fingerprint near-duplicate detection (Haitsma-Kalker shape).

The audio twin of ``operators/phash.py``: the classic "Philips robust
hash" recipe derives one fingerprint bit per (frame, band) cell from the
SIGN of the band-energy difference differentiated along both the band
axis and the time axis::

    bit(n, m) = 1  iff  (E(n,m) - E(n,m+1)) - (E(n-1,m) - E(n-1,m+1)) > 0

(Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR
2002 — public literature). With a 10-frame x 8-band energy grid that is
9 x 7 = 63 sign bits, which drops straight into the shared pigeonhole
Hamming machinery (``operators/phash.py blocked_hamming_pairs``): banded
bucket-join candidates, exact ``bit_count(xor)`` verify, recall 1.0
inside the radius certified by a brute-force all-pairs oracle
(``catalog/multimodal_q.py audio_fp_neardup``).

Exactness discipline: energies are COUNTS (how many samples of a frame
land in each level band), so the whole pipeline — grid, double
difference, sign, bit pack — is exact int64 arithmetic with no float
anywhere; the DuckDB oracle replays it bit-for-bit.

Scale shape: the grid is ONE keyed aggregation (samples -> per-track
(frame, band) counts, map-side combined to <= 80 rows/track) + ONE
groupBy(id) map build; the 63 bits are a single higher-order expression
over that map (the ``viterbi_segment`` discipline — no UDF, no extra
shuffle). Candidates bucket on (block, key) so all-pairs never
materializes. At 100 TB the per-sample explode never leaves its input
partition before the partial aggregate collapses it.

The catalog query derives a deterministic stand-in signal from
``documents`` (sample i = the code point of char i, band = code % 8,
frame = position decile) so the oracle can replay it; REAL audio enters
through :func:`afp_from_pcm` — the stdlib WAV decoder in
``operators/multimodal.py`` already produces PCM ints — pinned by
tests/test_audiofp.py over a real synthesized WAV.

Reference behavior mirrored: the reference has no audio dedup; this is
the LLM-training-pipeline multimodal extension the build brief asks for,
shaped like its text/image near-dup counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.phash import blocked_hamming_pairs

FRAMES = 10  # time frames per track
BANDS = 8  # level bands per frame
BITS = (FRAMES - 1) * (BANDS - 1)  # 63 sign bits


def _e(f: str, b: str) -> str:
    """Energy lookup E(f, b) against the per-track cell map (0 if absent)."""
    return f"coalesce(element_at(em, cast(({f}) * {BANDS} + ({b}) as bigint)), 0L)"


# bit k (k = (n-1)*(BANDS-1) + m; n in 1..FRAMES-1, m in 0..BANDS-2) set iff
# the band-delta D(n,m) = E(n,m) - E(n,m+1) grew since the previous frame.
_B1 = BANDS - 1  # bits per frame-pair; the k -> (n, m) divisor
_BITS_EXPR = f"""
    aggregate(
      sequence(0, {BITS - 1}),
      0L,
      (acc, k) -> acc + CASE WHEN
          ({_e(f"k div {_B1} + 1", f"k % {_B1}")} - {_e(f"k div {_B1} + 1", f"k % {_B1} + 1")})
        - ({_e(f"k div {_B1}", f"k % {_B1}")} - {_e(f"k div {_B1}", f"k % {_B1} + 1")}) > 0
        THEN shiftleft(1L, cast(k as int)) ELSE 0L END
    )"""


def level_cells(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic time x level energy grid from a text column: sample i
    of a track is the code point of char i, its frame is the position
    decile ((i-1)*FRAMES div len) and its band the code point mod BANDS;
    E(frame, band) counts samples — the content-histogram stand-in the
    catalog oracle can replay (real PCM enters via :func:`pcm_cells`).

    Output: (id, frame, band, e) sparse rows; absent cells are zero counts
    and never materialize. Empty-text docs are dropped up front: without
    the guard ``sequence(1, 0)`` would step -1 and emit rows whose
    ``div len`` frame is a NULL map key (a job-killing runtime error in
    :func:`afp63`), while the DuckDB oracle's ``generate_series(1, 0)``
    is empty — the filter keeps both engines on the same (empty) page.
    """
    docs = docs.where(F.length(text_col) > 0)
    chars = docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("len"),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("i"),
        F.col(text_col).alias("_t"),
    )
    return (
        chars.select(
            "id",
            F.expr(f"((i - 1) * {FRAMES}) div len").alias("frame"),
            (F.expr("ascii(substring(_t, i, 1))") % BANDS).alias("band"),
        )
        .groupBy("id", "frame", "band")
        .agg(F.count(F.lit(1)).alias("e"))
    )


def pcm_cells(
    tracks: DataFrame, id_col: str = "media_id", pcm_col: str = "pcm"
) -> DataFrame:
    """REAL-audio bridge: (id, pcm array<long> of 16-bit samples) -> the
    same (id, frame, band, e) grid. Frame = position decile along the
    track; band = (sample + 32768) div 8192 (eight equal amplitude bands
    across the signed-16-bit range) — all-integer, so the fingerprint
    stays exact. The stdlib WAV reader (``operators/multimodal.py
    _decode_audio``) yields exactly these samples."""
    samples = tracks.select(
        F.col(id_col).alias("id"),
        F.size(pcm_col).alias("len"),
        F.posexplode(pcm_col).alias("i0", "s"),
    )
    return (
        samples.select(
            "id",
            F.expr(f"(i0 * {FRAMES}) div len").alias("frame"),
            F.expr("(s + 32768) div 8192").cast("long").alias("band"),
        )
        .groupBy("id", "frame", "band")
        .agg(F.count(F.lit(1)).alias("e"))
    )


def afp63(cells: DataFrame) -> DataFrame:
    """(id, afp): the 63-bit Haitsma-Kalker sign fingerprint of each
    track's sparse (id, frame, band, e) grid. One groupBy(id) builds the
    cell map; the double difference, sign, and bit pack are a single
    higher-order projection over it — no further shuffle."""
    return (
        cells.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("frame") * BANDS + F.col("band")).alias("key"),
                        F.col("e").alias("value"),
                    )
                )
            ).alias("em")
        )
        .select("id", F.expr(_BITS_EXPR).alias("afp"))
    )


def afp_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 8,
    max_hamming: int | None = None,
) -> DataFrame:
    """Fingerprint-then-verify audio near-dup pairs over the deterministic
    text-derived signal: pigeonhole-blocked candidates (guaranteed recall
    for Hamming <= blocks-1), exact Hamming <= the radius as the verdict.
    Output (a_id, b_id, hamming) — certified against the brute-force
    all-pairs oracle like ``phash_verified_pairs``.
    """
    if max_hamming is None:
        max_hamming = blocks - 1
    return blocked_hamming_pairs(
        afp63(level_cells(docs, id_col, text_col)),
        blocks,
        max_hamming,
        hash_col="afp",
        bits=BITS,
    )


def afp_from_pcm(
    tracks: DataFrame, id_col: str = "media_id", pcm_col: str = "pcm"
) -> DataFrame:
    """(id, afp) over REAL PCM tracks — the production entry point; the
    catalog's text-derived path exists only so DuckDB can certify the
    fingerprint algebra end-to-end."""
    return afp63(pcm_cells(tracks, id_col, pcm_col))
