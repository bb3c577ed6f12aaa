"""Perceptual-hash (pHash) image near-duplicate detection.

The multimodal twin of SimHash text dedup: a 64-bit signature over an
image's 8x8 luma thumbnail via the 2-D DCT (the classic pHash recipe:
DCT the luma grid, keep the low-frequency block, threshold each AC
coefficient against the block mean), then pigeonhole-blocked Hamming
candidates exactly like ``operators/dedup.py simhash_block_candidates``
and an exact-Hamming verify.

Exactness discipline: the DCT runs in FIXED-POINT INTEGER arithmetic —
the cosine basis is rounded once to 14-bit integers (``CT``, generated
from ``math.cos`` at import and embedded as literals on BOTH the Spark
and the oracle side), so every coefficient, the mean threshold, and every
hash bit are exact int64 expressions with no float divergence anywhere.
Magnitude bound: |coeff| <= 64 * 255 * 16384^2 ~ 4.4e12, far inside
int64.

Scale shape: the hash is ONE keyed aggregation (the DCT's 63
multiply-add sums run inside it, codegen'd and map-side combinable)
followed by pure staged projections (no UDF, no extra shuffle); candidate
generation buckets on (block, key) so all-pairs never materializes, and
the verify is a bit_count over the joined signatures. Pigeonhole
guarantee: with B blocks over the 63 AC bits, every pair with Hamming
distance <= B-1 shares at least one exact block — recall 1.0 inside the
radius, certified by the brute-force all-pairs oracle on the catalog
query (``catalog/multimodal_q.py image_phash_neardup``).

Reference behavior mirrored: the reference has no image dedup; this is
the LLM-training-pipeline extension the build brief asks for, shaped
like its text near-dup counterparts (reference tools/schwab.py has only
text-keyed dedup guards).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 14-bit fixed-point DCT-II basis: CT[u*8+x] = round(cos((2x+1)*u*pi/16) * 2^14).
# Generated once from math.cos and embedded as integer literals in both
# engines' plans — the same literal-lookup trick as operators/recurrence.py.
CT = [round(math.cos((2 * x + 1) * u * math.pi / 16) * 16384) for u in range(8) for x in range(8)]

# The basis enters the Spark plan as ONE ArrayType Literal node (numpy lit),
# not a CreateArray of 64 Literal children: PySpark re-analyzes the whole
# logical tree on every DataFrame transformation, and 16 x 64 literal nodes
# made that driver-side analysis the dominant cost of the image query at
# sf0.1 (constant, data-size-independent). Same values, same evaluation.
# (Function, not module constant: F.lit needs an active SparkContext.)
def _ct_lit() -> F.Column:
    return F.lit(np.asarray(CT, dtype=np.int64))


# Constructed-once Column fragments for phash64, keyed on the owning
# SparkContext (r14, guide §4.5 "initialise heavyweight state once" applied
# to the DRIVER): the 63 aggregate sums + 16 basis factors cost ~80 py4j
# round-trips and JVM parses per build, a pure per-invocation constant
# (~0.2 s at any SF) that bench best-of-N re-pays every round. Columns are
# UNRESOLVED plan fragments — caching them caches no data and no results;
# a new/restarted SparkContext invalidates the cache (the JVM objects die
# with the context). Reuse of one fragment across many plans is the normal
# Column contract (each plan analyzes it independently).
_FRAG: dict[str, object] = {}
_FRAG_CTX: object = None


def _fragments() -> dict:
    global _FRAG, _FRAG_CTX
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is not _FRAG_CTX or not _FRAG:
        ct = _ct_lit()
        _FRAG = {
            "factors": [
                F.element_at(ct, F.expr(f"cast({u} * 8 + cell % 8 + 1 as int)")).alias(
                    f"_cu{u}"
                )
                for u in range(8)
            ]
            + [
                F.element_at(ct, F.expr(f"cast({v} * 8 + cell div 8 + 1 as int)")).alias(
                    f"_cv{v}"
                )
                for v in range(8)
            ],
            "sums": [
                F.expr(f"sum(px * _cu{uv // 8} * _cv{uv % 8}) AS _c{uv}")
                for uv in range(1, 64)
            ],
            "ac": F.expr(
                "array(" + ",".join(f"coalesce(_c{uv}, 0L)" for uv in range(1, 64)) + ")"
            ).alias("ac"),
            "sac": F.expr("aggregate(ac, 0L, (a, c) -> a + c)").alias("sac"),
            "bits": F.expr(_BITS_EXPR).alias("phash"),
        }
        _FRAG_CTX = sc
    return _FRAG


def luma_cells(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic 8x8 bag-of-words luma thumbnail: every whitespace word
    lands in one of 64 cells keyed by (length, first-char) and the cell's
    pixel is its clamped word count — a content histogram, so word-order
    edits and small mutations move few pixels (the property pHash needs
    from a real thumbnail). This is the catalog's stand-in for a decoded
    image (the real decode path is ``operators/multimodal.py``; the bridge
    from its luma blocks is :func:`phash_from_luma_array`, pinned by
    tests/test_phash.py over real stdlib-decoded PNGs).

    Output: (id, cell, px) sparse rows — absent cells are zero pixels,
    which contribute nothing to the DCT sums and so never materialize.
    """
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"),
    )
    return (
        words.select(
            "id",
            ((F.length("w") * 31 + F.ascii("w")) % 64).cast("long").alias("cell"),
        )
        .groupBy("id", "cell")
        .agg(F.least(F.count(F.lit(1)), F.lit(255)).cast("long").alias("px"))
    )


# bit uv-1 set iff 63*coeff(uv) > sum(AC) — the integer-exact mean
# threshold (no division anywhere).
_BITS_EXPR = """
    aggregate(
      sequence(1, 63),
      0L,
      (acc, uv) -> acc + CASE
        WHEN 63 * element_at(ac, uv) > sac
        THEN shiftleft(1L, cast(uv - 1 as int)) ELSE 0L END
    )"""


def phash64(cells: DataFrame) -> DataFrame:
    """(id, phash): the 63-AC-bit perceptual hash of each image's sparse
    (id, cell, px) luma rows.

    The 2-D DCT runs INSIDE the one groupBy(id) as 63 codegen'd
    multiply-add sum aggregates (r13 optimization, guide §1.2 "per-task
    work" / §2.3 "aggregate before you shuffle"): each sparse cell row
    contributes px * CT[u,x] * CT[v,y] to coeff(u*8+v), so
    coeff(uv) = SUM(px * CT[(uv div 8)*8 + cell%8] * CT[(uv%8)*8 + cell div 8])
    is a plain hash-aggregate column — whole-stage codegen'd and map-side
    combinable, where the former per-row higher-order-function DCT
    (63 x |entries| interpreted lambda iterations with O(|entries|) map
    probes per hash) ran ~3x slower (A/B at sf0.1: 3.32s -> 1.03s,
    bit-identical). Absent cells contribute 0 exactly as in the sparse
    contract; the mean threshold and bit pack are staged projections over
    the aggregation — no further shuffle.

    Exactness: the same integer products as the uv-major loop, summed in
    a different order — int64 addition is associative/commutative and
    |coeff| <= 64 * 255 * 16384^2 ~ 4.4e12, far inside int64, so every
    coefficient is the identical int64 the HOF form produced.

    Plan-size discipline: the 16 cosine factors CT[u,x] (u=0..7) and
    CT[v,y] (v=0..7) are projected ONCE per cell row BELOW the aggregate,
    so each aggregate column is a plain 3-column product sum instead of
    re-inlining the basis array twice per coefficient (126 copies -> 16;
    the query is re-built and re-analyzed per invocation, and that
    constant per-invocation analysis cost dominated the whole image query
    at sf0.1) — and each factor references the basis as ONE ArrayType
    Literal node (``_CT_LIT``), not a 64-child CreateArray, so every
    re-analysis pass walks 16 nodes instead of ~1k. Aggregate-over-Project
    is not collapsed by the optimizer, so the factoring survives into the
    physical plan."""
    # Single-string expressions, constructed ONCE per SparkContext
    # (``_fragments``): each F.expr / selectExpr is ONE py4j round-trip
    # parsed on the JVM — the equivalent Column-API construction (63 x
    # sum(col*col*col).alias, 63 x coalesce(...) array entries) cost ~1.3 s
    # of driver-side chatter per invocation, and re-parsing even the string
    # forms re-paid ~0.2 s per build (constant, data-size-independent).
    frag = _fragments()
    factors = cells.select("id", "px", *frag["factors"])
    coeffs = factors.groupBy("id").agg(*frag["sums"])
    return (
        coeffs.select("id", frag["ac"])
        .select("id", "ac", frag["sac"])
        .select("id", frag["bits"])
    )


def phash_blocked(
    hashes: DataFrame,
    blocks: int = 5,
    hash_col: str = "phash",
    bits: int = 63,
) -> DataFrame:
    """(id, <hash_col>, block, key): the ``bits`` hash bits cut into
    ``blocks`` contiguous chunks — the bucketable pigeonhole form, one row
    per chunk (``simhash_blocked``'s layout, sig precomputed). Generic over
    the signature column so the audio fingerprint (``operators/audiofp.py``)
    reuses the same candidate machinery."""
    base, rem = divmod(bits, blocks)
    chunks, start = [], 0
    for bk in range(blocks):
        w = base + (1 if bk < rem else 0)
        chunks.append(
            F.struct(
                F.lit(bk).alias("block"),
                F.shiftrightunsigned(hash_col, start)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("key"),
            )
        )
        start += w
    return hashes.select(
        "id", hash_col, F.explode(F.array(*chunks)).alias("bb")
    ).select("id", hash_col, "bb.block", "bb.key")


def blocked_hamming_pairs(
    hashes: DataFrame,
    blocks: int,
    max_hamming: int,
    hash_col: str = "phash",
    bits: int = 63,
) -> DataFrame:
    """Pigeonhole-blocked Hamming pairs over any (id, <hash_col>) signature
    table: bucket-join candidates (guaranteed recall for Hamming <=
    blocks-1), exact ``bit_count(xor)`` verify. Output (a_id, b_id,
    hamming). Shared by the image-pHash and audio-fingerprint near-dup
    paths — one candidate-generation definition, certified by BOTH
    brute-force all-pairs oracles."""
    if max_hamming > blocks - 1:
        raise ValueError(
            f"pigeonhole recall only guaranteed to hamming {blocks - 1}; "
            f"got max_hamming={max_hamming}"
        )
    # pin the signature table (16 bytes/doc, corpus-text-free) so the
    # upstream tokenize/DCT pipeline runs once, not once per join side
    hashes = hashes.localCheckpoint(eager=True)
    banded = phash_blocked(hashes, blocks, hash_col, bits)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
    )


def phash_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 5,
    max_hamming: int | None = None,
) -> DataFrame:
    """pHash-then-verify image near-dup pairs: pigeonhole-blocked candidates
    (guaranteed recall for Hamming <= blocks-1), exact Hamming <= the radius
    as the verdict. Output (a_id, b_id, hamming) — certified against the
    brute-force all-pairs oracle like ``minhash_verified_pairs``.

    More blocks widen the guaranteed radius but loosen the buckets
    (63/blocks bits of selectivity each) — the HmSearch trade-off; at
    corpus scale the bucket join is the only shuffle past the hash build.
    """
    if max_hamming is None:
        max_hamming = blocks - 1
    return blocked_hamming_pairs(
        phash64(luma_cells(docs, id_col, text_col)), blocks, max_hamming
    )


def phash_from_luma_array(
    imgs: DataFrame, id_col: str = "media_id", luma_col: str = "luma"
) -> DataFrame:
    """Bridge from a REAL decode: (id, luma array<long> of 64 row-major
    pixels) -> (id, phash). The multimodal decoders
    (``operators/multimodal.py``) produce luma grids from PNG/JPEG bytes;
    downsample to 8x8, pack row-major, and hash here — same expression,
    same exactness (pinned over stdlib-decoded PNGs in tests/test_phash.py).
    """
    cells = imgs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(luma_col)).alias("cell", "px"),
    ).filter(F.col("px") != 0)
    return phash64(cells.select("id", F.col("cell").cast("long"), F.col("px").cast("long")))


def check_frame_composite(frames: int) -> None:
    """Guard the id*16+frame composite key used by the video pHash paths.

    The frame rides in the low 4 bits of the composite id, so
    ``frames > 16`` would silently alias frames into NEIGHBORING videos'
    composite ids (corrupted pairs, no error) — raise instead, the same
    discipline as the MMR pool bound (``operators/similarity.py``).
    Callers also require non-negative integral doc ids: ``div``/``%``
    truncate toward zero, so a negative id would decompose wrongly, and
    a non-numeric id nulls out the arithmetic — both silently.
    """
    if not 1 <= frames <= 16:
        raise ValueError(
            f"frames must be in [1, 16]: the composite key id*16+frame has "
            f"4 bits of frame space and more would silently collide ids; "
            f"got frames={frames}"
        )


def video_frame_cells(
    docs: DataFrame,
    frames: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-frame 8x8 luma thumbnails for the video catalog
    stand-in: frame ``f`` rotates the content histogram's cell key by
    ``7f`` (a content-preserving permutation, so copies and near-copies
    of a video produce matching frame sequences — the property per-frame
    video dedup needs). Real decoded frames enter per frame through
    :func:`phash_from_luma_array`. Output: (id, frame, cell, px).

    The token stream is aggregated ONCE on the frame-0 base cell — the
    per-frame rotation ``(base + 7f) % 64`` is a bijection mod 64, so
    per-(id, frame, cell) counts equal per-(id, base) counts and the
    ``frames``x expansion can run AFTER the groupBy, over the <=64-row
    per-doc histogram instead of the raw word stream. The shuffle is 1x
    the words regardless of frame count (previously ``frames``x)."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"),
    )
    base = (
        words.select(
            "id",
            ((F.length("w") * 31 + F.ascii("w")) % 64).cast("long").alias("base"),
        )
        .groupBy("id", "base")
        .agg(F.least(F.count(F.lit(1)), F.lit(255)).cast("long").alias("px"))
    )
    return base.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(frames - 1))).alias("frame"),
        "base",
        "px",
    ).select(
        "id",
        "frame",
        ((F.col("base") + F.col("frame") * 7) % 64).alias("cell"),
        "px",
    )


def video_phash_pairs(
    docs: DataFrame,
    frames: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 5,
    max_hamming: int = 4,
    min_frames: int = 2,
) -> DataFrame:
    """Video near-dup pairs via per-frame perceptual hashes: every frame
    gets a pHash, candidates bucket frame-AGNOSTICALLY on the pigeonhole
    (block, key) — frame i of one video may match frame j of another, the
    shifted-clip case — and a video pair is a near-dup when at least
    ``min_frames`` distinct frame pairs verify within the Hamming radius
    (the standard multi-sub-fingerprint vote, Haitsma-Kalker style applied
    to video). Pigeonhole recall holds PER FRAME PAIR, so no qualifying
    frame match is ever missed — certified by the brute-force all-pairs
    oracle (``catalog/multimodal_q.py video_phash_neardup``).

    Output: (a_id, b_id, n_frame_matches, min_hamming). One extra shuffle
    vs the image path (the per-video-pair vote); everything else is the
    shared machinery. Requires non-negative integral doc ids and
    ``frames <= 16`` (the composite-key contract —
    :func:`check_frame_composite`).
    """
    check_frame_composite(frames)
    if max_hamming > blocks - 1:
        raise ValueError(
            f"pigeonhole recall only guaranteed to hamming {blocks - 1}; "
            f"got max_hamming={max_hamming}"
        )
    cells = video_frame_cells(docs, frames, id_col, text_col)
    # composite key rides through phash64's single id column; the hash
    # table (one 16-byte row per frame — corpus-text-free, tiny at any
    # scale) is pinned before the self-join so the tokenize+DCT pipeline
    # runs ONCE, not once per join side
    hashes = phash64(
        cells.select(
            (F.col("id") * 16 + F.col("frame")).alias("id"), "cell", "px"
        )
    ).localCheckpoint(eager=True)
    banded = phash_blocked(hashes, blocks)
    a, b = banded.alias("a"), banded.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.expr("a.id div 16") < F.expr("b.id div 16")),
        )
        .select(
            F.expr("a.id div 16").alias("a_id"),
            F.expr("b.id div 16").alias("b_id"),
            F.expr("a.id % 16").alias("fa"),
            F.expr("b.id % 16").alias("fb"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    # one shuffle for dedup + vote: a frame pair surfacing from several
    # blocks carries the SAME hamming (it depends only on the two hashes),
    # so count_distinct over (fa, fb) + plain min replaces the former
    # dropDuplicates-then-groupBy pair of exchanges exactly
    return (
        matches.groupBy("a_id", "b_id")
        .agg(
            F.count_distinct("fa", "fb").alias("n_frame_matches"),
            F.min("hamming").alias("min_hamming"),
        )
        .filter(F.col("n_frame_matches") >= min_frames)
    )
