"""pHash image near-dup: the Spark fixed-point DCT hash must equal a
pure-Python reference bit-for-bit (the same claim the DuckDB all-pairs
oracle certifies on the catalog query), the pigeonhole guard must hold,
and the luma-array bridge from the real decoders must agree with the
sparse-cell form."""

from __future__ import annotations

import random

import pytest

from schwab_elt_etl_pipeline_spark.operators.phash import (
    CT,
    luma_cells,
    phash64,
    phash_from_luma_array,
    phash_verified_pairs,
)


def _py_phash(px: dict[int, int]) -> int:
    """Reference pHash: integer 2-D DCT over a sparse {cell: px} grid,
    mean-threshold bits over the 63 AC coefficients."""
    coeffs = []
    for uv in range(1, 64):
        u, v = uv // 8, uv % 8
        c = 0
        for cell, p in px.items():
            x, y = cell % 8, cell // 8
            c += p * CT[u * 8 + x] * CT[v * 8 + y]
        coeffs.append(c)
    sac = sum(coeffs)
    h = 0
    for i, c in enumerate(coeffs):
        if 63 * c > sac:
            h |= 1 << i
    return h


def test_phash64_matches_python_reference(spark):
    rng = random.Random(7)
    grids = []
    for img in range(6):
        cells = rng.sample(range(64), rng.randint(5, 40))
        grids.append((img, {c: rng.randint(1, 255) for c in cells}))
    rows = [(i, c, p) for i, g in grids for c, p in g.items()]
    df = spark.createDataFrame(rows, "id long, cell long, px long")
    got = {r.id: r.phash for r in phash64(df).collect()}
    assert got == {i: _py_phash(g) for i, g in grids}


def test_phash_from_luma_array_bridge(spark):
    """A dense row-major 64-pixel luma array (the real decoders' output
    shape) must hash identically to the sparse-cell form."""
    rng = random.Random(11)
    dense = [rng.randint(0, 255) for _ in range(64)]
    arr = spark.createDataFrame([(9, dense)], "media_id long, luma array<long>")
    got = phash_from_luma_array(arr).collect()[0]
    assert got.phash == _py_phash({c: p for c, p in enumerate(dense) if p})


def test_phash_verified_pairs_finds_near_dup_not_distinct(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("theta", "thetaX", 1)  # one word mutated
    far = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.a_id, r.b_id): r.hamming for r in phash_verified_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert (1, 3) not in pairs and (2, 3) not in pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        phash_verified_pairs(docs, blocks=5, max_hamming=5)


def test_luma_cells_caps_and_buckets(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["aa"] * 300))], "doc_id long, text string"
    )
    rows = luma_cells(docs).collect()
    assert len(rows) == 1
    assert rows[0].px == 255  # clamped
    assert rows[0].cell == (2 * 31 + ord("a")) % 64


def test_video_phash_pairs_vote_over_frames(spark):
    """A copied video matches on ALL frames at Hamming 0, a lightly-edited
    one on >= 2 frames, an unrelated one not at all; the pigeonhole guard
    still applies."""
    from schwab_elt_etl_pipeline_spark.operators.phash import (
        video_phash_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    near = base.replace("theta", "thetaX", 1)
    far = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )
    out = {
        (r.a_id, r.b_id): (r.n_frame_matches, r.min_hamming)
        for r in video_phash_pairs(docs).collect()
    }
    assert out[(1, 2)] == (4, 0)  # exact copy: every frame, distance 0
    assert (1, 3) in out and out[(1, 3)][0] >= 2  # edited copy: frame vote
    assert all(4 not in pair for pair in out)  # unrelated video never pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        video_phash_pairs(docs, blocks=5, max_hamming=5)


def test_video_frames_composite_guard(spark):
    """frames > 16 overflows the 4-bit frame field of the id*16+frame
    composite — silent id aliasing — so the operator must refuse."""
    from schwab_elt_etl_pipeline_spark.operators.phash import (
        check_frame_composite,
        video_phash_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="composite"):
        video_phash_pairs(docs, frames=17)
    with pytest.raises(ValueError, match="composite"):
        check_frame_composite(0)
    check_frame_composite(16)  # boundary: 16 frames still fit 4 bits


def test_video_frame_cells_match_per_word_expansion(spark):
    """The aggregate-then-rotate rewrite must reproduce the original
    per-word-per-frame expansion bit-for-bit: cell (base + 7f) % 64 with
    px = min(count, 255) per (id, frame, cell)."""
    from schwab_elt_etl_pipeline_spark.operators.phash import video_frame_cells

    texts = {1: "Alpha beta  beta gamma", 2: "x " * 300, 3: "solo"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    expected: dict[tuple[int, int, int], int] = {}
    for i, t in texts.items():
        for w in t.strip().lower().split():
            for f in range(4):
                cell = (len(w) * 31 + ord(w[0]) + f * 7) % 64
                k = (i, f, cell)
                expected[k] = min(expected.get(k, 0) + 1, 255)
    got = {
        (r.id, r.frame, r.cell): r.px
        for r in video_frame_cells(docs, frames=4).collect()
    }
    assert got == expected
