"""Multimodal-column queries over the ``documents`` table.

Media rows are derived deterministically from ``documents`` (payload =
UTF-8 bytes of the text, kind from the doc id), so the Arrow-batched
``mapInPandas`` decode stage can be differentially tested: the oracle can't
run Python, but it CAN verify everything the Spark side must preserve across
the Python boundary — row identity, byte counts, and the feature-vector
arity. The feature *values* are pinned by the golden determinism test in
``tests/test_plans_ohlc_orders_chains.py``.

``multimodal_frame_sample`` (the video frame-sampling plumbing) is pure Spark
(``sequence`` explode) and therefore fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    decode_stub_features,
    frame_sample_plan,
)
from schwab_elt_etl_pipeline_spark.sources import load_table

_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_KIND).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract through the real ``mapInPandas`` stage; output
    the boundary-checkable facts (id, kind, byte count, feature arity) PLUS
    the decoded feature VALUES re-quantized to their exact byte form: the
    catalog payloads are text bytes, so the kernel lands on the sha256 stub
    (``operators/multimodal.py _decode_one_stub`` — feature i is digest
    byte i / 255), and DuckDB computes the same digest natively, so the
    oracle asserts the values literally — first/last feature bytes and the
    full 8-byte sum, not just boundary facts."""
    feats = decode_stub_features(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size("features").alias("n_features"),
        F.expr("cast(round(element_at(features, 1) * 255.0) as int)").alias("f_first"),
        F.expr("cast(round(element_at(features, 8) * 255.0) as int)").alias("f_last"),
        F.expr(
            "aggregate(features, 0L, (a, x) -> a + cast(round(x * 255.0) as long))"
        ).alias("f_sum"),
    )


def _hex_byte(i: int) -> str:
    """DuckDB int value of byte ``i`` (1-based) of a hex digest column hx."""
    return (
        f"((strpos('0123456789abcdef', substr(hx, {2 * i - 1}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(hx, {2 * i}, 1)) - 1)"
    )


# sha256(text) over DuckDB's VARCHAR hashes the UTF-8 bytes — exactly the
# payload the Spark side built with encode(text, 'UTF-8')
MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id AS media_id,
       {_KIND} AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       8 AS n_features,
       CAST({_hex_byte(1)} AS INT) AS f_first,
       CAST({_hex_byte(8)} AS INT) AS f_last,
       CAST({" + ".join(_hex_byte(i) for i in range(1, 9))} AS BIGINT) AS f_sum
FROM (SELECT doc_id, text, sha256(text) AS hx FROM documents) d
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample timestamps: native sequence explode per video row
    (only the per-frame decode itself would be Python; that stays off-plan)."""
    frames = frame_sample_plan(_media_from_documents(spark, sf_dir), every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_at_ms").alias("last_frame_ms"),
    )


MULTIMODAL_FRAMES_SQL = """
SELECT doc_id AS media_id,
       COUNT(*) AS n_frames,
       MAX(frame_at_ms) AS last_frame_ms
FROM (
  SELECT doc_id, UNNEST(generate_series(0, n_chars * 10, 1000)) AS frame_at_ms
  FROM documents
  WHERE doc_id % 3 = 2
) t
GROUP BY doc_id
"""


def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash image near-dup pairs: fixed-point integer 2-D DCT of each
    document's deterministic 8x8 luma thumbnail -> 63-bit perceptual hash,
    pigeonhole-blocked Hamming candidates (5 blocks => guaranteed recall
    for Hamming <= 4), exact Hamming <= 4 as the verdict. Oracle =
    brute-force ALL-PAIRS Hamming over the same integer hashes, so the
    hash match certifies candidate recall — the image twin of
    ``minhash_lsh_neardup``/``simhash_neardup`` (all-integer arithmetic:
    the DCT basis is the same 14-bit literal table in both engines)."""
    from schwab_elt_etl_pipeline_spark.operators.phash import phash_verified_pairs

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return phash_verified_pairs(docs, blocks=5, max_hamming=4)


def _phash_oracle_sql() -> str:
    from schwab_elt_etl_pipeline_spark.operators.phash import CT

    ct_rows = ",".join(
        f"({u},{x},{CT[u * 8 + x]})" for u in range(8) for x in range(8)
    )
    return rf"""
WITH ct(u, x, c) AS (VALUES {ct_rows}),
words AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
  FROM documents
),
px AS (
  SELECT doc_id,
         CAST((LENGTH(w) * 31 + ascii(w)) % 64 AS BIGINT) AS cell,
         LEAST(COUNT(*), 255) AS p
  FROM words GROUP BY doc_id, cell
),
s1 AS (  -- separable DCT pass 1: rows (x) under basis u, per output row y
  SELECT px.doc_id, px.cell // 8 AS y, ct.u, SUM(px.p * ct.c) AS s
  FROM px JOIN ct ON ct.x = px.cell % 8
  GROUP BY px.doc_id, y, ct.u
),
co AS (  -- pass 2: columns (y) under basis v
  SELECT s1.doc_id, s1.u, ct.u AS v, CAST(SUM(s1.s * ct.c) AS BIGINT) AS coeff
  FROM s1 JOIN ct ON ct.x = s1.y
  GROUP BY s1.doc_id, s1.u, v
),
ac AS (SELECT doc_id, u, v, coeff FROM co WHERE NOT (u = 0 AND v = 0)),
tot AS (SELECT doc_id, CAST(SUM(coeff) AS BIGINT) AS sac FROM ac GROUP BY doc_id),
h AS (
  SELECT ac.doc_id,
         CAST(SUM(CASE WHEN 63 * ac.coeff > tot.sac
                  THEN 1::BIGINT << (ac.u * 8 + ac.v - 1) ELSE 0 END) AS BIGINT) AS ph
  FROM ac JOIN tot USING (doc_id) GROUP BY ac.doc_id
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
FROM h a JOIN h b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.ph, b.ph)) <= 4
"""


IMAGE_PHASH_SQL = _phash_oracle_sql()


def video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs via per-frame perceptual hashes — the third
    member of the multimodal dedup triple (image pHash, audio
    fingerprint, now video): each of the 4 deterministic frames of every
    'video'-kind document gets a 63-bit integer-DCT pHash; candidates
    bucket frame-AGNOSTICALLY on the pigeonhole (block, key) (frame i may
    match frame j — the shifted-clip case) and a pair is a near-dup when
    >= 2 distinct frame pairs verify within Hamming 4. Pigeonhole recall
    holds per frame pair; the oracle is the brute-force ALL-(video,frame)-
    PAIRS Hamming scan, so the match certifies that no qualifying frame
    match was missed. Core in ``operators/phash.py video_phash_pairs``."""
    from schwab_elt_etl_pipeline_spark.operators.phash import video_phash_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    return video_phash_pairs(docs, frames=4, blocks=5, max_hamming=4, min_frames=2)


def _video_phash_oracle_sql() -> str:
    from schwab_elt_etl_pipeline_spark.operators.phash import CT

    ct_rows = ",".join(
        f"({u},{x},{CT[u * 8 + x]})" for u in range(8) for x in range(8)
    )
    return rf"""
WITH ct(u, x, c) AS (VALUES {ct_rows}),
fr(f) AS (VALUES (0),(1),(2),(3)),
words AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
  FROM documents WHERE doc_id % 3 = 2
),
px AS (
  SELECT doc_id, fr.f AS f,
         CAST((LENGTH(w) * 31 + ascii(w) + fr.f * 7) % 64 AS BIGINT) AS cell,
         LEAST(COUNT(*), 255) AS p
  FROM words CROSS JOIN fr GROUP BY doc_id, f, cell
),
s1 AS (
  SELECT px.doc_id, px.f, px.cell // 8 AS y, ct.u, SUM(px.p * ct.c) AS s
  FROM px JOIN ct ON ct.x = px.cell % 8
  GROUP BY px.doc_id, px.f, y, ct.u
),
co AS (
  SELECT s1.doc_id, s1.f, s1.u, ct.u AS v, CAST(SUM(s1.s * ct.c) AS BIGINT) AS coeff
  FROM s1 JOIN ct ON ct.x = s1.y
  GROUP BY s1.doc_id, s1.f, s1.u, v
),
ac AS (SELECT doc_id, f, u, v, coeff FROM co WHERE NOT (u = 0 AND v = 0)),
tot AS (SELECT doc_id, f, CAST(SUM(coeff) AS BIGINT) AS sac FROM ac GROUP BY doc_id, f),
h AS (
  SELECT ac.doc_id, ac.f,
         CAST(SUM(CASE WHEN 63 * ac.coeff > tot.sac
                  THEN 1::BIGINT << (ac.u * 8 + ac.v - 1) ELSE 0 END) AS BIGINT) AS ph
  FROM ac JOIN tot USING (doc_id, f) GROUP BY ac.doc_id, ac.f
),
m AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hm
  FROM h a JOIN h b ON b.doc_id > a.doc_id
  WHERE bit_count(xor(a.ph, b.ph)) <= 4
)
SELECT a_id, b_id, COUNT(*) AS n_frame_matches, MIN(hm) AS min_hamming
FROM m GROUP BY a_id, b_id HAVING COUNT(*) >= 2
"""


VIDEO_PHASH_SQL = _video_phash_oracle_sql()


def audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haitsma-Kalker audio-fingerprint near-dup pairs: 10-frame x 8-band
    integer energy grid per track -> 63 double-difference sign bits ->
    pigeonhole-blocked Hamming candidates (8 blocks => guaranteed recall
    for Hamming <= 7), exact Hamming <= 7 as the verdict. Oracle =
    brute-force ALL-PAIRS Hamming over the same integer fingerprints, so
    the hash match certifies candidate recall — the audio twin of
    ``image_phash_neardup`` (grid/sign/pack algebra replayed exactly in
    DuckDB; real PCM enters via ``operators/audiofp.py afp_from_pcm``)."""
    from schwab_elt_etl_pipeline_spark.operators.audiofp import afp_verified_pairs

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return afp_verified_pairs(docs, blocks=8, max_hamming=7)


AUDIO_FP_SQL = """
WITH pos AS (
  SELECT doc_id, text, UNNEST(generate_series(1, LENGTH(text))) AS i
  FROM documents
),
ch AS (
  SELECT doc_id,
         CAST(((i - 1) * 10) // LENGTH(text) AS BIGINT) AS frame,
         CAST(ascii(text[i]) % 8 AS BIGINT) AS band
  FROM pos
),
e AS (
  SELECT doc_id, frame, band, CAST(COUNT(*) AS BIGINT) AS e
  FROM ch GROUP BY doc_id, frame, band
),
ids AS (SELECT DISTINCT doc_id FROM e),
grid AS (
  SELECT ids.doc_id, f.f AS frame, b.b AS band, COALESCE(e.e, 0) AS e
  FROM ids
  CROSS JOIN generate_series(0, 9) f(f)
  CROSS JOIN generate_series(0, 7) b(b)
  LEFT JOIN e ON e.doc_id = ids.doc_id AND e.frame = f.f AND e.band = b.b
),
d AS (  -- band delta D(n, m) = E(n, m) - E(n, m+1), m in 0..6
  SELECT a.doc_id, a.frame, a.band AS m, a.e - b.e AS d
  FROM grid a
  JOIN grid b ON b.doc_id = a.doc_id AND b.frame = a.frame AND b.band = a.band + 1
),
h AS (  -- bit (n-1)*7+m set iff the band delta grew since the previous frame
  SELECT n.doc_id,
         CAST(SUM(CASE WHEN n.d - p.d > 0
                  THEN 1::BIGINT << CAST((n.frame - 1) * 7 + n.m AS INT)
                  ELSE 0 END) AS BIGINT) AS afp
  FROM d n
  JOIN d p ON p.doc_id = n.doc_id AND p.frame = n.frame - 1 AND p.m = n.m
  WHERE n.frame >= 1
  GROUP BY n.doc_id
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM h a JOIN h b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 7
"""


SPECS = [
    QuerySpec(
        "image_phash_neardup",
        image_phash_neardup,
        IMAGE_PHASH_SQL,
        headline=True,
        doc="pHash image near-dup: integer-DCT hash, pigeonhole Hamming blocks, all-pairs oracle",
    ),
    QuerySpec(
        "video_phash_neardup",
        video_phash_neardup,
        VIDEO_PHASH_SQL,
        headline=True,  # slowest plan in the repo — keep its cost visible
        doc="video near-dup via per-frame pHash: frame-agnostic pigeonhole candidates, >=2-frame vote, all-pairs oracle",
    ),
    QuerySpec(
        "audio_fp_neardup",
        audio_fp_neardup,
        AUDIO_FP_SQL,
        headline=True,
        doc="Haitsma-Kalker audio fingerprint near-dup: integer band-energy sign bits, pigeonhole Hamming blocks, all-pairs oracle",
    ),
    QuerySpec(
        "multimodal_decode",
        multimodal_decode,
        MULTIMODAL_DECODE_SQL,
        doc="Arrow-batched decode stage; boundary facts oracle-checked",
    ),
    QuerySpec(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        MULTIMODAL_FRAMES_SQL,
        doc="video frame-sampling grid, pure-Spark sequence explode",
    ),
]
