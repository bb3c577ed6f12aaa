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
    the boundary-checkable facts (id, kind, byte count, feature arity)."""
    feats = decode_stub_features(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size("features").alias("n_features"),
    )


MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id AS media_id,
       {_KIND} AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       8 AS n_features
FROM documents
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


SPECS = [
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
