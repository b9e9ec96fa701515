"""Multimodal-column queries: binary payload plumbing.

``media_metadata`` is JVM-side and oracle-checked (the binary payloads are
derived engine-portably via unhex(md5(...)), so DuckDB computes identical
blobs); decode/feature/frame ops run the Arrow kernel with the stubbed
codec (rows-only checks)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pdf_craft_spark.functions.multimodal import (
    extract_media_features,
    media_metadata,
    sample_frames,
    synth_media_table,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(synth_media_table(_docs(spark, sf_dir))).orderBy("media_ref")


MEDIA_METADATA_SQL = """
WITH media AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'video/mp4'
              ELSE 'audio/wav' END AS mime,
         unhex(md5(text) || md5(text || '|2') || md5(text || '|3')) AS content
  FROM documents
)
SELECT media_ref, mime,
       CAST(octet_length(content) AS INT) AS n_bytes,
       sha256(hex(content)) AS content_hash,
       substring(hex(content), 1, 8) AS magic
FROM media ORDER BY media_ref
"""


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(synth_media_table(_docs(spark, sf_dir))).orderBy(
        "media_ref"
    )


def media_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synth_media_table(_docs(spark, sf_dir)), every_nth=8).orderBy(
        "media_ref", "frame_index"
    )


QUERIES = {
    "media_metadata": media_metadata_q,
    "media_features": media_features_q,
    "media_frame_sample": media_frame_sample_q,
}
ORACLES = {
    "media_metadata": MEDIA_METADATA_SQL,
}
