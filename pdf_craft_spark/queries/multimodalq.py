"""Multimodal-column queries: binary payload plumbing.

The binary payloads are derived engine-portably (the same hex-building SQL
runs in Spark and DuckDB; image/png rows are PNG-STRUCTURED — real
signature + IHDR width/height bytes), so ALL three queries (metadata,
decode/features, frame fan-out) are oracle-checked: DuckDB recomputes the
exact same values in SQL — including the REAL IHDR dimension parse as a
hex-substring read — while the Spark side actually exercises the Arrow
mapInPandas kernel (which parses the same actual bytes with
struct.unpack)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.functions.multimodal import (
    DUCK_HEX2INT,
    FEATURE_DIM,
    THUMB_MAX_DIM,
    extract_media_features,
    media_metadata,
    payload_hex_sql,
    resize_media,
    sample_frames,
    synth_media_table,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(synth_media_table(_docs(spark, sf_dir))).orderBy("media_ref")


_MEDIA_CTE = f"""
WITH media AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_ref,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'video/mp4'
              ELSE 'audio/wav' END AS mime,
         unhex({payload_hex_sql(DUCK_HEX2INT)}) AS content
  FROM documents
)
"""

# the IHDR dimension parse as plain byte reads: hex chars 33-40/41-48 ==
# bytes 17-20/21-24 — identical expression shape to the Spark side's conv()
_PNG_SIG = "89504E470D0A1A0A"
# BIGINT for the raw 4-byte reads (8 hex chars can exceed INT32 on non-PNG
# payloads if ever evaluated unguarded); the guarded CASE narrows to INT
_DUCK_PNG_W = "CAST(('0x' || substring(hex(content), 33, 8)) AS BIGINT)"
_DUCK_PNG_H = "CAST(('0x' || substring(hex(content), 41, 8)) AS BIGINT)"
_DUCK_IS_PNG = (
    f"substring(hex(content), 1, 16) = '{_PNG_SIG}' "
    "AND substring(hex(content), 25, 8) = '49484452' "
    "AND octet_length(content) >= 24"
)

MEDIA_METADATA_SQL = _MEDIA_CTE + f"""
SELECT media_ref, mime,
       CAST(octet_length(content) AS INT) AS n_bytes,
       sha256(hex(content)) AS content_hash,
       substring(hex(content), 1, 8) AS magic,
       CAST(CASE WHEN {_DUCK_IS_PNG} THEN {_DUCK_PNG_W} END AS INT) AS png_width,
       CAST(CASE WHEN {_DUCK_IS_PNG} THEN {_DUCK_PNG_H} END AS INT) AS png_height
FROM media ORDER BY media_ref
"""


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-kernel decode; the feature vector is flattened to scalar
    columns f0..f7 in the output projection (arrays stay internal — the
    driver's canonicalizer sorts scalar columns)."""
    feats = extract_media_features(synth_media_table(_docs(spark, sf_dir)))
    return feats.select(
        "media_ref",
        "mime",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(FEATURE_DIM)],
    ).orderBy("media_ref")


_FEAT_CTE = _MEDIA_CTE + f"""
, feat AS (
  SELECT media_ref, mime, content,
         CAST(octet_length(content) AS INT) AS n_bytes,
         md5(hex(content)) AS h,
         ({_DUCK_IS_PNG}) AS is_png
  FROM media
)
"""

MEDIA_FEATURES_SQL = _FEAT_CTE + f"""
SELECT media_ref, mime, n_bytes,
       CAST(CASE WHEN is_png THEN {_DUCK_PNG_W}
                 ELSE 64 + (ascii(substr(h, 1, 1)) * 16 + ascii(substr(h, 2, 1))) % 192
            END AS INT) AS width,
       CAST(CASE WHEN is_png THEN {_DUCK_PNG_H}
                 ELSE 64 + (ascii(substr(h, 3, 1)) * 16 + ascii(substr(h, 4, 1))) % 192
            END AS INT) AS height,
       CAST(CASE WHEN mime LIKE 'image/%' THEN 1
                 ELSE 1 + (ascii(substr(h, 5, 1)) * 16 + ascii(substr(h, 6, 1))) % 32
            END AS INT) AS n_frames,
""" + ",\n".join(
    f"       ascii(substr(h, {7 + i}, 1)) / 256.0 AS f{i}" for i in range(FEATURE_DIM)
) + """
FROM feat ORDER BY media_ref
"""


def media_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sample_frames(synth_media_table(_docs(spark, sf_dir)), every_nth=8)
    return out.select(
        "media_ref", F.col("frame_index").cast("int").alias("frame_index"), "frame_ref"
    ).orderBy("media_ref", "frame_index")


MEDIA_FRAME_SAMPLE_SQL = _FEAT_CTE + """
, nf AS (
  SELECT media_ref,
         CASE WHEN mime LIKE 'image/%' THEN 1
              ELSE 1 + (ascii(substr(h, 5, 1)) * 16 + ascii(substr(h, 6, 1))) % 32
         END AS n_frames
  FROM feat
), fr AS (
  SELECT media_ref, unnest(range(0, n_frames, 8)) AS fi FROM nf
)
SELECT media_ref, CAST(fi AS INT) AS frame_index,
       media_ref || '#' || CAST(fi AS VARCHAR) AS frame_ref
FROM fr ORDER BY media_ref, frame_index
"""


def media_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end: the Arrow thumbnail kernel runs over
    image payloads, then the JVM metadata stage re-reads the PRODUCED
    bytes — png_width/height must equal the integer-fit targets, and the
    content hash addresses the derived asset.  The oracle recomputes the
    whole chain (source IHDR parse → fit math → thumb container bytes →
    sha256) in SQL."""
    thumbs = resize_media(synth_media_table(_docs(spark, sf_dir)))
    return media_metadata(thumbs).select(
        "media_ref", "n_bytes", "content_hash", "png_width", "png_height"
    ).orderBy("media_ref")


_T = THUMB_MAX_DIM

MEDIA_RESIZE_SQL = _MEDIA_CTE + f"""
, src AS (
  -- same filter as the kernel (any image/*) with the same stub-dims
  -- fallback for image payloads without a parsable PNG container
  -- (_decode_bytes); the current synth table only emits image/png, so
  -- the fallback branch is dormant but keeps the surfaces equivalent
  SELECT media_ref, hex(content) AS sh,
         CASE WHEN {_DUCK_IS_PNG} THEN {_DUCK_PNG_W}
              ELSE 64 + (ascii(substr(md5(hex(content)), 1, 1)) * 16
                         + ascii(substr(md5(hex(content)), 2, 1))) % 192
         END AS w,
         CASE WHEN {_DUCK_IS_PNG} THEN {_DUCK_PNG_H}
              ELSE 64 + (ascii(substr(md5(hex(content)), 3, 1)) * 16
                         + ascii(substr(md5(hex(content)), 4, 1))) % 192
         END AS h
  FROM media WHERE mime LIKE 'image/%'
), dims AS (
  -- thumb_dims: pass-through inside the box, else aspect-preserving
  -- floor-division fit (branch-for-branch the Python kernel's math)
  SELECT media_ref, sh,
         CASE WHEN w <= {_T} AND h <= {_T} THEN w
              WHEN w >= h THEN {_T}
              ELSE greatest(1, (w * {_T}) // h) END AS tw,
         CASE WHEN w <= {_T} AND h <= {_T} THEN h
              WHEN w >= h THEN greatest(1, (h * {_T}) // w)
              ELSE {_T} END AS th
  FROM src
), thumb AS (
  -- _stub_thumb_png: PNG container with REAL target dims in the IHDR
  SELECT media_ref || '#thumb{_T}' AS media_ref,
         '89504E470D0A1A0A' || '0000000D' || '49484452' ||
         upper(lpad(hex(tw), 8, '0')) || upper(lpad(hex(th), 8, '0')) ||
         '0802000000' || upper(substr(md5(sh || '|tcrc'), 1, 8)) ||
         upper(md5(sh || '|t2')) AS thex,
         tw, th
  FROM dims
)
SELECT media_ref,
       CAST(length(thex) // 2 AS INT) AS n_bytes,
       sha256(thex) AS content_hash,
       CAST(tw AS INT) AS png_width,
       CAST(th AS INT) AS png_height
FROM thumb ORDER BY media_ref
"""


QUERIES = {
    "media_metadata": media_metadata_q,
    "media_features": media_features_q,
    "media_frame_sample": media_frame_sample_q,
    "media_resize": media_resize_q,
}
ORACLES = {
    "media_metadata": MEDIA_METADATA_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "media_frame_sample": MEDIA_FRAME_SAMPLE_SQL,
    "media_resize": MEDIA_RESIZE_SQL,
}
