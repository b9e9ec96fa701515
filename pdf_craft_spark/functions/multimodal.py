"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference's media handling is content-addressed PNG storage
(/root/reference/pdf_craft/common/asset.py:16-34) with decode happening in
the external OCR model.  At training-data scale the engine treats media as
``binary`` columns flowing through Arrow batches:

- metadata extraction (size, content hash, magic sniff) — pure Catalyst,
  JVM-side, oracle-checkable;
- decode / resize / frame-sample — Arrow-batched kernels over
  ``mapInPandas``.  The actual codecs (PIL/ffmpeg) are NOT in this image,
  so the pixel work is STUBBED behind ``MEDIA_CODECS_AVAILABLE`` with a
  deterministic fake that preserves the real schema, batch shape, and
  partitioning — swap ``_decode_bytes`` for the real decoder on a cluster
  with the libs installed.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this image
    import PIL.Image  # noqa: F401

    MEDIA_CODECS_AVAILABLE = True
except Exception:  # ImportError; anything else means a broken install
    MEDIA_CODECS_AVAILABLE = False

# Real pixel decode is an explicit opt-in (set PDF_CRAFT_SPARK_REAL_DECODE=1
# on a cluster with the codecs installed).  A merely-importable PIL must NOT
# change results: the deterministic stub is the default everywhere so the
# oracle check stays engine-portable.
REAL_DECODE = os.environ.get("PDF_CRAFT_SPARK_REAL_DECODE", "") == "1"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

FEATURE_DIM = 8


def media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata: length, content address, magic sniff.  This is
    the content-addressing step (S6) — dedup by hash downstream.  The hash
    is sha-256 over the (uppercase) hex encoding: byte-identical across
    engines whose hash functions only take strings."""
    hexed = F.hex(F.col("content"))
    return media.select(
        "media_ref",
        "mime",
        F.length("content").alias("n_bytes"),
        F.sha2(hexed, 256).alias("content_hash"),
        F.substring(hexed, 1, 8).alias("magic"),
    )


def _decode_stub(content: bytes, mime: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stub decode → (width, height, n_frames, feature vec).

    Derived from ``md5(hex(content))`` through ascii codes of the hex
    digest's characters, so a SQL oracle can recompute it exactly
    (``ascii(substr(md5(hex(content)), i, 1))`` in both Spark and DuckDB);
    features are ``ascii/256.0`` — dyadic rationals, bit-exact doubles in
    every engine.  Keeps downstream shapes honest: an 8-dim 'embedding'
    per object."""
    h = hashlib.md5(content.hex().upper().encode("ascii")).hexdigest()
    a = [ord(c) for c in h]  # ascii codes of the 32 hex chars
    width = 64 + (a[0] * 16 + a[1]) % 192
    height = 64 + (a[2] * 16 + a[3]) % 192
    n_frames = 1 if mime.startswith("image/") else 1 + (a[4] * 16 + a[5]) % 32
    feature = [a[6 + i] / 256.0 for i in range(FEATURE_DIM)]
    return width, height, n_frames, feature


def _decode_bytes(content: bytes, mime: str) -> tuple[int, int, int, list[float]]:
    """Decode one media payload → (width, height, n_frames, feature vec).

    Default: the deterministic stub (above).  With
    ``PDF_CRAFT_SPARK_REAL_DECODE=1`` and a present codec, images go
    through the real decoder (falling back to the stub per-object on
    decode failure) — an importable PIL alone never changes behavior."""
    if REAL_DECODE and MEDIA_CODECS_AVAILABLE and mime.startswith("image/"):
        try:  # pragma: no cover - codecs absent in this image
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(content)) as img:
                width, height = img.size
                n_frames = int(getattr(img, "n_frames", 1))
            _, _, _, feature = _decode_stub(content, mime)
            return width, height, n_frames, feature
        except Exception:
            pass  # undecodable payload → deterministic fallback
    return _decode_stub(content, mime)


def extract_media_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Arrow-batched decode/feature kernel over mapInPandas.

    Partitioning note: media rows are independent → narrow op, no shuffle;
    at 100 TB the only knob is input split size (media blobs dominate
    bytes, so smaller maxPartitionBytes than for text tables)."""
    from pdf_craft_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, mime, content in zip(pdf["media_ref"], pdf["mime"], pdf["content"]):
                w, hgt, nf, feat = _decode_bytes(bytes(content), mime)
                rows.append((ref, mime, len(content), w, hgt, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref",
                    "mime",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ],
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 8) -> DataFrame:
    """Frame sampling for video mimes: emits (media_ref, frame_index,
    frame_ref) rows — the fan-out shape real frame extraction has; frame
    payload production is part of the stubbed decode."""
    feats = extract_media_features(media)
    frames = feats.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth))
        ).alias("frame_index"),
    )
    return frames.withColumn(
        "frame_ref",
        F.concat_ws("#", F.col("media_ref"), F.col("frame_index").cast("string")),
    )


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic opaque binary payloads derived from document text —
    engine-portable (Spark unhex(md5) == DuckDB unhex(md5)) so the binary
    plumbing itself is oracle-checkable."""
    payload = F.unhex(
        F.concat(
            F.md5(F.col("text")),
            F.md5(F.concat(F.col("text"), F.lit("|2"))),
            F.md5(F.concat(F.col("text"), F.lit("|3"))),
        )
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("video/mp4"))
        .otherwise(F.lit("audio/wav"))
    )
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        mime.alias("mime"),
        payload.alias("content"),
    )
