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


PNG_SIG_HEX = "89504E470D0A1A0A"
IHDR_TAG_HEX = "49484452"  # b'IHDR' at bytes 13-16 (hex chars 25-32)


def media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata: length, content address, magic sniff, and REAL
    PNG dimensions.  This is the content-addressing step (S6) — dedup by
    hash downstream.  The hash is sha-256 over the (uppercase) hex
    encoding: byte-identical across engines whose hash functions only take
    strings.

    PNG width/height live at fixed IHDR byte offsets (16-19 / 20-23,
    big-endian) — no codec needed: ``conv(substring(hex(content), 33, 8),
    16, 10)`` reads the actual bytes, NULL for non-PNG payloads."""
    hexed = F.hex(F.col("content"))
    # signature AND the IHDR chunk tag at bytes 13-16 — mirrors the Arrow
    # kernel's parse_png_dims exactly, so both extraction surfaces agree
    # on signature-without-IHDR payloads (truncated/CgBI/corrupt files)
    is_png = (
        (F.substring(hexed, 1, 16) == PNG_SIG_HEX)
        & (F.substring(hexed, 25, 8) == IHDR_TAG_HEX)
        & (F.length("content") >= 24)
    )
    png_w = F.conv(F.substring(hexed, 33, 8), 16, 10).cast("int")
    png_h = F.conv(F.substring(hexed, 41, 8), 16, 10).cast("int")
    return media.select(
        "media_ref",
        "mime",
        F.length("content").alias("n_bytes"),
        F.sha2(hexed, 256).alias("content_hash"),
        F.substring(hexed, 1, 8).alias("magic"),
        F.when(is_png, png_w).alias("png_width"),
        F.when(is_png, png_h).alias("png_height"),
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


_PNG_SIG = bytes.fromhex(PNG_SIG_HEX)


def parse_png_dims(content: bytes) -> tuple[int, int] | None:
    """REAL dimension extraction from the PNG IHDR chunk — width/height
    are big-endian uint32 at byte offsets 16-23, directly after the
    8-byte signature and the IHDR length+type; no codec involved (the
    same parse PIL's PngImagePlugin does for ``.size``)."""
    if len(content) >= 24 and content[:8] == _PNG_SIG and content[12:16] == b"IHDR":
        import struct

        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h)
    return None


def _decode_bytes(content: bytes, mime: str) -> tuple[int, int, int, list[float]]:
    """Decode one media payload → (width, height, n_frames, feature vec).

    PNG payloads get REAL width/height from the IHDR bytes (parse_png_dims)
    regardless of codec availability; features stay stubbed.  Other mimes:
    the deterministic stub.  With ``PDF_CRAFT_SPARK_REAL_DECODE=1`` and a
    present codec, images go through the real decoder (falling back per
    object on decode failure) — an importable PIL alone never changes
    behavior."""
    dims = parse_png_dims(content) if mime == "image/png" else None
    if dims is not None and not (REAL_DECODE and MEDIA_CODECS_AVAILABLE):
        _, _, _, feature = _decode_stub(content, mime)
        return dims[0], dims[1], 1, feature
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


THUMB_MAX_DIM = 256


def thumb_dims(w: int, h: int, max_dim: int = THUMB_MAX_DIM) -> tuple[int, int]:
    """Aspect-preserving fit into max_dim×max_dim, pure integer math
    (floor division) so a SQL oracle reproduces it bit-exactly; images
    already inside the box pass through unscaled."""
    if w <= max_dim and h <= max_dim:
        return w, h
    if w >= h:
        return max_dim, max(1, (h * max_dim) // w)
    return max(1, (w * max_dim) // h), max_dim


def _stub_thumb_png(src_hex: str, w: int, h: int) -> bytes:
    """Deterministic stand-in for the resized payload: a PNG-structured
    container whose IHDR carries the REAL target dimensions (so
    downstream dimension reads work on actual bytes), with md5-derived
    CRC/pixel filler — the same construction recipe as the synthetic
    source payloads (payload_hex_sql), and equally SQL-reproducible."""
    hexstr = (
        PNG_SIG_HEX
        + "0000000D"
        + IHDR_TAG_HEX
        + f"{w:08X}{h:08X}"
        + "0802000000"
        + hashlib.md5((src_hex + "|tcrc").encode("ascii")).hexdigest()[:8].upper()
        + hashlib.md5((src_hex + "|t2").encode("ascii")).hexdigest().upper()
    )
    return bytes.fromhex(hexstr)


def resize_media(media: DataFrame, max_dim: int = THUMB_MAX_DIM) -> DataFrame:
    """Thumbnail stage for image payloads: Arrow-batched mapInPandas rows
    (media_ref#thumb<max_dim>, image/png, thumb bytes) — the derived-asset
    shape of the reference's content-addressed store (common/asset.py:
    16-34: assets are written once, addressed by content).

    Target dimensions are REAL work (IHDR parse + integer fit); only the
    pixel resample is stubbed (codecs absent in this image — with
    PDF_CRAFT_SPARK_REAL_DECODE=1 and PIL present, images resample for
    real and are re-encoded).  Narrow op: rows independent, no shuffle."""
    from pdf_craft_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    images = media.filter(F.col("mime").startswith("image/"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, mime, content in zip(pdf["media_ref"], pdf["mime"], pdf["content"]):
                content = bytes(content)
                w, hgt, _nf, _feat = _decode_bytes(content, mime)
                tw, th = thumb_dims(w, hgt, max_dim)
                if REAL_DECODE and MEDIA_CODECS_AVAILABLE:
                    try:  # pragma: no cover - codecs absent in this image
                        import io

                        import PIL.Image

                        with PIL.Image.open(io.BytesIO(content)) as img:
                            buf = io.BytesIO()
                            img.resize((tw, th)).save(buf, format="PNG")
                            thumb = buf.getvalue()
                    except Exception:
                        thumb = _stub_thumb_png(content.hex().upper(), tw, th)
                else:
                    thumb = _stub_thumb_png(content.hex().upper(), tw, th)
                rows.append((f"{ref}#thumb{max_dim}", "image/png", thumb))
            yield pd.DataFrame(rows, columns=["media_ref", "mime", "content"])

    return images.mapInPandas(kernel, schema=MEDIA_SCHEMA)


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


# Synthetic payload hex, engine-portable (identical SQL in Spark/DuckDB).
# image/png rows carry a PNG-STRUCTURED payload: real signature, real IHDR
# length+type, real big-endian width/height bytes (md5-derived dims), real
# bit-depth/color-type fields — so dimension extraction downstream reads
# actual container bytes, exactly like production PNGs.  The IHDR CRC and
# pixel data are md5-derived filler (the SQL oracle engine has no
# crc32/zlib; fully valid zlib PNGs are exercised in tests via the Python
# writer in tests/test_multimodal_png.py).  Other mimes stay opaque.
def payload_hex_sql(hex2int: str) -> str:
    """The payload-construction SQL, shared by both engines modulo their
    hex→int idiom: Spark ``CAST(conv({h}, 16, 10) AS INT)``, DuckDB
    ``CAST(('0x' || {h}) AS INT)`` — pass the idiom as a format string."""
    w = "(16 + " + hex2int.format(h="substr(md5(text), 1, 3)") + " % 4080)"
    h = "(16 + " + hex2int.format(h="substr(md5(text), 4, 3)") + " % 4080)"
    return (
        "CASE WHEN doc_id % 3 = 0 THEN "
        "'89504E470D0A1A0A' || '0000000D' || '49484452' || "
        f"upper(lpad(hex({w}), 8, '0')) || upper(lpad(hex({h}), 8, '0')) || "
        "'0802000000' || upper(substr(md5(text || '|crc'), 1, 8)) || "
        "upper(md5(text || '|2')) || upper(md5(text || '|3')) "
        "ELSE upper(md5(text) || md5(text || '|2') || md5(text || '|3')) END"
    )


SPARK_HEX2INT = "CAST(conv({h}, 16, 10) AS INT)"
DUCK_HEX2INT = "CAST(('0x' || {h}) AS INT)"


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic binary payloads derived from document text —
    engine-portable (Spark unhex == DuckDB unhex over the same hex SQL) so
    the binary plumbing itself is oracle-checkable; PNG rows are
    PNG-structured (see PAYLOAD_HEX_SQL)."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("video/mp4"))
        .otherwise(F.lit("audio/wav"))
    )
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        mime.alias("mime"),
        F.unhex(F.expr(payload_hex_sql(SPARK_HEX2INT))).alias("content"),
    )
