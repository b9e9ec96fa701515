"""Schemas for the interleaved text+media data model.

The fundamental table shape (per BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

RAW layer (the OCR/layout-classifier boundary — the same boundary the
reference sits behind; it receives already-classified ``PageLayout`` rows
from ``doc-page-extractor``, see /root/reference/pdf_craft/pdf/page_extractor.py:82-157):

- one ``kind='page'`` span starts each page; its ``text`` is
  ``"<page_index>,<width>,<height>"``.
- layout spans follow in OCR emission order. ``kind`` is the layout kind
  (``text title sub_title image table equation image_caption table_caption
  equation_caption``), prefixed ``fn_`` for footnote-area layouts
  (the reference keeps body_layouts / footnotes_layouts separate,
  /root/reference/pdf_craft/pdf/types.py:13-20).
- ``media_ref`` of a RAW span carries the geometry sidecar:
  ``"l,t,r,b"`` for text layouts and ``"<sha256>;l,t,r,b"`` for asset
  layouts (image/table/equation).  This keeps the table at exactly the
  hinted 4-field struct while preserving the det boxes the geometric
  operators need (reading order W1, title levels A3).
- ``offset`` is the per-document emission sequence number (0..n-1).

OUT layer (extracted content): ``kind`` ∈ ``{text, title, image, table,
equation, latex_inline, latex_display, ref, footnote}``; ``media_ref`` is a
pure content hash for asset spans else null; ``offset`` is the final
reading-order position — the reference's own ordering invariant
(/root/reference/pdf_craft/pdf/types.py:78-88).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

INTERLEAVED_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

# Flat (exploded) working shape used inside the pipeline between stages.
FLAT_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("page_index", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("det", T.ArrayType(T.IntegerType()), True),  # l,t,r,b
        T.StructField("footnote_area", T.BooleanType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# Output of the per-doc extraction kernel (exploded).
OUT_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chapter_id", T.IntegerType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

RAW_LAYOUT_KINDS = (
    "text",
    "title",
    "sub_title",
    "image",
    "table",
    "equation",
    "image_caption",
    "table_caption",
    "equation_caption",
)
ASSET_KINDS = ("image", "table", "equation")  # common/asset.py:8-9
TITLE_KINDS = ("title", "sub_title")  # pdf/ref.py:1
