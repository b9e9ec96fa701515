"""Materialize the golden correctness tables for the pipeline queries.

The 28-document golden corpus (incl. the 4 adversarial docs 24-27) (``GOLDEN_DOCS`` in queries/pipelineq.py) is
run through the LOCAL single-process kernel — the same code path
``tests/test_document_parity.py`` proves byte-identical to the actual
reference pipeline (/root/reference/pdf_craft/transform.py:192 →
sequence/generation.py:23 → markdown/render/render.py:15) — and the
resulting span sequences / markdown / metrics are written as parquet under
``golden/n28/``.  The driver's DuckDB oracle then simply reads these
tables, turning the Spark pipeline queries into driver-green rows: Spark
distributed plan vs reference-parity local kernel, value-exact.

Stage-1 golden replicates plans/pipeline.prepare_stage1's JVM expressions
with the equivalent Python regexes (corpus text is ASCII-whitespace-only,
so Java and Python ``\\s`` agree).  tests/test_golden_oracles.py asserts
these Python functions match the committed parquet AND runs the live Spark
stage-1 plan against the same parquet; the external driver oracle repeats
the Spark-vs-golden comparison independently.

Run: python scripts/make_golden.py   (idempotent, deterministic)
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdf_craft_spark.corpus import generate_document, pages_to_spans, parse_raw_spans
from pdf_craft_spark.operators.document import extract_document

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "golden", "n28")
N_DOCS = 28
SEED = 42

_TITLE_KINDS = ("title", "sub_title", "fn_title", "fn_sub_title")
# Python twin of plans/pipeline._REPETITION (Java regex); single re.S flag
# instead of the inline (?s) groups (Python 3.11 rejects mid-pattern flags)
_REPETITION = re.compile(r"(.{2,5})\1{15}|(.{6,20})\2{7}", re.S)
_WS = re.compile(r"\s+")
_HEAD = re.compile(r"^#+\s+")


def stage1_rows(doc_id: int) -> list[tuple[str, str, str, int]]:
    """Python replica of explode_spans → prepare_stage1 (F1, F3, F4).

    NULL text mirrors Spark's 3-valued filter exactly: a non-page row with
    NULL text evaluates the whole predicate to NULL (not true) and is
    dropped; a page-kind row passes on the first disjunct with text left
    NULL.  (Unreachable with the current generator — it never emits NULL
    text — but the replica must not diverge from the plan's semantics.)"""
    out = []
    for kind, text, _mref, offset in pages_to_spans(generate_document(doc_id, SEED)):
        if text is None:
            if kind != "page":
                continue
            out.append((str(doc_id), kind, None, offset))
            continue
        text = _WS.sub(" ", text).strip()
        if not (
            kind == "page" or len(text) < 32 or not _REPETITION.search(text)
        ):
            continue
        if kind in _TITLE_KINDS:
            text = _HEAD.sub("", text)
        out.append((str(doc_id), kind, text, offset))
    return out


def kernel_outputs(doc_id: int, boilerplate: bool) -> tuple[str, list]:
    pages = parse_raw_spans(pages_to_spans(generate_document(doc_id, SEED)))
    return extract_document(pages, boilerplate_strip=boilerplate)


SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chapter_id", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
STAGE1_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("offset", pa.int32()),
    ]
)
# the RAW interleaved corpus itself (pre-stage-1): oracles that must do
# real SQL work over corpus text (e.g. the PII scrub) read this and apply
# their own expressions, instead of reading a precomputed answer
RAW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
METRICS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_spans", pa.int64()),
        ("n_chapters", pa.int64()),
        ("n_footnotes", pa.int64()),
        ("n_assets", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)
NESTED_SCHEMA = pa.schema([("doc_id", pa.string()), ("n_spans", pa.int32())])
MARKDOWN_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("markdown", pa.string()), ("n_spans", pa.int32())]
)
EPUB_RECORD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chapter_id", pa.int32()),
        ("seq", pa.int32()),
        ("record", pa.string()),
        ("level", pa.int32()),
        ("text", pa.string()),
        ("latex", pa.string()),
        ("media_ref", pa.string()),
        ("html", pa.string()),
        ("title", pa.string()),
        ("caption", pa.string()),
        ("footnote_id", pa.int32()),
    ]
)
EPUB_TOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("toc_id", pa.int32()),
        ("parent_id", pa.int32()),
        ("pos", pa.int32()),
        ("title", pa.string()),
        ("has_chapter", pa.bool_()),
    ]
)


def epub_rows(doc_id: int) -> tuple[list[tuple], list[tuple]]:
    from pdf_craft_spark.operators.document import extract_epub_records

    pages = parse_raw_spans(pages_to_spans(generate_document(doc_id, SEED)))
    rows, tocs = extract_epub_records(pages)
    return (
        [(str(doc_id), *r) for r in rows],
        [
            (str(doc_id), t.toc_id, t.parent_id, t.pos, t.title, t.has_chapter)
            for t in tocs
        ],
    )


def _write(name: str, rows: list[tuple], schema: pa.Schema) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
        schema=schema,
    )
    pq.write_table(table, os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    print(f"golden/n28/{name}.parquet: {len(rows)} rows")


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    spans_rows, boiler_rows, md_rows, metric_rows, nested_rows, s1_rows = (
        [], [], [], [], [], [],
    )
    epub_rec_rows: list[tuple] = []
    epub_toc_rows: list[tuple] = []
    raw_rows: list[tuple] = []
    for doc_id in range(N_DOCS):
        raw_rows.extend(
            (str(doc_id), k, t, m, o)
            for k, t, m, o in pages_to_spans(generate_document(doc_id, SEED))
        )
        s1_rows.extend(stage1_rows(doc_id))
        recs, tocs = epub_rows(doc_id)
        epub_rec_rows.extend(recs)
        epub_toc_rows.extend(tocs)

        md, spans = kernel_outputs(doc_id, boilerplate=False)
        spans_rows.extend(
            (str(doc_id), s.chapter_id, s.kind, s.text, s.media_ref, s.offset)
            for s in spans
        )
        md_rows.append((str(doc_id), md, len(spans)))
        nested_rows.append((str(doc_id), len(spans)))
        n_chaps = len({s.chapter_id for s in spans if s.chapter_id is not None})
        metric_rows.append(
            (
                str(doc_id),
                len(spans),
                n_chaps,
                sum(1 for s in spans if s.kind == "footnote"),
                sum(1 for s in spans if s.kind in ("image", "table", "equation")),
                sum(len(s.text) for s in spans if s.text is not None),
            )
        )

        _, bspans = kernel_outputs(doc_id, boilerplate=True)
        boiler_rows.extend(
            (str(doc_id), s.chapter_id, s.kind, s.text, s.media_ref, s.offset)
            for s in bspans
        )

    _write("raw_spans", raw_rows, RAW_SCHEMA)
    _write("pipeline_extract_spans", spans_rows, SPAN_SCHEMA)
    _write("pipeline_boilerplate_strip", boiler_rows, SPAN_SCHEMA)
    _write("pipeline_stage1_prep", s1_rows, STAGE1_SCHEMA)
    _write("pipeline_doc_metrics", metric_rows, METRICS_SCHEMA)
    _write("pipeline_nested_output", nested_rows, NESTED_SCHEMA)
    _write("pipeline_markdown", md_rows, MARKDOWN_SCHEMA)
    _write("pipeline_epub_records", epub_rec_rows, EPUB_RECORD_SCHEMA)
    _write("pipeline_epub_toc", epub_toc_rows, EPUB_TOC_SCHEMA)


if __name__ == "__main__":
    main()
