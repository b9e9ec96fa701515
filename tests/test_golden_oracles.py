"""The committed golden tables must equal what the local reference-parity
kernel produces TODAY — a drift guard: any kernel change that would break
the driver's golden-table correctness gate fails here first."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from scripts.make_golden import (
    GOLDEN_DIR,
    N_DOCS,
    epub_rows,
    kernel_outputs,
    stage1_rows,
)


def _committed(name: str) -> list[tuple]:
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    table = pq.read_table(path)
    return list(zip(*(table.column(c).to_pylist() for c in table.column_names)))


def test_golden_spans_current():
    got = []
    for doc_id in range(N_DOCS):
        _, spans = kernel_outputs(doc_id, boilerplate=False)
        got.extend(
            (str(doc_id), s.chapter_id, s.kind, s.text, s.media_ref, s.offset)
            for s in spans
        )
    assert got == _committed("pipeline_extract_spans")


def test_golden_markdown_current():
    got = []
    for doc_id in range(N_DOCS):
        md, spans = kernel_outputs(doc_id, boilerplate=False)
        got.append((str(doc_id), md, len(spans)))
    assert got == _committed("pipeline_markdown")


def test_golden_stage1_current():
    got = []
    for doc_id in range(N_DOCS):
        got.extend(stage1_rows(doc_id))
    assert got == _committed("pipeline_stage1_prep")


def test_golden_epub_current():
    recs, tocs = [], []
    for doc_id in range(N_DOCS):
        r, t = epub_rows(doc_id)
        recs.extend(r)
        tocs.extend(t)
    assert recs == _committed("pipeline_epub_records")
    assert tocs == _committed("pipeline_epub_toc")


def test_golden_stage1_matches_live_spark_plan(spark):
    """The stage-1 replica (stage1_rows) must agree with the LIVE Spark
    plan (explode_spans → prepare_stage1) on the golden corpus — the same
    comparison the driver's DuckDB oracle performs, kept in-repo."""
    from pdf_craft_spark.plans.pipeline import (
        corpus_df,
        explode_spans,
        prepare_stage1,
    )

    live = (
        prepare_stage1(explode_spans(corpus_df(spark, N_DOCS, 42)))
        .select("doc_id", "kind", "text", "offset")
        .collect()
    )
    got = sorted((r.doc_id, r.kind, r.text, r.offset) for r in live)
    want = []
    for doc_id in range(N_DOCS):
        want.extend(stage1_rows(doc_id))
    assert got == sorted(want)


def test_stage1_null_text_semantics(spark):
    """NULL text: non-page rows drop (3-valued filter), page rows pass with
    text NULL — and stage1_rows mirrors it."""
    from pdf_craft_spark.plans.pipeline import prepare_stage1

    flat = spark.createDataFrame(
        [
            ("d", "text", None, 0),
            ("d", "page", None, 1),
            ("d", "text", "hello world", 2),
        ],
        "doc_id string, kind string, text string, offset int",
    )
    rows = sorted(
        (r.kind, r.text, r.offset) for r in prepare_stage1(flat).collect()
    )
    assert rows == [("page", None, 1), ("text", "hello world", 2)]


def test_golden_boilerplate_current():
    got = []
    for doc_id in range(N_DOCS):
        _, spans = kernel_outputs(doc_id, boilerplate=True)
        got.extend(
            (str(doc_id), s.chapter_id, s.kind, s.text, s.media_ref, s.offset)
            for s in spans
        )
    assert got == _committed("pipeline_boilerplate_strip")
