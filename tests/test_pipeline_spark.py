"""The distributed plan must equal the single-process kernel span-for-span
(kind, text, media_ref, order) — the north-rule invariant — and stage 1's
JVM prep must be behaviorally identical to the kernel's Python prep."""

from __future__ import annotations

from pdf_craft_spark.corpus import generate_document, pages_to_spans, parse_raw_spans
from pdf_craft_spark.operators.document import extract_document
from pdf_craft_spark.plans.pipeline import (
    corpus_df,
    doc_metrics,
    extract_spans_df,
    to_nested_output,
)

N_DOCS = 12
SEED = 42


def _local_truth(doc_id: int) -> list[tuple]:
    pages = parse_raw_spans(pages_to_spans(generate_document(doc_id, SEED)))
    _, spans = extract_document(pages)
    return [(s.kind, s.text, s.media_ref, s.offset) for s in spans]


def test_spark_pipeline_matches_kernel(spark):
    docs = corpus_df(spark, N_DOCS, SEED, partitions=4)
    flat = extract_spans_df(docs, stage1=True)
    rows = flat.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == N_DOCS
    for doc_id, doc_rows in by_doc.items():
        got = [
            (r.kind, r.text, r.media_ref, r.offset)
            for r in sorted(doc_rows, key=lambda r: r.offset)
        ]
        assert got == _local_truth(int(doc_id)), f"doc {doc_id} span mismatch"


def test_stage1_off_equals_on(spark):
    docs = corpus_df(spark, 6, SEED, partitions=2)
    on = {
        (r.doc_id, r.offset): (r.kind, r.text, r.media_ref)
        for r in extract_spans_df(docs, stage1=True).collect()
    }
    off = {
        (r.doc_id, r.offset): (r.kind, r.text, r.media_ref)
        for r in extract_spans_df(docs, stage1=False).collect()
    }
    assert on == off


def test_nested_output_order(spark):
    docs = corpus_df(spark, 4, SEED, partitions=2)
    nested = to_nested_output(extract_spans_df(docs)).collect()
    assert len(nested) == 4
    for row in nested:
        offsets = [s.offset for s in row.spans]
        assert offsets == sorted(offsets)
        assert offsets[0] == 0


def test_doc_metrics(spark):
    docs = corpus_df(spark, 4, SEED, partitions=2)
    m = {r.doc_id: r for r in doc_metrics(extract_spans_df(docs)).collect()}
    assert len(m) == 4
    for doc_id, row in m.items():
        assert row.n_spans == len(_local_truth(int(doc_id)))
        assert row.n_chapters >= 1


def test_markdown_sink_matches_kernel(spark):
    from pdf_craft_spark.plans.pipeline import extract_markdown_df

    docs = corpus_df(spark, 6, SEED, partitions=2)
    got = {r.doc_id: r.markdown for r in extract_markdown_df(docs).collect()}
    assert len(got) == 6
    for doc_id in got:
        pages = parse_raw_spans(pages_to_spans(generate_document(int(doc_id), SEED)))
        md, _ = extract_document(pages)
        assert got[doc_id] == md, f"doc {doc_id} markdown mismatch"


def test_duplicate_doc_rows_fail_loudly_in_kernel(spark):
    """The zero-shuffle plan's precondition is one contract row per
    doc_id.  Duplicate rows co-located in one partition must raise a
    contract-violation error from the kernel, never emit a silently
    doubled document."""
    import pytest

    docs = corpus_df(spark, 4, SEED, partitions=2)
    dup = docs.unionAll(docs.limit(1)).repartition(1)  # dup rows co-located
    with pytest.raises(Exception, match="contract violation"):
        extract_spans_df(dup).count()


def test_assert_unique_docs_catches_cross_partition_duplicates(spark):
    """Cross-partition duplicates are invisible to any single kernel task;
    the opt-in table-level assertion catches them before the kernel runs
    (and is a no-op on a clean table)."""
    import pytest

    docs = corpus_df(spark, 4, SEED, partitions=2)
    # clean table: the assertion passes and the plan still runs
    assert extract_spans_df(docs, assert_unique_docs=True).count() > 0
    dup = docs.unionAll(docs.limit(1))
    with pytest.raises(ValueError, match="contract violation"):
        extract_spans_df(dup, assert_unique_docs=True)
