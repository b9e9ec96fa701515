"""Golden end-to-end snapshot: the extraction output for fixed documents
is locked byte-for-byte.  Any semantic drift in any kernel shows up here
first; update ONLY after verifying the new behavior against the reference
parity suites."""

from __future__ import annotations

import hashlib

from pdf_craft_spark.corpus import generate_document, pages_to_spans, parse_raw_spans
from pdf_craft_spark.operators.document import extract_document

# updated 2026-08-16: markdown now includes the reference's
# '---\n\n## References' divider (markdown/render/render.py:82), verified
# byte-equal against the reference in test_document_parity.py
GOLDEN = {
    1: ("d7888a867c", 17),
    2: ("e73592a3b9", 28),
    7: ("a41e47690f", 11),
    42: ("9df138c526", 24),
}


def _extract(doc_id: int):
    pages = parse_raw_spans(pages_to_spans(generate_document(doc_id)))
    return extract_document(pages)


def test_golden_snapshots():
    got = {}
    for doc_id in GOLDEN:
        md, spans = _extract(doc_id)
        got[doc_id] = (hashlib.md5(md.encode()).hexdigest()[:10], len(spans))
    assert got == GOLDEN, f"extraction drift: {got}"


def test_span_invariants():
    for doc_id in GOLDEN:
        _, spans = _extract(doc_id)
        assert [s.offset for s in spans] == list(range(len(spans)))
        for s in spans:
            assert s.kind in (
                "text", "title", "image", "table", "equation", "footnote"
            )
            if s.kind == "image":
                assert s.media_ref and len(s.media_ref) == 64
