"""F9 fallback pages + §2.12 boilerplate demotion."""

from __future__ import annotations

from pdf_craft_spark.corpus import generate_document, pages_to_spans, parse_raw_spans
from pdf_craft_spark.operators.boilerplate import fallback_page, strip_boilerplate
from pdf_craft_spark.operators.document import extract_document
from pdf_craft_spark.operators.model import RawLayout, RawPage


def _page(idx: int, lines: list[str]) -> RawPage:
    p = RawPage(index=idx, width=600, height=800)
    for i, line in enumerate(lines):
        p.body.append(
            RawLayout(kind="text", text=line, det=(50, 30 + 40 * i, 550, 60 + 40 * i),
                      media_ref=None, order=i)
        )
    return p


def test_running_header_dropped():
    pages = [
        _page(i, ["My Running Header", f"unique body text {i} words."])
        for i in range(1, 11)
    ]
    stripped = strip_boilerplate(pages)
    for p in stripped:
        texts = [lay.text for lay in p.body]
        assert "My Running Header" not in texts
        assert any("unique body" in t for t in texts)
        assert [lay.order for lay in p.body] == list(range(len(p.body)))


def test_unique_lines_kept():
    pages = [_page(i, [f"only here {i}"]) for i in range(1, 11)]
    stripped = strip_boilerplate(pages)
    assert sum(len(p.body) for p in stripped) == 10


def test_titles_never_demoted():
    pages = []
    for i in range(1, 11):
        p = _page(i, ["body"])
        p.body.append(
            RawLayout(kind="title", text="Same Title Everywhere",
                      det=(50, 100, 550, 140), media_ref=None, order=1)
        )
        pages.append(p)
    stripped = strip_boilerplate(pages)
    assert all(any(lay.kind == "title" for lay in p.body) for p in stripped)


def test_fallback_page_variants():
    img = fallback_page(3, "a" * 64, 600, 800)
    assert img.body[0].kind == "image" and img.body[0].media_ref == "a" * 64
    assert img.body[0].det == (0, 0, 600, 800)
    txt = fallback_page(4, None, 600, 800)
    assert txt.body[0].kind == "text"
    assert "Page 4 extraction failed" in txt.body[0].text


def test_error_pages_flow_through_corpus():
    """Some corpus docs contain page_error spans; they round-trip and the
    extraction emits the fallback span."""
    found_image = found_text = False
    for doc_id in range(120):
        spans = pages_to_spans(generate_document(doc_id))
        if not any(k == "page_error" for k, *_ in spans):
            continue
        pages = parse_raw_spans(spans)
        _, out = extract_document(pages)
        err_pages = [p for p in pages if len(p.body) == 1 and p.body[0].det[:2] == (0, 0)]
        if any("extraction failed" in (s.text or "") for s in out):
            found_text = True
        if any(s.kind == "image" and s.media_ref for s in out):
            found_image = True
        if found_image and found_text:
            break
    assert found_text or found_image


def test_boilerplate_changes_headerful_docs_only():
    import hashlib

    changed = same = 0
    for doc_id in range(40):
        pages = parse_raw_spans(pages_to_spans(generate_document(doc_id)))
        md_off, _ = extract_document(pages)
        pages = parse_raw_spans(pages_to_spans(generate_document(doc_id)))
        md_on, _ = extract_document(pages, boilerplate_strip=True)
        if md_off == md_on:
            same += 1
        else:
            changed += 1
            assert "Running head" not in md_on
    assert changed > 0 and same > 0
