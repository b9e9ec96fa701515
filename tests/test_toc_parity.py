"""TOC-stage parity (J4/A5/A6 + A3/A7/J5 + W8) vs the reference, using a
real in-test Aho-Corasick (tests/aho_shim.py) so the reference's
find_toc_pages/analyse_toc_levels actually run in-sandbox.

Books come from our corpus generator, fed to both sides identically
(post-F1/F2/F3 prepared pages)."""

from __future__ import annotations

import pytest

from tests import aho_shim
from tests.reference_shim import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _prepared_pages(doc_id: int):
    from pdf_craft_spark.corpus import generate_document
    from pdf_craft_spark.operators.document import prepare_pages

    return prepare_pages(generate_document(doc_id))


def _reference_pages(pages):
    types_mod = load_reference_module("pdf_craft.pdf.types")
    out = []
    for p in pages:
        out.append(
            types_mod.Page(
                index=p.index,
                image=None,
                body_layouts=[
                    types_mod.PageLayout(ref=l.kind, det=l.det, text=l.text,
                                         order=l.order, hash=l.media_ref)
                    for l in p.body
                ],
                footnotes_layouts=[
                    types_mod.PageLayout(ref=l.kind, det=l.det, text=l.text,
                                         order=l.order, hash=l.media_ref)
                    for l in p.footnotes
                ],
                input_tokens=0,
                output_tokens=0,
            )
        )
    return out


def _ref_find_toc_pages(ref_pages):
    aho_shim.install()
    toc_pages_mod = load_reference_module("pdf_craft.toc.toc_pages")
    import re

    head_re = re.compile(r"^\s*#{1,6}\s*")
    title_kinds = ("title", "sub_title")
    return toc_pages_mod.find_toc_pages(
        iter_titles=lambda: (
            [
                (lay.order, head_re.sub("", lay.text))
                for lay in page.body_layouts
                if lay.ref in title_kinds
            ]
            for page in ref_pages
        ),
        iter_page_bodies=lambda: (
            "".join(lay.text for lay in page.body_layouts) for page in ref_pages
        ),
    )


def _canon_refs(page_refs) -> list:
    return [
        (
            r.page_index,
            round(r.score, 9),
            sorted(
                (m.text, round(m.score, 9), sorted(map(tuple, (
                    (ref.page_index, ref.order) if hasattr(ref, "page_index") else ref
                    for ref in m.references
                ))))
                for m in r.matched_titles
            ),
        )
        for r in page_refs
    ]


@pytest.mark.parametrize("doc_id", list(range(24)))
def test_find_toc_pages_parity(doc_id):
    from pdf_craft_spark.operators.toclib import find_toc_pages

    pages = _prepared_pages(doc_id)
    ours = _canon_refs(find_toc_pages(pages))
    ref = _canon_refs(_ref_find_toc_pages(_reference_pages(pages)))
    assert ours == ref


@pytest.mark.parametrize("doc_id", list(range(0, 24)))
def test_toc_levels_and_tree_parity(doc_id, tmp_path):
    """Full level inference + tree structuring vs the reference, driven
    through its own XML page files."""
    aho_shim.install()
    types_mod = load_reference_module("pdf_craft.pdf.types")
    xml_mod = load_reference_module("pdf_craft.common.xml")
    reader_mod = load_reference_module("pdf_craft.common.reader")
    levels_mod = load_reference_module("pdf_craft.toc.toc_levels")
    analysing_mod = load_reference_module("pdf_craft.toc.analysing")

    pages = _prepared_pages(doc_id)
    ref_pages = _reference_pages(pages)
    for p in ref_pages:
        xml_mod.save_xml(types_mod.encode(p), tmp_path / f"page_{p.index}.xml")
    reader = reader_mod.XMLReader(prefix="page", dir_path=tmp_path, decode=types_mod.decode)

    ref_toc_pages = _ref_find_toc_pages(ref_pages)
    if ref_toc_pages:
        want_levels = levels_mod.analyse_toc_levels(
            pages=reader, pages_path=tmp_path, toc_pages=ref_toc_pages
        )
    else:
        want_levels = levels_mod.analyse_title_levels(reader)
    want_tree = [
        (t.id, t.page_index, t.order, t.level)
        for t in _flatten(analysing_mod._structure_toc_by_levels(want_levels))
    ]

    from pdf_craft_spark.operators.toclib import (
        analyse_title_levels,
        analyse_toc_levels,
        find_toc_pages,
        structure_toc,
    )

    my_toc_pages = find_toc_pages(pages)
    if my_toc_pages:
        got_levels = analyse_toc_levels(pages, my_toc_pages)
    else:
        got_levels = analyse_title_levels(pages)
    got_tree = [
        (t.id, t.page_index, t.order, t.level) for t in structure_toc(got_levels)
    ]

    assert got_levels == want_levels
    assert got_tree == want_tree


def _flatten(nodes):
    out = []
    for n in nodes:
        out.append(n)
        out.extend(_flatten(n.children))
    return out
