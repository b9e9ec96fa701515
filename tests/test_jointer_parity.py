"""End-to-end jointer parity: our joint_document_stream vs the reference's
Jointer (W1+J1+E1/E3/E4+W2/W3/W4 composed) on randomized multi-page layout
streams.  This is the strongest single check that the whole stitching
dataflow — reading order, caption absorption, equation/table
normalization, cross-boundary merging, hyphen rejoins — matches the
reference span for span.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.reference_shim import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

# HTML-free alphabet (the reference routes text through its markdown
# parser; '<' '&' would engage the sanitizer layer we model separately)
_WORD = st.text(alphabet=st.sampled_from(list("abcXYZ19一中 .$\\=-‐–")), min_size=0, max_size=14)

_KINDS = ("text", "text", "text", "title", "sub_title", "image", "equation",
          "table", "image_caption", "equation_caption", "table_caption")


@st.composite
def _pages(draw):
    n_pages = draw(st.integers(1, 3))
    pages = []
    for pi in range(1, n_pages + 1):
        n = draw(st.integers(0, 6))
        layouts = []
        for order in range(n):
            kind = draw(st.sampled_from(_KINDS))
            text = draw(_WORD)
            left = draw(st.integers(0, 500))
            top = draw(st.integers(0, 700))
            w = draw(st.integers(10, 90))
            h = draw(st.integers(5, 40))
            media = "h" + str(order) if kind in ("image", "table", "equation") else None
            layouts.append((kind, text, (left, top, left + w, top + h), media, order))
        pages.append((pi, layouts))
    return pages


def _run_reference(pages):
    jmod = load_reference_module("pdf_craft.sequence.jointer")
    types_mod = load_reference_module("pdf_craft.pdf.types")
    chap = load_reference_module("pdf_craft.sequence.chapter")

    ref_pages = []
    for pi, layouts in pages:
        ref_layouts = [
            types_mod.PageLayout(ref=k, det=det, text=t, order=o, hash=m)
            for k, t, det, m, o in layouts
        ]
        ref_pages.append((pi, ref_layouts))

    out = []
    for item in jmod.Jointer(iter(ref_pages)).execute():
        if isinstance(item, chap.ParagraphLayout):
            blocks = []
            for b in item.blocks:
                segs = []
                for part in b.content:
                    if isinstance(part, str):
                        segs.append(("text", part))
                    elif isinstance(part, chap.InlineExpression):
                        kind_code = load_reference_module(
                            "pdf_craft.expression"
                        ).encode_expression_kind(part.kind)
                        segs.append((kind_code, part.content))
                    else:  # HTMLTag — excluded by the alphabet
                        segs.append(("html", ""))
                blocks.append((b.page_index, b.order, tuple(b.det), segs))
            out.append(("para", item.ref, blocks))
        else:
            out.append(
                (
                    "asset",
                    item.ref,
                    item.page_index,
                    tuple(item.det),
                    _content_str(item.title),
                    _content_str(item.content),
                    _content_str(item.caption),
                    item.hash,
                )
            )
    return out


def _content_str(content) -> str:
    """Reference assets keep title/content/caption as parsed Content; we
    keep plain strings — re-render for comparison.  None and empty Content
    are the same downstream (falsy at render), canonicalized to ''."""
    if content is None:
        return ""
    chap = load_reference_module("pdf_craft.sequence.chapter")
    expr = load_reference_module("pdf_craft.expression")

    def ser(parts_list) -> str:
        parts = []
        for part in parts_list:
            if isinstance(part, str):
                parts.append(part)
            elif isinstance(part, chap.InlineExpression):
                parts.append(expr.to_markdown_string(part.kind, part.content))
            else:  # HTMLTag: re-serialize (attr-free tags round-trip exactly)
                name = part.definition.name
                attrs = "".join(
                    f' {k}="{v}"' if v else f" {k}" for k, v in part.attributes
                )
                if part.children:
                    parts.append(f"<{name}{attrs}>{ser(part.children)}</{name}>")
                else:
                    parts.append(f"<{name}{attrs} />")
        return "".join(parts)

    return ser(content)


def _run_ours(pages):
    from pdf_craft_spark.operators.jointer import joint_document_stream, parse_content
    from pdf_craft_spark.operators.latex import to_markdown_string
    from pdf_craft_spark.operators.model import Para, RawLayout

    my_pages = [
        (
            pi,
            [
                RawLayout(kind=k, text=t, det=det, media_ref=m, order=o)
                for k, t, det, m, o in layouts
            ],
        )
        for pi, layouts in pages
    ]
    out = []
    for item in joint_document_stream(my_pages):
        if isinstance(item, Para):
            blocks = [
                (
                    b.page_index,
                    b.order,
                    tuple(b.det),
                    [(s.kind, s.text) for s in b.segs],
                )
                for b in item.blocks
            ]
            out.append(("para", item.kind, blocks))
        else:
            out.append(
                (
                    "asset",
                    item.kind,
                    item.page_index,
                    tuple(item.det),
                    _string_via_segs(item.title),
                    _string_via_segs(item.content),
                    _string_via_segs(item.caption),
                    item.media_ref,
                )
            )
    return out


def _string_via_segs(text: str | None) -> str:
    """Round our plain asset strings through the same parse→render the
    reference applies (its _parse_block_content), for a fair compare."""
    if text is None:
        return ""
    from pdf_craft_spark.operators.jointer import parse_content
    from pdf_craft_spark.operators.latex import KIND_TEXT, to_markdown_string

    parts = []
    for seg in parse_content(text):
        if seg.kind in (KIND_TEXT, "html"):
            parts.append(seg.text)
        else:
            parts.append(to_markdown_string(seg.kind, seg.text))
    return "".join(parts)


@settings(max_examples=250, deadline=None)
@given(_pages())
def test_jointer_stream_parity(pages):
    assert _run_ours(pages) == _run_reference(pages)


def test_jointer_parity_table_and_equation():
    pages = [
        (
            1,
            [
                ("text", "Intro text here", (50, 40, 550, 76), None, 0),
                ("equation", "pre $$x=1$$ post", (50, 90, 550, 130), "h1", 1),
                ("equation_caption", "eq caption", (50, 140, 550, 152), None, 2),
                ("table", "head <table><tr><td>1</td></tr></table> tail",
                 (50, 160, 550, 240), "h2", 3),
                ("text", "continuing para with-", (50, 250, 550, 286), None, 4),
            ],
        ),
        (
            2,
            [
                ("text", "out a break.", (50, 40, 550, 76), None, 0),
            ],
        ),
    ]
    assert _run_ours(pages) == _run_reference(pages)
