"""E5 parity: our sanitizer vs the reference parse_raw_markdown, compared
on canonical tree serializations, plus ported golden cases."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.reference_shim import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _canon_ref(nodes) -> list:
    types_mod = load_reference_module("pdf_craft.markdown.paragraph.types")
    out = []
    for n in nodes:
        if isinstance(n, str):
            out.append(("t", n))
        else:
            out.append(
                (
                    "tag",
                    n.definition.name,
                    tuple(n.attributes),
                    _canon_ref(n.children),
                )
            )
    return out


def _canon_ours(nodes) -> list:
    from pdf_craft_spark.operators.html_sanitize import Tag

    out = []
    for n in nodes:
        if isinstance(n, str):
            out.append(("t", n))
        else:
            out.append(("tag", n.name, tuple(n.attributes), _canon_ours(n.children)))
    return out


_HTML_ALPHA = st.sampled_from(
    list("ab<>/=\"' xz")
    + ["<b>", "</b>", "<div>", "</div>", "<script>", "</script>", "<center>",
       "</center>", "<foo>", "</foo>", "<img src='http://x'/>", "<!--", "-->",
       "<a href=javascript:x>", "<a href='/ok'>", "<![CDATA[", "]]>", "<!DOCTYPE x>",
       "<B >", "</B >", "<td colspan=2>", "<?php", "?>"]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_HTML_ALPHA, max_size=12).map("".join))
def test_sanitize_parity(text):
    ref = load_reference_module("pdf_craft.markdown.paragraph.parser")
    from pdf_craft_spark.operators.html_sanitize import sanitize_html

    assert _canon_ours(sanitize_html(text)) == _canon_ref(ref.parse_raw_markdown(text))


# --- ported golden semantics (reference tests/test_parser.py themes) ---------
CASES = [
    # comments / PI / CDATA / declarations removed
    ("a<!-- hidden -->b", "ab"),
    ("a<?php evil ?>b", "ab"),
    ("a<![CDATA[x]]>b", "ab"),
    ("a<!DOCTYPE html>b", "ab"),
    # unclosed constructs degrade to a literal '<' text node (markdown
    # escaping of bare text happens later, at render)
    ("a<!-- nope", "a<!-- nope"),
    # GFM tagfilter breaks dangerous tags
    ("<script>alert(1)</script>", "&lt;script>alert(1)&lt;/script>"),
    ("<style>x</style>", "&lt;style>x&lt;/style>"),
    # left/center/right unwrapped
    ("<center>mid</center>", "mid"),
    # whitelisted tag kept, attributes filtered
    ('<b class="x" title="t">bold</b>', '<b title="t">bold</b>'),
    # protocol filtering
    ('<a href="javascript:alert(1)">x</a>', "<a>x</a>"),
    ('<a href="http://ok">x</a>', '<a href="http://ok">x</a>'),
    ('<a href="/rel">x</a>', '<a href="/rel">x</a>'),
    # non-whitelisted escaped but children exposed
    ("<foo><b>inner</b></foo>", "&lt;foo&gt;<b>inner</b>&lt;/foo&gt;"),
    # nested same-name matching
    ("<div>a<div>b</div>c</div>", "<div>a<div>b</div>c</div>"),
    # literal '<' preserved
    ("1 < 2", "1 < 2"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_sanitize_goldens(raw, expected):
    from pdf_craft_spark.operators.html_sanitize import sanitize_html, serialize

    assert serialize(sanitize_html(raw)) == expected
