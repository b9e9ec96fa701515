"""Behavioral parity: our fresh kernel implementations vs the reference's
actual code (imported read-only through tests/reference_shim).  Skipped
wholesale when /root/reference is absent — the standalone golden tests in
test_operators.py cover the same semantics without the checkout.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.reference_shim import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

# text alphabets tuned to hit the interesting glyph classes
_GLYPHS = ".!?。！？)）;；]】}>》[【{<《、,，‐‑–—―-①②⑩❶➀⓵㊿Ⅳⅸ０𝟑 \n\t#$\\"
_TEXT = st.text(alphabet=st.sampled_from(list("abcXYZ123一二三中文 " + _GLYPHS)), max_size=24)


@settings(max_examples=300, deadline=None)
@given(_TEXT, _TEXT, st.booleans())
def test_mergeable_parity(t1, t2, multi):
    ref = load_reference_module("pdf_craft.sequence.mergeable")
    from pdf_craft_spark.operators.mergeable import check_mergeable

    content2 = [t2, "x"] if multi else [t2]
    expected = ref.check_mergeable([t1], content2)
    assert check_mergeable(t1, t2, next_has_more_segments=multi) == expected


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(min_value=0.5, max_value=200), max_size=24),
    st.floats(min_value=0.0, max_value=1.0),
    st.integers(min_value=1, max_value=6),
)
def test_cv_splitter_parity(sizes, max_cv, max_groups):
    ref = load_reference_module("pdf_craft.common.cv_splitter")
    from pdf_craft_spark.operators.cv_split import split_by_cv

    payloads = list(range(len(sizes)))
    expected = ref.split_by_cv(list(zip(sizes, payloads)), max_cv=max_cv, max_groups=max_groups)
    got = split_by_cv(sizes, payloads, max_cv=max_cv, max_groups=max_groups)
    assert got == expected


_LATEX = st.text(
    alphabet=st.sampled_from(list("ab1$\\()[]{}^_= \n")), max_size=30
)


@settings(max_examples=400, deadline=None)
@given(_LATEX)
def test_latex_parser_parity(text):
    ref = load_reference_module("pdf_craft.expression")
    from pdf_craft_spark.operators.latex import parse_latex_expressions

    expected = [
        (ref.encode_expression_kind(item.kind), item.content)
        for item in ref.parse_latex_expressions(text)
    ]
    assert parse_latex_expressions(text) == expected


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 600), st.integers(0, 800), st.integers(1, 600), st.integers(1, 800)
        ),
        max_size=14,
    )
)
def test_reading_serials_parity(raw_boxes):
    ref = load_reference_module("pdf_craft.sequence.reading_serials")
    from pdf_craft_spark.operators.reading_order import split_reading_serials

    boxes = [(l, t, l + w, t + h) for l, t, w, h in raw_boxes]

    class _L:
        def __init__(self, i, det):
            self.i = i
            self.det = det

    layouts = [_L(i, det) for i, det in enumerate(boxes)]
    expected = [[lay.i for lay in grp] for grp in ref.split_reading_serials(layouts)]
    assert split_reading_serials(boxes) == expected


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("aZé ü- ‐–。中，.#?!；:《》%&" )), max_size=30))
def test_toc_normalize_parity(text):
    ref = load_reference_module("pdf_craft.toc.text")
    from pdf_craft_spark.operators.toclib import normalize_match_text

    assert normalize_match_text(text) == ref.normalize_text(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab1.")), max_size=60))
def test_ngrams_parity(text):
    ref = load_reference_module("pdf_craft.pdf.ngrams")
    from pdf_craft_spark.operators.textutil import has_repetitive_ngrams

    for (lo, hi, k) in ((2, 5, 16), (2, 3, 4), (1, 4, 3)):
        assert has_repetitive_ngrams(text, lo, hi, k) == ref.has_repetitive_ngrams(
            text, lo, hi, k
        ), (text, lo, hi, k)


def test_mark_table_parity():
    ref = load_reference_module("pdf_craft.sequence.mark")
    from pdf_craft_spark.operators.marks import MARK_TABLE

    ref_marks = ref._number_marks.marks
    assert set(ref_marks) == set(MARK_TABLE)
    # identity used by the footnote join is (class, number): group both
    # tables by it and compare glyph partitions
    def part(table, clazz_of, num_of):
        groups = {}
        for ch, m in table.items():
            groups.setdefault((clazz_of(m), num_of(m)), set()).add(ch)
        return groups

    ref_part = part(ref_marks, lambda m: m.clazz.name, lambda m: m.number)
    my_part = part(MARK_TABLE, lambda m: m.clazz, lambda m: m.number)
    ref_by_num = {}
    for (clazz, num), chars in ref_part.items():
        ref_by_num.setdefault(num, []).append((clazz, frozenset(chars)))
    my_by_num = {}
    for (clazz, num), chars in my_part.items():
        my_by_num.setdefault(num, []).append((clazz, frozenset(chars)))
    for num, entries in ref_by_num.items():
        assert {c for _, cs in entries for c in cs} == {
            c for _, cs in my_by_num[num] for c in cs
        }, num
    # equality partition must match exactly (same glyphs joinable)
    assert {frozenset(v) for v in ref_part.values()} == {
        frozenset(v) for v in my_part.values()
    }


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from(list("a中，,;?!: .文")), max_size=10), max_size=4))
def test_punctuation_parity(texts):
    ref = load_reference_module("pdf_craft.sequence.punctuation")
    from pdf_craft_spark.operators.punctuation import normalize_segments

    assert normalize_segments(texts) == ref._normalize_segments(texts)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab①⑩❶*㊿ ")), max_size=16))
def test_search_marks_parity(text):
    ref = load_reference_module("pdf_craft.sequence.mark")
    from pdf_craft_spark.operators.marks import Mark, search_marks

    expected = [
        (p.char, p.number) if not isinstance(p, str) else p
        for p in ref.search_marks(text)
    ]
    got = [
        (p.char, p.number) if isinstance(p, Mark) else p for p in search_marks(text)
    ]
    assert got == expected
