"""TitleMatcher (Aho-Corasick path) must report exactly the overlapping
occurrence counts ``count_overlapping`` (== the reference automaton's
``iter``) reports — fuzzed over adversarial pattern sets (nested patterns,
shared prefixes/suffixes, overlaps), plus a long-book linearity check."""

from __future__ import annotations

import random
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_craft_spark.operators.toclib import TitleMatcher, count_overlapping


class _ForcedAC(TitleMatcher):
    """Always use the automaton, regardless of inventory size."""

    _AC_MIN_PATTERNS = 0


def _truth(body: str, patterns: list[str]) -> dict[int, int]:
    return {
        pid: c
        for pid, p in enumerate(patterns)
        if (c := count_overlapping(body, p))
    }


@given(
    body=st.text(alphabet="abc", max_size=400),
    patterns=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=24,
        unique=True,
    ),
)
@settings(max_examples=300, deadline=None)
def test_matcher_fuzz(body, patterns):
    assert _ForcedAC(patterns).counts(body) == _truth(body, patterns)
    assert TitleMatcher(patterns).counts(body) == _truth(body, patterns)


def test_matcher_nested_and_overlapping():
    # suffix-chain patterns: every occurrence must be counted, overlapping
    patterns = ["a", "aa", "aaa", "ab", "bab", "abab", "ababab", "ba", "b", "aba"]
    body = "ababab" * 5 + "aaaa" + "bab"
    assert _ForcedAC(patterns).counts(body) == _truth(body, patterns)


def test_matcher_small_inventory_path():
    # < _AC_MIN_PATTERNS uses the find() strategy — same results
    patterns = ["chapter one", "chapter two"]
    body = "chapter one chapter two chapter one"
    m = TitleMatcher(patterns)
    assert not m._use_ac
    assert m.counts(body) == {0: 2, 1: 1}


def test_long_book_scan_is_linear():
    """Quadrupling the title inventory must not quadruple body-scan time
    (the old per-title loop was O(body × titles)): the automaton scan at
    256 vs 1024 patterns over the same body should stay near 1x (matches
    are sparse), far below the ~4x a quadratic scan shows.  Generous
    bound (2.5x) to tolerate CI noise."""
    rng = random.Random(7)
    words = ["spark", "merge", "scan", "column", "window", "batch", "order"]

    def mktitle(i):
        return f"chapter {i} " + " ".join(rng.choice(words) for _ in range(3))

    titles_small = [mktitle(i) for i in range(256)]
    titles_big = [mktitle(i) for i in range(1024)]
    body = " ".join(rng.choice(words) for _ in range(30000))

    def scan_time(titles):
        m = TitleMatcher(titles)
        assert m._use_ac
        t0 = time.perf_counter()
        for _ in range(3):
            m.counts(body)
        return time.perf_counter() - t0

    scan_time(titles_small)  # warm
    ratio = scan_time(titles_big) / max(scan_time(titles_small), 1e-9)
    assert ratio < 2.5, f"4x titles -> {ratio:.2f}x scan time (expected ~1x)"


def test_counts_by_page_matches_per_page_counts():
    """The per-document scan (joined bodies + separator) must report
    exactly what per-page counts() does, on both strategies."""
    patterns = ["ab", "abab", "ba", "x"]
    bodies = ["ababab", "", "xxba", "no match here", "ab\x01ba"]
    for M in (TitleMatcher, _ForcedAC):
        m = M(patterns)
        expect = [m.counts(b) for b in bodies]
        assert m.counts_by_page(bodies) == expect, M.__name__
    # patterns never span the separator
    m = TitleMatcher(["ab"])
    assert m.counts_by_page(["a", "b"]) == [{}, {}]
    assert TitleMatcher(["ab"]).counts_by_page([]) == []


def test_counts_by_page_nul_safe():
    """Literal NULs in page bodies (valid in Arrow/parquet strings, not
    stripped by F1) must neither crash the automaton path nor shift page
    attribution; a NUL-bearing PATTERN falls back to per-page scans
    rather than matching across a page seam."""
    bodies = ["x\x00y", "abc", "", "a\x00\x00b"]
    pats = ["ab", "x", "y"]
    for M in (TitleMatcher, _ForcedAC):
        m = M(pats)
        assert m.counts_by_page(bodies) == [m.counts(b) for b in bodies], M.__name__
    # pattern containing the separator: per-page truth, never cross-seam
    m = TitleMatcher(["y\x00a"])  # would match joined("x\x00y","abc") seam
    assert m.counts_by_page(["x\x00y", "abc"]) == [{}, {}]
    assert m.counts_by_page(["q y\x00a z", "abc"]) == [{0: 1}, {}]
