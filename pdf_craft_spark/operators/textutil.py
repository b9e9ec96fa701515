"""Scalar text predicates and normalizers (F1/F2/F3/F4/F8).

Behavioral spec: /root/reference/pdf_craft/pdf/page_extractor.py:168-189
(normalize + det clamp), pdf/ngrams.py:1-41 (repetition guard),
common/surrogates.py:2-3, language.py:1-19, sequence/jointer.py:17.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")
_HEAD_RE = re.compile(r"^#+\s+")

# CJK ranges for "is chinese char" (language.py:5-19 includes CJK punct +
# fullwidth forms; the narrower han-only set is punctuation.py:119-130).
_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0x3000, 0x303F),
    (0xFF00, 0xFFEF),
)
_HAN_RANGES = (
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0x2CEB0, 0x2EBEF),
)


# all alphabetic codepoints below U+0370, precomputed (hot predicate)
_LATIN_SET = frozenset(chr(cp) for cp in range(0x0370) if chr(cp).isalpha())


def is_latin_letter(ch: str) -> bool:
    return ch in _LATIN_SET


def is_chinese_char(ch: str) -> bool:
    if not ch:
        return False
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def is_han_char(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _HAN_RANGES)


_SURROGATE_RE = re.compile("[\ud800-\udfff]")


def remove_surrogates(text: str) -> str:
    # fast path: lone surrogates are impossible in text decoded from valid
    # UTF-8 (parquet/Arrow), so one C-speed scan usually suffices
    if _SURROGATE_RE.search(text) is None:
        return text
    return _SURROGATE_RE.sub("", text)


def normalize_text(text: str | None) -> str:
    """F1: surrogate strip + whitespace collapse + trim."""
    if text is None:
        return ""
    return _WS_RE.sub(" ", remove_surrogates(text)).strip()


def strip_heading_prefix(text: str) -> str:
    """F4: drop the markdown '#'-prefix OCR puts on title layouts."""
    return _HEAD_RE.sub("", text)


def clamp_det(
    width: int, height: int, det: tuple[int, int, int, int]
) -> tuple[int, int, int, int] | None:
    """F2: clamp the bbox to page bounds; None if degenerate."""
    left, top, right, bottom = det
    left = max(0, min(left, width))
    top = max(0, min(top, height))
    right = max(0, min(right, width))
    bottom = max(0, min(bottom, height))
    if left >= right or top >= bottom:
        return None
    return left, top, right, bottom


def has_repetitive_ngrams(
    text: str, min_ngram: int, max_ngram: int, repeat_threshold: int
) -> bool:
    """F3: consecutive char-n-gram repetition (OCR degeneration guard).

    True iff some n-gram with min_ngram <= n <= max_ngram repeats
    back-to-back >= repeat_threshold times.  Instead of the reference's
    per-position rescan, each n uses a single pass that extends the current
    run — O(len) per n.
    """
    if not text:
        return False
    length = len(text)
    if length < min_ngram * repeat_threshold:
        return False
    top_n = min(max_ngram, length // repeat_threshold)
    for n in range(min_ngram, top_n + 1):
        # a run of equal consecutive n-grams starting at position i lies on
        # alignment phase i % n — scanning every phase covers all starts
        for phase in range(n):
            run = 1
            i = phase + n
            while i + n <= length:
                if text[i : i + n] == text[i - n : i]:
                    run += 1
                    if run >= repeat_threshold:
                        return True
                else:
                    run = 1
                i += n
    return False


# the two bands as one compiled backreference regex — identical semantics
# (16 consecutive copies of a 2-5-gram, or 8 of a 6-20-gram), one C-speed
# scan instead of the per-phase slice loop; equivalence is fuzz-checked
# against has_repetitive_ngrams (and the JVM twin in plans/pipeline.py
# uses the same pattern)
_REPETITION_RE = re.compile(r"(.{2,5})\1{15}|(.{6,20})\2{7}", re.S)


def is_degenerate_ocr_text(text: str) -> bool:
    """The reference's two-band policy (page_extractor.py:114-123)."""
    if len(text) < 32:  # 2-char gram x16 needs >= 32 chars
        return False
    return _REPETITION_RE.search(text) is not None
