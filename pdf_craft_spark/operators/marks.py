"""E6/J2 support: footnote mark glyph table + scan/split.

Behavioral spec: /root/reference/pdf_craft/sequence/mark.py:35-395.
The reference enumerates ~200 glyphs literally; here the same inventory is
generated from the Unicode block arithmetic.  A mark's identity (used for
the body-mark ⋈ footnote-reference join) is ``(number_class, number)`` —
e.g. ① matches ➀ and ⓵ (all CIRCLED class) but not ❶ (BLACK_CIRCLED).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# number classes (join identity)
ROMAN = "roman"
LOWER_ROMAN = "lower_roman"
CIRCLED = "circled"
PARENTHESIZED_CHINESE = "paren_chinese"
CIRCLED_CHINESE = "circled_chinese"
BLACK_CIRCLED = "black_circled"
UNBOUNDED = "unbounded"


@dataclass(frozen=True)
class Mark:
    number: int
    char: str
    clazz: str

    @property
    def key(self) -> tuple[str, int]:
        return (self.clazz, self.number)


def _seq(clazz: str, start_cp: int, first_number: int, count: int):
    for k in range(count):
        yield Mark(number=first_number + k, char=chr(start_cp + k), clazz=clazz)


def _build_table() -> dict[str, Mark]:
    marks: list[Mark] = []
    marks += _seq(ROMAN, 0x2160, 1, 12)  # Ⅰ..Ⅻ
    marks += _seq(LOWER_ROMAN, 0x2170, 1, 12)  # ⅰ..ⅻ
    marks += _seq(CIRCLED, 0x24EA, 0, 1)  # ⓪
    marks += _seq(CIRCLED, 0x2460, 1, 20)  # ①..⑳
    marks += _seq(CIRCLED, 0x3251, 21, 15)  # ㉑..㉟
    marks += _seq(CIRCLED, 0x32B1, 36, 15)  # ㊱..㊿
    # ⓵..⓾ double circled: the reference numbers these 0..9 (mark.py:196-218,
    # off-by-one vs Unicode names) — reproduced verbatim for join parity
    marks += _seq(CIRCLED, 0x24F5, 0, 10)
    marks += _seq(CIRCLED, 0x2780, 1, 10)  # ➀..➉ sans-serif
    marks += _seq(BLACK_CIRCLED, 0x278A, 1, 10)  # ➊..➓ sans-serif black
    marks += _seq(BLACK_CIRCLED, 0x24FF, 0, 1)  # ⓿
    marks += _seq(BLACK_CIRCLED, 0x2776, 1, 10)  # ❶..❿
    marks += _seq(BLACK_CIRCLED, 0x24EB, 11, 10)  # ⓫..⓴
    marks += _seq(PARENTHESIZED_CHINESE, 0x3220, 1, 10)  # ㈠..㈩
    marks += _seq(CIRCLED_CHINESE, 0x3280, 1, 10)  # ㊀..㊉
    marks += _seq(UNBOUNDED, 0xFF10, 0, 10)  # ０..９ fullwidth
    marks += _seq(UNBOUNDED, 0x1D7EC, 0, 10)  # 𝟬..𝟵 sans-serif bold
    marks += _seq(UNBOUNDED, 0x1D7CE, 0, 10)  # 𝟎..𝟗 bold
    marks += _seq(UNBOUNDED, 0x1D7D8, 0, 10)  # 𝟘..𝟡 double-struck
    marks += _seq(UNBOUNDED, 0x1F101, 0, 10)  # 🄁..🄊 digit comma
    return {m.char: m for m in marks}


MARK_TABLE: dict[str, Mark] = _build_table()

_SPLIT_RE = re.compile("([" + "".join(sorted(MARK_TABLE)) + "])")


def transform2mark(ch: str) -> Mark | None:
    return MARK_TABLE.get(ch)


def search_marks(text: str) -> list[Mark | str]:
    """Split text on mark glyphs; glyph pieces become Mark objects."""
    return [transform2mark(p) or p for p in _SPLIT_RE.split(text)]
