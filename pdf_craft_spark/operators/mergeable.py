"""W3: cross-boundary paragraph mergeability predicate.

Behavioral spec: /root/reference/pdf_craft/sequence/mergeable.py:79-120
(which itself follows MinerU's para_split heuristics):

1. prev ends with a sentence-stop glyph → no merge
2. prev ends with a continuation glyph → must merge
3. prev ends latin+hyphen and next starts latin → merge (split word)
4. next starts with an enumeration pattern (number form × wrapper) and has
   content beyond the number → no merge
5. otherwise → merge
"""

from __future__ import annotations

import re

from pdf_craft_spark.operators.textutil import is_latin_letter

# NOTE: the reference's source (mergeable.py:10-28) intends curly quotes but
# its adjacent '"""' lines parse as ONE triple-quoted string ',\n    ' — the
# effective set has NO quote glyphs plus one never-matching entry (text is
# rstripped before the endswith and that entry ends in a space).  Reproduced
# exactly for behavioral parity.
STOP_GLYPHS = (
    ".", "!", "?", "。", "！", "？", ")", "）", ",\n    ", ";", "；",
    "]", "】", "}", ">", "》",
)
CONTINUE_GLYPHS = ("[", "【", "{", "<", "《", "、", ",", "，")
LINK_GLYPHS = ("‐", "‑", "‒", "–", "—", "―")

_FORMS = (r"\d+", r"[IVXLC]+", r"[ivxlc]+", r"[一二三四五六七八九十百]+")
_WRAPS = (
    (r"\(", r"\)"),
    (r"（", r"）"),
    (r"\[", r"\]"),
    (r"<", r">"),
    ("", r"\."),
    ("", r"\)"),
    ("", r"、"),
)
NUMBERING_RES = tuple(
    re.compile(f"^{lt}{form}{rt}") for form in _FORMS for lt, rt in _WRAPS
)


def ends_with_split_word(text1: str, text2_first_char: str) -> bool:
    return (
        len(text1) >= 2
        and text1[-1] in LINK_GLYPHS
        and is_latin_letter(text1[-2])
        and is_latin_letter(text2_first_char)
    )


def starts_with_numbering(text2_stripped: str, has_more_content: bool) -> bool:
    for pat in NUMBERING_RES:
        m = pat.match(text2_stripped)
        if m and (has_more_content or bool(text2_stripped[m.end() :].strip())):
            return True
    return False


def check_mergeable(
    text1: str | None,
    text2: str | None,
    next_has_more_segments: bool = False,
) -> bool:
    """text1: last plain-text segment of the previous paragraph (None when
    the boundary segment is not plain text); text2: first of the next."""
    if text1 is None or text2 is None:
        return False
    t1 = text1.rstrip()
    t2 = text2.lstrip()
    if not t1 or not t2:
        return False
    if t1.endswith(STOP_GLYPHS):
        return False
    if t1.endswith(CONTINUE_GLYPHS):
        return True
    if ends_with_split_word(text1, text2[0]):
        return True
    if starts_with_numbering(t2, next_has_more_segments):
        return False
    return True
