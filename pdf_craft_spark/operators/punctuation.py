"""F7: CJK-context punctuation normalization.

Behavioral spec: /root/reference/pdf_craft/sequence/punctuation.py:17-130.
Within one block's ordered text segments: an ASCII ``, ; ? !`` whose
nearest non-space char to the LEFT is Han becomes fullwidth; ``:`` needs
Han on BOTH sides.  Context crosses segment boundaries (the scan runs over
the concatenation), but edits land in the owning segment.
"""

from __future__ import annotations

from pdf_craft_spark.operators.latex import KIND_TEXT
from pdf_craft_spark.operators.model import Asset, Block, Chapter, FootnoteRef, Para
from pdf_craft_spark.operators.textutil import is_han_char

_LEFT_ONLY = {",": "，", ";": "；", "?": "？", "!": "！"}
_BOTH_SIDES = {":": "："}


import re

_CAND_RE = re.compile(r"[,;?!:]")
_HAN_RE = re.compile(
    "["
    "㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002a6df\U0002a700-\U0002b73f\U0002b740-\U0002b81f"
    "\U0002b820-\U0002ceaf\U0002ceb0-\U0002ebef"
    "]"
)


def normalize_segments(texts: list[str]) -> list[str] | None:
    """Returns the rewritten texts, or None when nothing changed."""
    if not texts:
        return None
    # quick reject: a conversion needs an ASCII candidate AND a Han char
    # somewhere in the block — most blocks have neither combination
    joined = "".join(texts)
    if _CAND_RE.search(joined) is None or _HAN_RE.search(joined) is None:
        return None
    chars: list[str] = []
    owners: list[tuple[int, int]] = []
    for si, t in enumerate(texts):
        for ci, ch in enumerate(t):
            chars.append(ch)
            owners.append((si, ci))

    out = [list(t) for t in texts]
    changed = False
    n = len(chars)
    for idx, ch in enumerate(chars):
        left = next(
            (chars[j] for j in range(idx - 1, -1, -1) if not chars[j].isspace()), None
        )
        if left is None:
            continue
        mapped = _LEFT_ONLY.get(ch)
        if mapped is not None:
            if not is_han_char(left):
                continue
        else:
            mapped = _BOTH_SIDES.get(ch)
            if mapped is None:
                continue
            right = next(
                (chars[j] for j in range(idx + 1, n) if not chars[j].isspace()), None
            )
            if right is None or not (is_han_char(left) and is_han_char(right)):
                continue
        si, ci = owners[idx]
        out[si][ci] = mapped
        changed = True

    if not changed:
        return None
    return ["".join(cs) for cs in out]


def _normalize_block(block: Block) -> None:
    texts = [s.text for s in block.segs if s.kind == KIND_TEXT]
    replaced = normalize_segments(texts)
    if replaced is None:
        return
    it = iter(replaced)
    for s in block.segs:
        if s.kind == KIND_TEXT:
            s.text = next(it)


def _normalize_string(text: str | None) -> str | None:
    if not text:
        return text
    replaced = normalize_segments([text])
    return replaced[0] if replaced else text


def _normalize_items(items: list) -> None:
    for it in items:
        if isinstance(it, Para):
            for block in it.blocks:
                _normalize_block(block)
        elif isinstance(it, Asset):
            it.title = _normalize_string(it.title)
            it.caption = _normalize_string(it.caption)


def normalize_punctuation_in_chapter(
    chapter: Chapter, refs_in_chapter: list[FootnoteRef]
) -> None:
    _normalize_items(chapter.items)
    for ref in refs_in_chapter:
        _normalize_items(ref.items)
