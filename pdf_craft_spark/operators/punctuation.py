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
    """Returns the rewritten texts, or None when nothing changed.

    Only candidate positions (regex finditer over the concatenation) are
    visited; left/right non-space context comes from small local scans of
    the joined string — no per-char owner list materialization."""
    if not texts:
        return None
    # quick reject: a conversion needs an ASCII candidate AND a Han char
    # somewhere in the block — most blocks have neither combination
    joined = "".join(texts)
    if _CAND_RE.search(joined) is None or _HAN_RE.search(joined) is None:
        return None

    n = len(joined)
    edits: dict[int, str] = {}  # global index -> replacement char
    for m in _CAND_RE.finditer(joined):
        idx = m.start()
        ch = joined[idx]
        j = idx - 1
        while j >= 0 and joined[j].isspace():
            j -= 1
        if j < 0:
            continue
        left = joined[j]
        mapped = _LEFT_ONLY.get(ch)
        if mapped is not None:
            if not is_han_char(left):
                continue
        else:
            mapped = _BOTH_SIDES[ch]
            k = idx + 1
            while k < n and joined[k].isspace():
                k += 1
            if k >= n or not (is_han_char(left) and is_han_char(joined[k])):
                continue
        edits[idx] = mapped

    if not edits:
        return None
    # land each edit in its owning segment
    positions = sorted(edits)
    pi = 0
    out: list[str] = []
    base = 0
    for t in texts:
        end = base + len(t)
        if pi < len(positions) and positions[pi] < end:
            lst = list(t)
            while pi < len(positions) and positions[pi] < end:
                lst[positions[pi] - base] = edits[positions[pi]]
                pi += 1
            out.append("".join(lst))
        else:
            out.append(t)
        base = end
    return out


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
