"""W6 + J2 + W7: footnote reference extraction, mark join, numbering.

Behavioral spec: /root/reference/pdf_craft/sequence/reference.py:11-126
(extraction + first-mark-wins dedup), sequence/generation.py:139-187
(page grouping + body-mark replacement), sequence/chapter.py:68-82 and
markdown/render/render.py:31-36 (global first-appearance numbering).
"""

from __future__ import annotations

import re

from pdf_craft_spark.operators.latex import KIND_TEXT
from pdf_craft_spark.operators.marks import Mark, search_marks, transform2mark
from pdf_craft_spark.operators.model import Asset, Block, FootnoteRef, Para, Seg

_STAR_PREFIX_RE = re.compile(r"^\*{1,6}\s+")

MarkKey = tuple  # ('glyph', clazz, number) | ('star', '*'*k)


def _mark_key(mark: Mark | str) -> MarkKey:
    if isinstance(mark, Mark):
        return ("glyph", mark.clazz, mark.number)
    return ("star", mark)


def _extract_head_mark(segs: list[Seg]) -> tuple[MarkKey | None, list[Seg]]:
    """If the block starts with a footnote mark (``*``-prefix or a glyph),
    strip it and return (key, remaining segs)."""
    if not segs or segs[0].kind != KIND_TEXT:
        return None, segs
    head = segs[0].text.lstrip()
    if not head:
        return None, segs

    key: MarkKey | None = None
    rest = ""
    m = _STAR_PREFIX_RE.match(head)
    if m:
        key = ("star", m.group(0).strip())
        rest = head[m.end() :].lstrip()
    else:
        mark = transform2mark(head[0])
        if mark is not None:
            key = _mark_key(mark)
            rest = head[1:].lstrip()

    new_segs = segs[1:]
    if rest:
        new_segs = [Seg(KIND_TEXT, rest)] + segs[1:]
    return key, new_segs


def extract_page_references(
    page_index: int, items: list
) -> tuple[list[FootnoteRef], dict[MarkKey, FootnoteRef]]:
    """W6 over one page's footnote-area [Para | Asset] stream.

    Each mark starts a FootnoteRef collecting subsequent content; content
    before the first mark is dropped; the mark→ref map keeps the first
    occurrence of each mark key.
    """
    # flatten: paragraphs split at leading marks per block
    stream: list = []  # MarkKey | Para | Asset
    for it in items:
        if isinstance(it, Asset):
            stream.append(it)
            continue
        cur: Para | None = None
        for block in it.blocks:
            key, segs = _extract_head_mark(block.segs)
            if key is None:
                if cur is None:
                    cur = Para(kind=it.kind, level=-1, blocks=[])
                cur.blocks.append(block)
            else:
                if cur is not None and cur.blocks:
                    stream.append(cur)
                stream.append(key)
                cur = Para(
                    kind=it.kind,
                    level=-1,
                    blocks=[
                        Block(
                            page_index=block.page_index,
                            order=block.order,
                            det=block.det,
                            segs=segs,
                        )
                    ],
                )
        if cur is not None and cur.blocks:
            stream.append(cur)

    refs: list[FootnoteRef] = []
    current: FootnoteRef | None = None
    order = 1
    for item in stream:
        if isinstance(item, tuple):  # a mark key
            if current is not None:
                refs.append(current)
            current = FootnoteRef(
                page_index=page_index, order=order, mark_key=item, items=[]
            )
            order += 1
        elif current is not None:
            current.items.append(item)
        # content before the first mark is dropped (reference.py:50-53)
    if current is not None:
        refs.append(current)

    mark2ref: dict[MarkKey, FootnoteRef] = {}
    for ref in refs:
        mark2ref.setdefault(ref.mark_key, ref)
    return refs, mark2ref


def replace_marks_in_block(
    block: Block, mark2ref: dict[MarkKey, FootnoteRef]
) -> None:
    """J2: split every text seg on mark glyphs; known marks become ref segs
    (identity = the footnote's (page_index, order)); unknown glyphs revert
    to their literal char."""
    new_segs: list[Seg] = []
    for seg in block.segs:
        if seg.kind != KIND_TEXT:
            new_segs.append(seg)
            continue
        for piece in search_marks(seg.text):
            if isinstance(piece, Mark):
                ref = mark2ref.get(_mark_key(piece))
                if ref is not None:
                    new_segs.append(Seg("ref", "", ref_key=ref.key))
                else:
                    new_segs.append(Seg(KIND_TEXT, piece.char))
            elif piece:
                new_segs.append(Seg(KIND_TEXT, piece))
    block.segs = new_segs
    join_adjacent_texts(block.segs)


def join_adjacent_texts(segs: list[Seg]) -> None:
    """E7: coalesce adjacent plain-text segments in place."""
    i = 0
    while i < len(segs) - 1:
        if segs[i].kind == KIND_TEXT and segs[i + 1].kind == KIND_TEXT:
            segs[i] = Seg(KIND_TEXT, segs[i].text + segs[i + 1].text)
            del segs[i + 1]
        else:
            i += 1
