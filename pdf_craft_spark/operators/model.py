"""In-kernel content model for one document.

A simplified-but-faithful mirror of the reference's record hierarchy
(/root/reference/pdf_craft/sequence/chapter.py:13-65): rich paragraph
content is a flat list of typed segments (plain text, inline LaTeX,
footnote references) instead of a recursive HTML tree — the HTML
sanitizer layer (E5) keeps table markup as raw text in this engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pdf_craft_spark.operators.latex import KIND_TEXT


@dataclass
class Seg:
    kind: str  # 'text' | '$' | '$$' | '\\(' | '\\[' | 'ref'
    text: str  # for 'ref': placeholder, ref identity in ``ref_key``
    ref_key: tuple[int, int] | None = None  # (page_index, order) of Reference


@dataclass
class Block:
    """Physical fragment of a paragraph (one OCR layout)."""

    page_index: int
    order: int
    det: tuple[int, int, int, int]
    segs: list[Seg]


@dataclass
class Para:
    kind: str  # 'text' | 'title' | 'sub_title' | footnote-area kinds
    level: int
    blocks: list[Block]

    def first_text(self) -> str | None:
        for b in self.blocks:
            if b.segs:
                return b.segs[0].text if b.segs[0].kind == KIND_TEXT else None
        return None

    def last_text(self) -> str | None:
        for b in reversed(self.blocks):
            if b.segs:
                return b.segs[-1].text if b.segs[-1].kind == KIND_TEXT else None
        return None


@dataclass
class Asset:
    page_index: int
    kind: str  # 'image' | 'table' | 'equation'
    det: tuple[int, int, int, int]
    title: str | None
    content: str
    caption: str | None
    media_ref: str | None


@dataclass
class FootnoteRef:
    """One footnote definition; identity is (page_index, order)."""

    page_index: int
    order: int
    mark_key: tuple[str, int] | str
    items: list = field(default_factory=list)  # list[Para | Asset]

    @property
    def key(self) -> tuple[int, int]:
        return (self.page_index, self.order)


@dataclass
class Chapter:
    id: int | None  # None == preamble head chapter
    level: int
    items: list = field(default_factory=list)  # list[Para | Asset]


@dataclass
class RawLayout:
    """One classified OCR layout as it arrives from the raw span table."""

    kind: str
    text: str
    det: tuple[int, int, int, int]
    media_ref: str | None
    order: int  # per page+area emission order


@dataclass
class RawPage:
    index: int
    width: int
    height: int
    body: list[RawLayout] = field(default_factory=list)
    footnotes: list[RawLayout] = field(default_factory=list)
    # F9: non-None marks a failed page; '' = no rasterized image survived,
    # else the sha-256 of the full-page image (pdf/ocr.py:230-263)
    error: str | None = None


@dataclass
class OutSpan:
    kind: str
    text: str | None
    media_ref: str | None
    offset: int
    chapter_id: int | None = None
