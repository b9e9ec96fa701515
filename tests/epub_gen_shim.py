"""Typed stand-in for the external ``epub-generator`` package: faithful
dataclasses for the record API subset the reference's epub renderer
constructs (epub/render.py imports), plus a ``generate_epub`` that simply
CAPTURES the EpubData instead of writing a container.  Installed into
sys.modules before the reference's epub modules are imported, so the
reference's record conversion runs for real and its output is inspectable."""

from __future__ import annotations

import sys
import types
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable


class TextKind(Enum):
    HEADLINE = "headline"
    BODY = "body"


@dataclass
class TextBlock:
    kind: TextKind
    level: int
    content: list


@dataclass
class Formula:
    latex_expression: str
    title: list = field(default_factory=list)
    caption: list = field(default_factory=list)


@dataclass
class Image:
    path: Any
    title: list = field(default_factory=list)
    caption: list = field(default_factory=list)


@dataclass
class Table:
    title: list
    caption: list
    html_content: Any


@dataclass
class Mark:
    id: int


@dataclass
class HTMLTag:
    name: str
    attributes: Any
    content: list


@dataclass
class Footnote:
    id: int
    contents: list


@dataclass
class Chapter:
    elements: list
    footnotes: list


@dataclass
class TocItem:
    title: str
    get_chapter: Callable | None = None
    children: list = field(default_factory=list)


@dataclass
class BookMeta:
    title: str | None = None
    description: str | None = None
    publisher: str | None = None
    isbn: str | None = None
    authors: list = field(default_factory=list)
    editors: list = field(default_factory=list)
    translators: list = field(default_factory=list)
    modified: Any = None


@dataclass
class EpubData:
    meta: Any = None
    get_head: Callable | None = None
    chapters: list = field(default_factory=list)
    cover_image_path: Any = None


class LaTeXRender(Enum):
    MATHML = "mathml"
    SVG = "svg"
    CLIPPING = "clipping"


class TableRender(Enum):
    HTML = "html"
    CLIPPING = "clipping"


ChapterGetter = Callable

CAPTURED: list[EpubData] = []


def generate_epub(epub_data: EpubData, **kwargs) -> None:
    CAPTURED.append(epub_data)


def install() -> None:
    mod = sys.modules.get("epub_generator")
    if mod is not None and getattr(mod, "__typed_epub__", False):
        return
    mod = types.ModuleType("epub_generator")
    for name, obj in globals().items():
        if not name.startswith("_"):
            setattr(mod, name, obj)
    mod.__typed_epub__ = True
    sys.modules["epub_generator"] = mod
    # reference epub modules already bound to the _Any stub must re-import
    for name in list(sys.modules):
        if name.startswith("pdf_craft.epub"):
            del sys.modules[name]
