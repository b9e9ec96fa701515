"""E9: HTML → GFM table conversion with complexity detection.

Behavioral spec: /root/reference/pdf_craft/markdown/render/table.py:13-82 —
convert simple tables to GFM pipe syntax; preserve the raw HTML whenever
GFM would lose information:

- any cell with colspan > 1 or rowspan > 1
- invalid (non-integer) colspan/rowspan values
- more than one <tbody> section
- nested tables

The reference delegates conversion to markdownify; this is a fresh
minimal converter for the sanitized single-table strings the jointer's E4
stage produces.
"""

from __future__ import annotations

import re

_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
_CELL_RE = re.compile(r"<(t[dh])\b([^>]*)>(.*?)</t[dh]>", re.IGNORECASE | re.DOTALL)
_SPAN_RE = re.compile(r"(col|row)span\s*=\s*(\"([^\"]*)\"|'([^']*)'|(\S+))", re.IGNORECASE)
_TBODY_RE = re.compile(r"<tbody\b", re.IGNORECASE)
_TABLE_RE = re.compile(r"<table\b", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


class _Complex(Exception):
    pass


_STRONG_RE = re.compile(r"<(strong|b)\b[^>]*>(.*?)</\1>", re.IGNORECASE | re.DOTALL)
_EM_RE = re.compile(r"<(em|i)\b[^>]*>(.*?)</\1>", re.IGNORECASE | re.DOTALL)
_BR_RE = re.compile(r"<br\s*/?>", re.IGNORECASE)


def _cell_text(inner: str) -> str:
    if _TABLE_RE.search(inner):
        raise _Complex("nested table")
    inner = _STRONG_RE.sub(r"**\2**", inner)
    inner = _EM_RE.sub(r"*\2*", inner)
    inner = _BR_RE.sub(" ", inner)
    text = _TAG_RE.sub(" ", inner)
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return _WS_RE.sub(" ", text).strip()


def _check_spans(attrs: str) -> None:
    for m in _SPAN_RE.finditer(attrs):
        raw = m.group(3) or m.group(4) or m.group(5) or ""
        try:
            if int(raw) > 1:
                raise _Complex(f"{m.group(1)}span={raw}")
        except ValueError as err:
            raise _Complex("invalid span value") from err


def render_table_content(html_string: str) -> str:
    """GFM pipe table for simple tables; the input HTML verbatim for
    complex ones."""
    try:
        if len(_TBODY_RE.findall(html_string)) > 1:
            raise _Complex("multiple tbody")
        if len(_TABLE_RE.findall(html_string)) > 1:
            raise _Complex("nested table")
        rows: list[list[str]] = []
        for tr in _TR_RE.finditer(html_string):
            cells = []
            for cm in _CELL_RE.finditer(tr.group(1)):
                _check_spans(cm.group(2))
                cells.append(_cell_text(cm.group(3)))
            if cells:
                rows.append(cells)
        if not rows:
            return html_string
        width = max(len(r) for r in rows)
        rows = [r + [""] * (width - len(r)) for r in rows]
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("| " + " | ".join(["---"] * width) + " |")
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)
    except _Complex:
        return html_string
