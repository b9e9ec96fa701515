"""E1/E2: LaTeX expression splitter + round-trip rendering.

Behavioral spec: /root/reference/pdf_craft/expression.py:23-220.
Splits text into TEXT / $…$ / $$…$$ / \\(…\\) / \\[…\\] segments with
backslash-escape handling; inline forms reject newlines inside.  Kinds are
the reference's own wire codes: ``text``, ``$``, ``$$``, ``\\(``, ``\\[``.
"""

from __future__ import annotations

KIND_TEXT = "text"
KIND_DOLLAR = "$"
KIND_DDOLLAR = "$$"
KIND_PAREN = "\\("
KIND_BRACKET = "\\["

_CLOSERS = {KIND_DOLLAR: "$", KIND_DDOLLAR: "$$", KIND_PAREN: "\\)", KIND_BRACKET: "\\]"}
_MULTILINE = {KIND_DDOLLAR, KIND_BRACKET}


def to_markdown_string(kind: str, content: str) -> str:
    if kind == KIND_TEXT:
        return content.replace("\\", "\\\\").replace("$", "\\$")
    return kind + content + _CLOSERS[kind]


def _escaped(text: str, pos: int) -> bool:
    k = 0
    while pos - 1 - k >= 0 and text[pos - 1 - k] == "\\":
        k += 1
    return k % 2 == 1


def _find_end(text: str, start: int, closer: str, multiline: bool) -> tuple[int, str] | None:
    n, m = len(text), len(closer)
    i = start
    while i < n:
        c = text[i]
        if not multiline and c == "\n":
            return None
        if text.startswith(closer, i) and not _escaped(text, i):
            return i + m, text[start:i]
        i += 1
    return None


def parse_latex_expressions(text: str) -> list[tuple[str, str]]:
    """Returns [(kind, content), ...]; adjacent plain text is one segment."""
    if not text:
        return []
    if "$" not in text and "\\" not in text:
        return [(KIND_TEXT, text)]  # fast path: no delimiters, no escapes
    out: list[tuple[str, str]] = []
    buf: list[str] = []

    def flush():
        if buf:
            out.append((KIND_TEXT, "".join(buf)))
            buf.clear()

    n = len(text)
    i = 0
    while i < n:
        ch = text[i]
        if ch == "\\" and i + 1 < n:
            k = 0
            while i + k < n and text[i + k] == "\\":
                k += 1
            if k % 2 == 1 and i + k < n and text[i + k] == "$":
                # odd run then $: escaped dollar — halve the backslashes
                buf.append("\\" * (k // 2))
                buf.append("$")
                i = i + k + 1
                continue
            if k >= 2:
                # collapse backslash pairs; a leftover odd one re-enters the loop
                buf.append("\\" * (k // 2))
                i += (k // 2) * 2
                continue
            for kind in (KIND_BRACKET, KIND_PAREN):
                if text.startswith(kind, i) and not _escaped(text, i):
                    hit = _find_end(text, i + 2, _CLOSERS[kind], kind in _MULTILINE)
                    if hit is not None:
                        end, content = hit
                        flush()
                        out.append((kind, content))
                        i = end
                        break
            else:
                buf.append(ch)
                i += 1
            continue
        if text.startswith("$$", i) and not _escaped(text, i):
            hit = _find_end(text, i + 2, "$$", True)
            if hit is not None:
                end, content = hit
                flush()
                out.append((KIND_DDOLLAR, content))
                i = end
                continue
        if ch == "$" and not _escaped(text, i):
            hit = _find_end(text, i + 1, "$", False)
            if hit is not None:
                end, content = hit
                flush()
                out.append((KIND_DOLLAR, content))
                i = end
                continue
        buf.append(ch)
        i += 1

    flush()
    return out
