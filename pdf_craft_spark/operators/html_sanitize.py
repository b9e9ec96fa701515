"""E5: GFM-subset HTML parsing/sanitization.

Behavioral spec: /root/reference/pdf_craft/markdown/paragraph/parser.py:8-463
and tags.py (GitHub's sanitization whitelist — public spec data):

- comments / processing instructions / CDATA / declarations removed
  (unclosed ones degrade to a literal '<')
- GFM tagfilter: 9 dangerous tags get their leading '<' broken to '&lt;'
- left/center/right are unwrapped (tag dropped, children exposed)
- whitelisted tags survive with attribute filtering; href/src/cite must
  pass the protocol check (http/https/mailto or / ./ ../ relative)
- non-whitelisted tags are entity-escaped but their children are exposed
  and recursively sanitized
- closing-tag matching is nesting- and case-aware

Output is a tree of plain strings and ``Tag`` nodes plus ``serialize`` to
re-emit sanitized HTML text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import escape, unescape

FILTERED_TAGS = frozenset(
    ("title", "textarea", "style", "xmp", "iframe", "noembed", "noframes", "script", "plaintext")
)
IGNORE_TAGS = frozenset(("left", "center", "right"))
ALLOWED_PROTOCOLS = ("http", "https", "mailto")

UNIVERSAL_ATTRIBUTES = frozenset(
    "abbr accept accept-charset accesskey action align alt aria-describedby aria-hidden "
    "aria-label aria-labelledby axis border cellpadding cellspacing char charoff charset "
    "checked clear color cols colspan compact coords datetime dir disabled enctype for "
    "frame headers height hreflang hspace id ismap itemprop itemscope itemtype label lang "
    "longdesc maxlength media method multiple name nohref noshade nowrap open prompt "
    "readonly rel rev role rows rowspan rules scope selected shape size span start summary "
    "tabindex target title type usemap valign value vspace width".split()
)

# tag -> (is_block, extra attributes beyond the universal set)
_BLOCK = True
_INLINE = False
TAG_DEFS: dict[str, tuple[bool, frozenset[str]]] = {
    name: (block, frozenset(extra.split()) | UNIVERSAL_ATTRIBUTES)
    for name, block, extra in (
        ("a", _INLINE, "href"),
        ("abbr", _INLINE, ""), ("b", _INLINE, ""), ("bdo", _INLINE, ""),
        ("blockquote", _BLOCK, "cite"), ("br", _INLINE, ""),
        ("caption", _BLOCK, ""), ("cite", _INLINE, ""), ("code", _INLINE, ""),
        ("dd", _BLOCK, ""), ("del", _INLINE, "cite"), ("details", _BLOCK, ""),
        ("dfn", _INLINE, ""), ("div", _BLOCK, ""), ("dl", _BLOCK, ""),
        ("dt", _BLOCK, ""), ("em", _INLINE, ""), ("figcaption", _BLOCK, ""),
        ("figure", _BLOCK, ""),
        ("h1", _BLOCK, ""), ("h2", _BLOCK, ""), ("h3", _BLOCK, ""),
        ("h4", _BLOCK, ""), ("h5", _BLOCK, ""), ("h6", _BLOCK, ""),
        ("hr", _BLOCK, ""), ("i", _INLINE, ""),
        ("img", _INLINE, "loading src"), ("ins", _INLINE, "cite"),
        ("kbd", _INLINE, ""), ("li", _BLOCK, ""), ("mark", _INLINE, ""),
        ("ol", _BLOCK, "reversed"), ("p", _BLOCK, ""), ("picture", _INLINE, ""),
        ("pre", _BLOCK, ""), ("q", _INLINE, "cite"),
        ("rp", _INLINE, ""), ("rt", _INLINE, ""), ("ruby", _INLINE, ""),
        ("s", _INLINE, ""), ("samp", _INLINE, ""), ("small", _INLINE, ""),
        ("source", _INLINE, "src srcset"), ("span", _INLINE, ""),
        ("strike", _INLINE, ""), ("strong", _INLINE, ""), ("sub", _INLINE, ""),
        ("summary", _BLOCK, ""), ("sup", _INLINE, ""),
        ("table", _BLOCK, ""), ("tbody", _BLOCK, ""), ("td", _BLOCK, ""),
        ("tfoot", _BLOCK, ""), ("th", _BLOCK, ""), ("thead", _BLOCK, ""),
        ("time", _INLINE, ""), ("tr", _BLOCK, ""), ("tt", _INLINE, ""),
        ("ul", _BLOCK, ""), ("var", _INLINE, ""),
        ("video", _BLOCK, "controls poster src"), ("wbr", _INLINE, ""),
    )
}


@dataclass
class Tag:
    name: str
    is_block: bool
    attributes: list[tuple[str, str]] = field(default_factory=list)
    children: list = field(default_factory=list)  # list[str | Tag]


def is_protocol_allowed(url: str) -> bool:
    if not url:
        return True
    if url.startswith(("/", "./", "../")):
        return True
    low = url.lower()
    return any(low.startswith(p + ":") for p in ALLOWED_PROTOCOLS)


_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
_WS_RE = re.compile(r"[ \t\n\r]+")
_ATTR_NAME_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_.:-]*")
_UNQUOTED_RE = re.compile(r"[^ \t\n\r\"'=<>`]+")
_CLOSE_WS_RE = re.compile(r"[ \t\n\r]*>")


def sanitize_html(text: str) -> list:
    """→ list of str | Tag."""
    out: list = []
    pos = 0
    n = len(text)
    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            out.append(text[pos:])
            break
        if lt > pos:
            out.append(text[pos:lt])
        node, new_pos = _construct(text, lt)
        if node is None:
            out.append("<")
            pos = lt + 1
        else:
            if isinstance(node, list):
                out.extend(node)
            elif node != "":
                out.append(node)
            pos = new_pos
    return out


def _construct(text: str, pos: int):
    """Parse one construct at '<'; returns (node|list|''|None, new_pos)."""
    rest = text[pos:]
    for opener, closer in (("<!--", "-->"), ("<?", "?>"), ("<![CDATA[", "]]>")):
        if rest.startswith(opener):
            end = text.find(closer, pos + len(opener))
            if end != -1:
                return "", end + len(closer)
            return None, pos
    if rest.startswith("<!"):
        if pos + 2 < len(text) and text[pos + 2].isalpha():
            end = text.find(">", pos + 2)
            if end != -1:
                return "", end + 1
        return None, pos
    return _tag(text, pos)


def _tag(text: str, pos: int):
    closing = text.startswith("</", pos)
    name_start = pos + (2 if closing else 1)
    m = _NAME_RE.match(text, name_start)
    if not m:
        return None, pos
    name = m.group(0).lower()
    after_name = m.end()

    if closing:
        mm = _CLOSE_WS_RE.match(text, after_name)
        if not mm:
            return None, pos
        end = mm.end()
        if name in FILTERED_TAGS:
            return "&lt;" + text[pos + 1 : end], end
        if name in TAG_DEFS:
            return text[pos:end], end  # kept verbatim as text
        return escape(text[pos:end]), end

    attrs, after_attrs, self_closing = _attributes(text, after_name)
    if after_attrs is None:
        return None, pos

    if name in FILTERED_TAGS:
        return "&lt;" + text[pos + 1 : after_attrs], after_attrs

    if name in IGNORE_TAGS:
        if self_closing:
            return "", after_attrs
        inner, end = _inner_and_end(text, after_attrs, name)
        if inner is not None:
            return sanitize_html(inner) if inner else [], end
        return "", end

    tag_def = TAG_DEFS.get(name)
    if tag_def is not None:
        is_block, allowed = tag_def
        kept = []
        for k, v in attrs:
            if k not in allowed:
                continue
            if k in ("href", "src", "cite") and not is_protocol_allowed(v):
                continue
            kept.append((k, v))
        if self_closing:
            return Tag(name, is_block, kept, []), after_attrs
        inner, end = _inner_and_end(text, after_attrs, name)
        if inner is not None:
            children = sanitize_html(inner) if inner else []
            return Tag(name, is_block, kept, children), end
        return Tag(name, is_block, kept, []), end

    # not whitelisted: escape the tag, expose (and sanitize) the children
    raw = text[pos:after_attrs]
    if self_closing:
        return escape(raw), after_attrs
    inner, end = _inner_and_end(text, after_attrs, name)
    if inner is not None:
        nodes: list = [escape(raw)]
        if inner:
            nodes.extend(sanitize_html(inner))
        nodes.append(escape(f"</{name}>"))
        return nodes, end
    return escape(raw), end


def _attributes(text: str, pos: int):
    attrs: list[tuple[str, str]] = []
    n = len(text)
    while pos < n:
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
        if text.startswith("/>", pos):
            return attrs, pos + 2, True
        if text.startswith(">", pos):
            return attrs, pos + 1, False
        m = _ATTR_NAME_RE.match(text, pos)
        if not m:
            break
        key = m.group(0).lower()
        pos = m.end()
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
        if not text.startswith("=", pos):
            attrs.append((key, ""))
            continue
        pos += 1
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
        value = ""
        if pos < n and text[pos] in "\"'":
            quote = text[pos]
            endq = text.find(quote, pos + 1)
            if endq == -1:
                break
            value = text[pos + 1 : endq]
            pos = endq + 1
        else:
            m = _UNQUOTED_RE.match(text, pos)
            if m:
                value = m.group(0)
                pos = m.end()
        attrs.append((key, unescape(value)))
    return attrs, None, False


def _inner_and_end(text: str, content_start: int, name: str):
    close_pos = _find_closing(text, content_start, name)
    if close_pos == -1:
        return None, content_start
    inner = text[content_start:close_pos]
    gt = text.find(">", close_pos)
    end = (close_pos + len(f"</{name}>")) if gt == -1 else gt + 1
    return inner, end


def _find_closing(text: str, start: int, name: str) -> int:
    """Nesting-aware, case-insensitive closing-tag search (with the
    reference's candidate-completeness quirks, parser.py:396-463)."""
    open_pat = f"<{name}"
    close_pat = f"</{name}"
    low = text.lower()
    pos = start
    depth = 1
    n = len(text)
    while pos < n:
        next_open = -1
        sp = pos
        while sp < n:
            f = low.find(open_pat, sp)
            if f == -1:
                break
            after = f + len(open_pat)
            if after < n and text[after] in " \t\n\r>/":
                next_open = f
                break
            sp = f + 1
        next_close = -1
        sp = pos
        while sp < n:
            f = low.find(close_pat, sp)
            if f == -1:
                break
            after = f + len(close_pat)
            if after < n:
                if text[after] in " \t\n\r>":
                    next_close = f
                    break
                sp = f + 1
            else:
                # closing tag truncated at end of input: rejected outright
                next_close = -1
                break
        if next_close != -1 and (next_open == -1 or next_close < next_open):
            depth -= 1
            if depth == 0:
                return next_close
            pos = next_close + len(close_pat)
        elif next_open != -1:
            depth += 1
            pos = next_open + len(open_pat)
        else:
            break
    return -1


def _escape_attr(value: str) -> str:
    return (
        value.replace("&", "&amp;").replace('"', "&quot;").replace("<", "&lt;").replace(">", "&gt;")
    )


def serialize(nodes: list) -> str:
    """Re-emit sanitized HTML text (the reference's tag-render shape,
    markdown/paragraph/render.py:30-74)."""
    parts: list[str] = []
    for node in nodes:
        if isinstance(node, str):
            parts.append(node)
            continue
        attrs = "".join(
            f' {k}="{_escape_attr(v)}"' if v else f" {k}" for k, v in node.attributes
        )
        if node.children:
            parts.append(f"<{node.name}{attrs}>{serialize(node.children)}</{node.name}>")
        else:
            parts.append(f"<{node.name}{attrs} />")
    return "".join(parts)
