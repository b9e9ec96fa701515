"""J1 + E1/E3/E4 + W2/W3/W4: the per-document span jointer.

Behavioral spec: /root/reference/pdf_craft/sequence/jointer.py:38-356.

Consumes (page_index, [RawLayout]) streams (already reading-ordered into
serials by W1), and produces the ordered Para/Asset sequence with:
- J1: asset ⋈ immediately-following caption layouts
- E3/E4: equation/table title/content/caption normalization
- E1: LaTeX expression splitting of paragraph text
- W2: cross-serial paragraph stitching with held last-tail + asset
  buffering (assets seen while a paragraph is held are emitted after it)
- W3: the mergeability predicate (see mergeable.py)
- W4: hyphenated-word rejoin at intra-paragraph block boundaries
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pdf_craft_spark.operators.latex import KIND_TEXT, parse_latex_expressions, to_markdown_string
from pdf_craft_spark.operators.mergeable import check_mergeable, ends_with_split_word
from pdf_craft_spark.operators.model import Asset, Block, Para, RawLayout, Seg
from pdf_craft_spark.operators.reading_order import split_reading_serials
from pdf_craft_spark.operators.textutil import is_latin_letter, strip_heading_prefix

ASSET_KINDS = ("image", "table", "equation")
TITLE_KINDS = ("title", "sub_title")
CAPTION_KINDS = tuple(f"{k}_caption" for k in ASSET_KINDS)

_TABLE_RE = re.compile(r"<table[^>]*>.*?</table>", re.IGNORECASE | re.DOTALL)


def _latex_segs(text: str, segs: list[Seg]) -> None:
    for kind, content in parse_latex_expressions(text):
        if kind == KIND_TEXT:
            if content:
                segs.append(Seg(KIND_TEXT, content))
        else:
            segs.append(Seg(kind, content))


def parse_content(text: str | None) -> list[Seg]:
    """E5 (HTML sanitize) + E1 (LaTeX split) over plain text → typed
    segments.  Sanitized tags become 'html' segs carrying re-serialized
    markup (rendered verbatim; LaTeX inside tag children stays inline —
    the reference types it, which only changes render-time $-escaping)."""
    if not text:
        return []
    segs: list[Seg] = []
    if "<" in text:
        from pdf_craft_spark.operators.html_sanitize import sanitize_html, serialize

        for node in sanitize_html(text):
            if isinstance(node, str):
                _latex_segs(node, segs)
            else:
                segs.append(Seg("html", serialize([node])))
    else:
        _latex_segs(text, segs)
    return segs


@dataclass
class _AssetHolder:
    page_index: int
    kind: str
    det: tuple[int, int, int, int]
    title: str | None
    content: str
    caption: str | None
    media_ref: str | None


def _normalize_equation(h: _AssetHolder) -> None:
    """E3: first LaTeX expression becomes content; preceding text joins the
    title; trailing items (re-rendered) + old caption join the caption."""
    if h.kind != "equation" or not h.content:
        return
    expr: str | None = None
    prefix: list[str] = []
    tail: list[tuple[str, str]] = []
    for kind, content in parse_latex_expressions(h.content):
        if expr is None and kind != KIND_TEXT:
            expr = content
        elif expr is not None:
            tail.append((kind, content))
        else:
            prefix.append(content)
    if expr is None:
        return
    if h.title is not None:
        prefix.insert(0, h.title)
    if h.caption is not None:
        tail.append((KIND_TEXT, h.caption))
    if prefix:
        h.title = "".join(prefix)
    h.content = expr
    if tail:
        h.caption = "".join(to_markdown_string(k, c) for k, c in tail)


def _normalize_table(h: _AssetHolder) -> None:
    """E4: isolate the first <table>…</table>; text before → title, after →
    caption (the literal "\\n" separators travel through the buffers)."""
    table: str | None = None
    head: list[str] = []
    tail: list[str] = []
    for part in (h.title, "\n", h.content, "\n", h.caption):
        if not part:
            continue
        m = _TABLE_RE.search(part)
        if not m:
            (head if table is None else tail).append(part)
            continue
        before = part[: m.start()].rstrip()
        after = part[m.end() :].lstrip()
        if before.strip():
            head.append(before)
        if after.strip():
            tail.append(after)
        table = m.group(0)
    if table is None:
        return
    head_s = "".join(head).strip()
    tail_s = "".join(tail).strip()
    h.title = head_s or None
    h.caption = tail_s or None
    h.content = table


def join_asset_layouts(page_index: int, layouts: list[RawLayout]) -> list:
    """J1 + E3/E4 + per-layout content parse → [Para | Asset]."""
    out: list = []
    holder: _AssetHolder | None = None

    def flush():
        nonlocal holder
        if holder is None:
            return
        if holder.kind == "equation":
            _normalize_equation(holder)
        if holder.kind == "table":
            _normalize_table(holder)
        out.append(
            Asset(
                page_index=holder.page_index,
                kind=holder.kind,
                det=holder.det,
                title=holder.title,
                content=holder.content,
                caption=holder.caption,
                media_ref=holder.media_ref,
            )
        )
        holder = None

    for lay in layouts:
        if lay.kind in ASSET_KINDS:
            flush()
            holder = _AssetHolder(
                page_index=page_index,
                kind=lay.kind,
                det=lay.det,
                title=None,
                content=lay.text,
                caption=None,
                media_ref=lay.media_ref,
            )
        elif lay.kind in CAPTION_KINDS:
            if holder is not None:
                holder.caption = (
                    holder.caption + "\n" + lay.text if holder.caption else lay.text
                )
            # non-adjacent caption (no open asset) is dropped — jointer.py:171-176
        else:
            flush()
            text = lay.text
            if lay.kind in TITLE_KINDS:
                text = strip_heading_prefix(text)
            out.append(
                Para(
                    kind=lay.kind,
                    level=-1,
                    blocks=[
                        Block(
                            page_index=page_index,
                            order=lay.order,
                            det=lay.det,
                            segs=parse_content(text),
                        )
                    ],
                )
            )
    flush()
    return out


def _can_merge(p1: Para, p2: Para) -> bool:
    if p1.kind != "text" or p1.kind != p2.kind:
        return False
    b1 = p1.blocks[-1]
    b2 = p2.blocks[0]
    t1 = b1.segs[-1].text if b1.segs and b1.segs[-1].kind == KIND_TEXT else None
    t2 = b2.segs[0].text if b2.segs and b2.segs[0].kind == KIND_TEXT else None
    return check_mergeable(t1, t2, next_has_more_segments=len(b2.segs) > 1)


def rejoin_hyphenated_words(para: Para) -> None:
    """W4: move the leading latin run of a block across the hyphen split."""
    if len(para.blocks) < 2:
        return
    for i in range(1, len(para.blocks)):
        b1, b2 = para.blocks[i - 1], para.blocks[i]
        if not b1.segs or b1.segs[-1].kind != KIND_TEXT:
            continue
        if not b2.segs or b2.segs[0].kind != KIND_TEXT:
            continue
        t1 = b1.segs[-1].text.rstrip()
        t2 = b2.segs[0].text.lstrip()
        if not (t1 and t2 and ends_with_split_word(t1, t2[0])):
            continue
        run = 0
        for ch in t2:
            if is_latin_letter(ch):
                run += 1
            else:
                break
        b1.segs[-1].text = t1[:-1] + t2[:run]
        rest = t2[run:].lstrip()
        if rest:
            b2.segs[0].text = rest
        else:
            del b2.segs[0]
    para.blocks = [b for b in para.blocks if b.segs]


def _split_head_body_tail(items: list) -> tuple[list, list, list]:
    head: list = []
    for it in items:
        if isinstance(it, Para):
            break
        head.append(it)
    tail: list = []
    for i in range(len(items) - 1, len(head) - 1, -1):
        if isinstance(items[i], Para):
            break
        tail.append(items[i])
    tail.reverse()
    return head, items[len(head) : len(items) - len(tail)], tail


def page_serial_items(
    page_index: int, raw_layouts: list[RawLayout]
) -> list[tuple[list, list, list]]:
    """The PAGE-LOCAL half of the jointer: W1 reading-order serials +
    J1 asset↔caption joining + E1/E3/E4 content normalization for ONE
    page, as (head, body, tail) triples per serial.  Pure function of the
    page — no cross-page state — so it can run anywhere: inside the
    per-doc task (default) or in a page-parallel pre-stage.

    Pre-stage decision (measured, 2,076-page book, plans/pipeline.py):
    this half costs ~0.10ms/page (split_reading_serials 0.15s +
    join_asset_layouts 0.06s of a 0.66s kernel) — shipping its output
    (Para trees with typed segs/marks) through an extra Arrow schema +
    (doc,page)-keyed exchange costs more than it saves, so the default
    plan keeps it in-task; the seam exists for corpora whose page-local
    work dominates (heavy tables/equations per page)."""
    dets = [lay.det for lay in raw_layouts]
    return [
        _split_head_body_tail(
            join_asset_layouts(page_index, [raw_layouts[i] for i in serial])
        )
        for serial in split_reading_serials(dets)
    ]


def joint_document_stream(pages: list[tuple[int, list[RawLayout]]]) -> list:
    """W2: the full jointer over one layout stream (body OR footnotes).

    ``pages``: (page_index, layouts) in page order.  Two phases: the
    page-local half (page_serial_items) then the SEQUENTIAL cross-page
    stitch below (W2/W3/W4 — order-dependent by construction,
    reference jointer.py:42-96).  Returns the ordered [Para | Asset] list.
    """
    return stitch_document_stream(
        (page_index, page_serial_items(page_index, raw_layouts))
        for page_index, raw_layouts in pages
    )


def stitch_document_stream(pages_items) -> list:
    """The sequential half: merge candidate paragraphs across serial/page
    boundaries (W2 mergeability, W3 checks, W4 hyphen rejoin) over
    pre-split (head, body, tail) serial triples."""
    out: list = []
    held_para: Para | None = None
    held_assets: list = []

    def finalize_held():
        nonlocal held_para, held_assets
        if held_para is not None:
            rejoin_hyphenated_words(held_para)
            out.append(held_para)
            out.extend(held_assets)
            held_para = None
            held_assets = []

    for _page_index, serial_triples in pages_items:
        for head, body, tail in serial_triples:
            if not body:
                if held_para is not None:
                    held_assets.extend(head)
                    held_assets.extend(tail)
                else:
                    out.extend(head)
                    out.extend(tail)
                continue

            first = body[0]
            if held_para is not None and _can_merge(held_para, first):
                held_para.blocks.extend(first.blocks)
                del body[0]

            if not body:
                if held_para is not None:
                    held_assets.extend(head)
                    held_assets.extend(tail)
                else:
                    out.extend(head)
                    out.extend(tail)
                continue

            finalize_held()
            out.extend(head)
            out.extend(body[:-1])
            held_para = body[-1]
            held_assets = list(tail)

    finalize_held()
    return out
