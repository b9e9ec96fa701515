"""Deterministic synthetic interleaved-document corpus.

Generates books of classified OCR layout spans — the exact boundary where
pdf-craft's own dataflow starts (its OCR model lives in the external
doc-page-extractor; /root/reference/pdf_craft/pdf/page_extractor.py:82-157).
Every feature the extraction operators must handle is exercised: TOC pages,
multi-column pages (reading order), cross-page paragraph stitching with
hyphen splits, asset+caption adjacency, LaTeX equations, HTML tables,
footnote marks, CJK text, degenerate OCR repetition, out-of-bounds boxes.

Everything derives from ``random.Random(seed ^ doc_id)`` — same doc id,
same book, forever; no external data.

Serialization: the interleaved table of exactly the hinted shape
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``:
one ``kind='page'`` span per page (``text = "index,width,height"``), then
layout spans; geometry rides in ``media_ref`` ("l,t,r,b" for text layouts,
"<hash>;l,t,r,b" for assets), footnote-area layouts get an ``fn_`` kind
prefix.  ``parse_raw_spans`` reverses it.
"""

from __future__ import annotations

import hashlib
import random

from pdf_craft_spark.operators.model import RawLayout, RawPage

PAGE_W, PAGE_H = 600, 800

_WORDS = (
    "spark engine column scan merge window batch shuffle partition order "
    "query data value filter join table sort group page text layout book "
    "chapter section reading stream output vector hash index"
).split()
_ZH = "数据处理引擎按列扫描合并窗口分区排序查询过滤连接表格页面文本布局书章节流输出向量索引"
_MARK_GLYPHS = "①②③④⑤⑥⑦⑧⑨⑩"


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _zh_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(_ZH) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    return _words(rng, rng.randint(5, 12)) + rng.choice([".", ".", ".", "!", "?"])


_PII_DOMAINS = ("example", "corpus", "dataeng", "books")
_PII_TLDS = ("com", "org", "co.uk", "io")
_ZH_PUNCT = "，。！？；：「」"


def _pii_fragment(rng: random.Random) -> str:
    """Deterministic contact-info fragments in the shapes real corpora
    carry — plus-tagged locals, subdomains, query strings, fragments —
    so the PII scrub operator meets corpus-shaped data, not injections."""
    w = rng.choice(_WORDS)
    w2 = rng.choice(_WORDS)
    dom = rng.choice(_PII_DOMAINS)
    tld = rng.choice(_PII_TLDS)
    n = rng.randint(1, 999)
    kind = rng.random()
    if kind < 0.4:
        return f"contact {w}.{w2}+{n}@{dom}.{tld} today"
    if kind < 0.7:
        return f"visit https://{dom}.{tld}/{w}/{n}?ref={w2} soon"
    return f"mail {w}_{n}@mail.{dom}.org and http://{dom}.net/{w2}#{n}"


_HTML_PATHOLOGICAL = (
    'Results <table><tr><td>a &amp; b</td><td>keep <b>bold</b> x</td></tr>'
    '<tr><td colspan="2">c &#60;d&#62;</td></tr></table> end',
    "Data <table><tr><th>h1</th><th>h2</th></tr>"
    "<tr><td>1 &lt; 2 &amp; 3 &gt; 2</td><td><em>em</em> tail</td></tr></table> after",
    "T <table><tbody><tr><td>only cell</td></tr></tbody></table> <em>after</em> note",
)


def _media_hash(rng: random.Random) -> str:
    return hashlib.sha256(str(rng.random()).encode()).hexdigest()


class _BookBuilder:
    def __init__(self, rng: random.Random, n_pages: int, flavor: str | None = None):
        self.rng = rng
        self.n_pages = n_pages
        self.flavor = flavor  # None | "cjk" | "html" | "pii" (adversarial)
        self.pages: list[RawPage] = []
        self.titles: list[str] = []

    def _layout(self, page: RawPage, kind: str, text: str, det, media_ref=None, footnote=False):
        area = page.footnotes if footnote else page.body
        area.append(
            RawLayout(kind=kind, text=text, det=tuple(det), media_ref=media_ref, order=len(area))
        )

    def build(self) -> list[RawPage]:
        rng = self.rng
        n_chapters = max(2, self.n_pages // 3)
        if self.flavor == "cjk":
            self.titles = [
                f"第{i + 1}章 {_zh_text(rng, 4)}" for i in range(n_chapters)
            ]
        else:
            self.titles = [
                f"Chapter {i + 1} {_words(rng, 3)}" for i in range(n_chapters)
            ]
        # some books carry a running header on every content page (the
        # boilerplate-demotion stage's target) and some have a failed page
        # (F9 fallback)
        running_header = (
            f"Running head {_words(rng, 2)}" if rng.random() < 0.25 else None
        )
        error_page = (
            rng.randint(2, self.n_pages) if rng.random() < 0.05 and self.n_pages >= 2 else None
        )
        error_has_image = rng.random() < 0.5

        # page 1: the TOC page (body text lines quoting every chapter title)
        toc = RawPage(index=1, width=PAGE_W, height=PAGE_H)
        y = 60
        self._layout(toc, "title", "Contents", (200, 20, 400, 52))
        for i, t in enumerate(self.titles):
            self._layout(toc, "text", f"{t} {'.' * 8} {i + 2}", (50, y, 550, y + 14))
            y += 22
        self.pages.append(toc)

        # content pages
        chapter_of_page = [
            min(len(self.titles) - 1, (p - 2) * len(self.titles) // max(1, self.n_pages - 1))
            for p in range(2, self.n_pages + 1)
        ]
        pending_title = dict(
            (chapter_of_page.index(ci) + 2, ci) for ci in range(len(self.titles))
        )

        carry_words: str | None = None  # forces cross-page stitch w/ hyphen
        for p in range(2, self.n_pages + 1):
            if p == error_page:
                page = RawPage(index=p, width=PAGE_W, height=PAGE_H)
                page.error = _media_hash(rng) if error_has_image else ""
                self.pages.append(page)
                continue
            page = RawPage(index=p, width=PAGE_W, height=PAGE_H)
            two_col = rng.random() < 0.25
            ci = pending_title.get(p)
            y = 40
            if running_header is not None:
                self._layout(page, "text", running_header, (180, 8, 420, 20))
            if ci is not None:
                # '#'-prefixed, as DeepSeek OCR emits (F4 must strip)
                self._layout(page, "title", f"## {self.titles[ci]}", (100, y, 500, y + 40))
                y += 56
                if rng.random() < 0.5:
                    self._layout(
                        page, "sub_title", f"Overview {_words(rng, 2)}", (100, y, 440, y + 24)
                    )
                    y += 36

            cols = (
                [(50, 280), (320, 550)] if two_col else [(50, 550)]
            )
            for left, right in cols:
                yy = y
                n_paras = rng.randint(1, 3)
                for _ in range(n_paras):
                    if yy > PAGE_H - 120:
                        break
                    kind_roll = rng.random()
                    if kind_roll < 0.12:
                        h = _media_hash(rng)
                        self._layout(page, "image", "", (left, yy, right, yy + 90), media_ref=h)
                        yy += 96
                        if rng.random() < 0.7:
                            self._layout(
                                page,
                                "image_caption",
                                f"Figure: {_words(rng, 4)}",
                                (left, yy, right, yy + 12),
                            )
                            yy += 20
                    elif kind_roll < 0.20:
                        body = rng.choice(
                            [
                                f"Energy relation $$E = m c^2 + {rng.randint(1, 9)}$$ as shown",
                                f"$$\\sum_i x_i = {rng.randint(2, 99)}$$",
                                f"inline $a_{rng.randint(1, 9)} + b$ form",
                            ]
                        )
                        self._layout(page, "equation", body, (left, yy, right, yy + 40))
                        yy += 46
                        if rng.random() < 0.5:
                            self._layout(
                                page,
                                "equation_caption",
                                f"Equation of {_words(rng, 3)}",
                                (left, yy, right, yy + 12),
                            )
                            yy += 20
                    elif kind_roll < 0.26:
                        if self.flavor == "html":
                            body = rng.choice(_HTML_PATHOLOGICAL)
                        else:
                            rows = "".join(
                                f"<tr><td>{_words(rng, 1)}</td><td>{rng.randint(0, 99)}</td></tr>"
                                for _ in range(3)
                            )
                            body = f"Results before <table>{rows}</table> after note"
                        self._layout(
                            page,
                            "table",
                            body,
                            (left, yy, right, yy + 80),
                        )
                        yy += 86
                    else:
                        sents = [_sentence(rng) for _ in range(rng.randint(1, 3))]
                        text = " ".join(sents)
                        if carry_words is not None:
                            text = carry_words + " " + text
                            carry_words = None
                        if self.flavor == "cjk":
                            # dense CJK with full-width punctuation around a
                            # short latin run — F6/F7/E11's hardest mix
                            text = (
                                _zh_text(rng, rng.randint(20, 50))
                                + rng.choice(_ZH_PUNCT)
                                + text[: rng.randint(5, 20)].strip()
                                + "「"
                                + _zh_text(rng, rng.randint(4, 10))
                                + "」。"
                            )
                        # sometimes inject a footnote mark + CJK clause
                        if rng.random() < 0.3 and page.index % 2 == 0:
                            gi = rng.randint(0, 3)
                            text += f" see{_MARK_GLYPHS[gi]} note"
                            self._ensure_footnote(page, gi)
                        if rng.random() < 0.25:
                            text += " " + _zh_text(rng, rng.randint(6, 14)) + ","
                        # corpus-shaped contact info: always in the pii
                        # flavor, occasionally everywhere (the scrub
                        # operator's natural diet)
                        if self.flavor == "pii" or rng.random() < 0.08:
                            text += " " + _pii_fragment(rng)
                        self._layout(page, "text", text, (left, yy, right, yy + 36))
                        yy += 44
                # occasionally end the column mid-word (hyphen split)
                if rng.random() < 0.3 and page.body and page.body[-1].kind == "text":
                    word = rng.choice(_WORDS)
                    cut = rng.randint(2, len(word) - 2)
                    page.body[-1].text += f" {word[:cut]}-"
                    carry_words = word[cut:] + " " + _sentence(rng)

            # degenerate OCR garbage (F3 must drop) + out-of-bounds box (F2)
            if rng.random() < 0.15:
                self._layout(page, "text", "ab" * 40, (50, 700, 550, 712))
            if rng.random() < 0.15:
                self._layout(page, "text", _sentence(rng), (580, 700, 700, 712))

            self.pages.append(page)
        return self.pages

    def _ensure_footnote(self, page: RawPage, glyph_index: int):
        glyph = _MARK_GLYPHS[glyph_index]
        marked = any(
            lay.text.startswith(glyph) for lay in page.footnotes if lay.kind == "text"
        )
        if not marked:
            self._layout(
                page,
                "text",
                f"{glyph} {_sentence(self.rng)}",
                (50, 740 + 8 * glyph_index % 40, 550, 752 + 8 * glyph_index % 40),
                footnote=True,
            )


def _draw_n_pages(rng: random.Random, heavy_tail: bool) -> int:
    """Heavy-tailed page counts per FIXTURES.md §3 / the north rule's skew
    requirement: ~1% of docs are 500-5000-page books — the single-doc
    tail that pins one kernel task (W2 stitching is sequential per doc),
    which salting cannot split and the bench must therefore expose."""
    r = rng.random()
    if heavy_tail and r < 0.01:
        return rng.randint(500, 5000)  # the extreme long-book tail
    if heavy_tail and r < 0.05:
        return rng.randint(40, 120)
    return rng.randint(4, 14)


# Reserved ADVERSARIAL documents (fixed ids, deterministic like all the
# rest): a 520-page book, a CJK-dense book, pathological-HTML tables, and
# PII-dense prose.  They sit inside the golden corpus (ids 24-27 < the
# parity suites' ranges) so the driver's golden-oracle rows and the
# reference byte-parity tests both run over the hard cases, not just the
# average ones.
_ADVERSARIAL = {24: ("long", 520), 25: ("cjk", 10), 26: ("html", 10), 27: ("pii", 10)}


def page_count(doc_id: int, seed: int = 42, heavy_tail: bool = True) -> int:
    """Exact page count of generate_document(doc_id, seed) without building
    the book — mirrors the same leading rng draws (cheap corpus stats)."""
    if doc_id in _ADVERSARIAL:
        return _ADVERSARIAL[doc_id][1]
    return _draw_n_pages(random.Random((seed << 32) ^ doc_id), heavy_tail)


def generate_document(doc_id: int, seed: int = 42, heavy_tail: bool = True) -> list[RawPage]:
    rng = random.Random((seed << 32) ^ doc_id)
    if doc_id in _ADVERSARIAL:
        flavor, n_pages = _ADVERSARIAL[doc_id]
        return _BookBuilder(rng, n_pages, flavor=None if flavor == "long" else flavor).build()
    n_pages = _draw_n_pages(rng, heavy_tail)
    return _BookBuilder(rng, n_pages).build()


# --- serialization to/from the hinted interleaved schema ---------------------

def page_tokens(page: RawPage) -> tuple[int, int]:
    """Deterministic per-page OCR token meters (A8): input ≈ the page
    image's token cost (area/256, how vision models bill pixels), output ≈
    recognized text volume (chars/4 + a fixed per-layout overhead) —
    derived from content, so no extra rng draws and no generator churn.
    Mirrors the reference's per-page input_tokens/output_tokens fields
    (pdf/types.py:19-20, filled from OCR events, ocr.py:205-216)."""
    n_in = (page.width * page.height) // 256
    layouts = list(page.body) + list(page.footnotes)
    n_out = sum(len(lay.text) for lay in layouts) // 4 + 16 * len(layouts)
    return n_in, n_out


def page_confidence(page: RawPage) -> int:
    """Deterministic per-page OCR confidence in milli-units (600-999).

    Real OCR models emit a recognition confidence per page/region; the
    synthetic corpus derives one from content (like the token meters — no
    extra rng draws, no generator churn).  Stored as an integer so the
    histogram query stays in exact integer arithmetic end-to-end
    (bucket = conf_milli // 100 == floor(confidence * 10))."""
    _, n_out = page_tokens(page)
    return 600 + (n_out * 7919 + page.index * 131) % 400


def pages_to_spans(pages: list[RawPage]) -> list[tuple[str, str | None, str | None, int]]:
    """→ [(kind, text, media_ref, offset)] rows of the raw spans array.

    Page-marker spans carry ``index,width,height,in_tok,out_tok,conf_milli``
    — the per-page token meters (A8) and OCR confidence (A9 histograms)
    ride the contract schema's text field; failed pages (page_error) emit
    no tokens and no confidence, like the reference's SKIP events."""
    rows: list[tuple[str, str | None, str | None, int]] = []
    off = 0
    for page in pages:
        if page.error is not None:
            # F9: a failed page travels as one page_error span; media_ref
            # holds the full-page image hash when rasterization survived
            rows.append(
                (
                    "page_error",
                    f"{page.index},{page.width},{page.height}",
                    page.error or None,
                    off,
                )
            )
            off += 1
            continue
        n_in, n_out = page_tokens(page)
        conf = page_confidence(page)
        rows.append(
            (
                "page",
                f"{page.index},{page.width},{page.height},{n_in},{n_out},{conf}",
                None,
                off,
            )
        )
        off += 1
        for footnote, area in ((False, page.body), (True, page.footnotes)):
            for lay in area:
                det = ",".join(str(v) for v in lay.det)
                mref = f"{lay.media_ref};{det}" if lay.media_ref else det
                kind = f"fn_{lay.kind}" if footnote else lay.kind
                rows.append((kind, lay.text, mref, off))
                off += 1
    return rows


def parse_raw_spans(rows: list[tuple[str, str | None, str | None, int]]) -> list[RawPage]:
    """Inverse of pages_to_spans (tolerates rows out of offset order)."""
    from pdf_craft_spark.operators.boilerplate import fallback_page

    rows = sorted(rows, key=lambda r: r[3])
    pages: list[RawPage] = []
    for kind, text, mref, _off in rows:
        if kind == "page":
            # 3-field (legacy), 5-field (token meters) or 6-field (+ conf);
            # the kernel only needs geometry — A8 metering and A9 confidence
            # read the trailing fields JVM-side
            idx, w, h = (int(v) for v in (text or "1,600,800").split(",")[:3])
            pages.append(RawPage(index=idx, width=w, height=h))
            continue
        if kind == "page_error":
            idx, w, h = (int(v) for v in (text or "1,600,800").split(",")[:3])
            pages.append(fallback_page(idx, mref, w, h))
            continue
        if not pages:  # layout before any page marker: implicit page 1
            pages.append(RawPage(index=1, width=PAGE_W, height=PAGE_H))
        footnote = kind.startswith("fn_")
        lay_kind = kind[3:] if footnote else kind
        media_ref = None
        det_str = mref or "0,0,0,0"
        if ";" in det_str:
            media_ref, det_str = det_str.split(";", 1)
        det = tuple(int(v) for v in det_str.split(","))
        area = pages[-1].footnotes if footnote else pages[-1].body
        area.append(
            RawLayout(kind=lay_kind, text=text or "", det=det, media_ref=media_ref, order=len(area))
        )
    return pages
