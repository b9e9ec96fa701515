"""F9 + the §2.12 boilerplate stage.

F9 — error-tolerant fallback rows.  Behavioral spec:
/root/reference/pdf_craft/pdf/ocr.py:230-263 — a failed page becomes a
single full-page image layout (when the rasterized image survived,
signalled here by a media_ref on the error span) or a
``[[Page N extraction failed...]]`` text layout.  Raw spans of kind
``page_error`` carry the failure through the interleaved table.

Boilerplate demotion — the reference's header/footer stripping happens
inside its OCR model (SURVEY.md §2.12); its in-repo defenses are F3/F5
plus the repeated-title downweighting in TOC scoring.  This engine adds
the explicit frequency-based stage: a short body line whose normalized
text recurs on many pages of the same document (page headers, running
titles, page numbers) is dropped before stitching.
"""

from __future__ import annotations

from collections import Counter

from pdf_craft_spark.operators.model import RawLayout, RawPage
from pdf_craft_spark.operators.toclib import normalize_match_text

# a line is boilerplate when it appears on >= max(3, 30% of pages) pages
_MIN_PAGES = 3
_PAGE_RATIO = 0.3
_MAX_BOILERPLATE_LEN = 80


def fallback_page(page_index: int, media_ref: str | None, width: int, height: int) -> RawPage:
    """F9: substitute a whole-page layout for a failed page."""
    if media_ref:
        layout = RawLayout(
            kind="image",
            text="",
            det=(0, 0, width, height),
            media_ref=media_ref,
            order=0,
        )
    else:
        layout = RawLayout(
            kind="text",
            text=f"[[Page {page_index} extraction failed due to PDF rendering error]]",
            det=(0, 0, 100, 100),
            media_ref=None,
            order=0,
        )
    return RawPage(index=page_index, width=width, height=height, body=[layout])


def strip_boilerplate(pages: list[RawPage]) -> list[RawPage]:
    """Drop repeated short body lines (headers/footers/page numbers).

    Counting is by normalized match text per page (a line twice on one
    page counts once); title/asset kinds are never demoted.  Orders are
    re-assigned after dropping, like every other filter stage."""
    n_pages = len(pages)
    threshold = max(_MIN_PAGES, int(n_pages * _PAGE_RATIO))
    page_counts: Counter[str] = Counter()
    for page in pages:
        seen = set()
        for lay in page.body:
            if lay.kind != "text" or len(lay.text) > _MAX_BOILERPLATE_LEN:
                continue
            key = normalize_match_text(lay.text)
            if key and key not in seen:
                seen.add(key)
                page_counts[key] += 1

    drop = {k for k, c in page_counts.items() if c >= threshold}
    if not drop:
        return pages

    out = []
    for page in pages:
        new_page = RawPage(
            index=page.index, width=page.width, height=page.height,
            footnotes=page.footnotes,
        )
        for lay in page.body:
            if (
                lay.kind == "text"
                and len(lay.text) <= _MAX_BOILERPLATE_LEN
                and normalize_match_text(lay.text) in drop
            ):
                continue
            new_page.body.append(
                RawLayout(
                    kind=lay.kind, text=lay.text, det=lay.det,
                    media_ref=lay.media_ref, order=len(new_page.body),
                )
            )
        out.append(new_page)
    return out
