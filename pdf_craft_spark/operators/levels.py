"""A4: chapter-internal heading levels.

Behavioral spec: /root/reference/pdf_craft/sequence/analyse_level.py:10-37.
The chapter's first layout (if a title paragraph) gets level 0; remaining
title paragraphs are CV-split by median block height into <=5 groups,
biggest font = level 1.
"""

from __future__ import annotations

from pdf_craft_spark.operators.cv_split import split_by_cv
from pdf_craft_spark.operators.model import Chapter, Para
from pdf_craft_spark.operators.toclib import MAX_TITLE_CV, TITLE_KINDS

_MAX_TITLE_GROUPS = 5  # markdown caps at 6 heading levels; 1 is the chapter title


def _median(values: list[float]) -> float:
    s = sorted(values)
    n = len(s)
    if n % 2 == 1:
        return s[n // 2]
    return (s[n // 2 - 1] + s[n // 2]) / 2


def analyse_chapter_internal_levels(chapter: Chapter) -> None:
    items: list[tuple[float, Para]] = []
    for i, layout in enumerate(chapter.items):
        if not isinstance(layout, Para) or layout.kind not in TITLE_KINDS:
            continue
        if i == 0:
            layout.level = 0
        elif layout.blocks:
            height = _median([float(b.det[3] - b.det[1]) for b in layout.blocks])
            items.append((height, layout))
    groups = split_by_cv(
        [h for h, _ in items],
        [p for _, p in items],
        max_cv=MAX_TITLE_CV,
        max_groups=_MAX_TITLE_GROUPS,
    )
    for level, paras in enumerate(reversed(groups), start=1):
        for para in paras:
            para.level = level
