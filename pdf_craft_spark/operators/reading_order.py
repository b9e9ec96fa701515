"""W1: reading-order reconstruction (column split) for one page.

Behavioral spec: /root/reference/pdf_craft/sequence/reading_serials.py:22-206.
Layouts are projected on the x axis (center, width, weight=height); a
skyline histogram is scanned with a 3-wide window for valleys (column
gaps); layouts left of each valley form a column group, each sub-split by
width-CV <= 0.1; finally layouts are re-emitted in original order, a new
"serial" starting whenever the column-group id changes.

The function returns a serial id per layout index (dense, in emission
order), which is exactly the grouping the Jointer consumes.
"""

from __future__ import annotations

import numpy as np

from pdf_craft_spark.operators.cv_split import split_by_cv

_CV_MAX = 0.1
_MIN_SIZE_RATE = 0.15

# window classes
_TOUCHED, _LEFT, _FLAT, _VALLEY, _OTHER = range(5)


def _classify(prev_h: float, curr_h: float, next_h: float) -> int:
    if prev_h > curr_h and curr_h == next_h:
        return _TOUCHED
    if prev_h == curr_h and curr_h < next_h:
        return _LEFT
    if prev_h == curr_h and curr_h == next_h:
        return _FLAT
    if prev_h > curr_h and curr_h < next_h:
        return _VALLEY
    return _OTHER


def _skyline(rects: list[tuple[float, float, float]]) -> list[tuple[float, float, float]]:
    """Left-to-right visible segments: each rect clipped at the previous
    emitted right edge and at the left edge of any taller rect after it."""
    rects = sorted(rects, key=lambda r: (r[0], r[1]))
    out = []
    forbidden = float("-inf")
    for i, (left, right, h) in enumerate(rects):
        lo = max(left, forbidden)
        hi = right
        for left2, _, h2 in rects[i + 1 :]:
            if h2 > h:
                hi = min(hi, left2)
        if lo < hi:
            out.append((lo, hi, h))
            forbidden = hi
    return out


def _find_valleys(rects: list[tuple[float, float, float]]) -> list[float]:
    valleys: list[float] = []
    window: list[tuple[float, float]] = []
    prev_class = _OTHER
    flat_buffer: list[float] = []

    for lo, hi, h in _skyline(rects):
        window.append(((lo + hi) / 2, h))
        if len(window) > 3:
            window.pop(0)
        if len(window) != 3:
            continue
        (_, ph), (cx, ch), (_, nh) = window
        clazz = _classify(ph, ch, nh)
        keep = False
        if clazz == _TOUCHED:
            flat_buffer = [cx]
            keep = True
        elif clazz == _LEFT:
            if prev_class in (_TOUCHED, _FLAT):
                flat_buffer.append(cx)
                valleys.append(sum(flat_buffer) / len(flat_buffer))
        elif clazz == _FLAT:
            if prev_class == _TOUCHED or (prev_class == _FLAT and flat_buffer):
                flat_buffer.append(cx)
                keep = True
        elif clazz == _VALLEY:
            valleys.append(cx)
        prev_class = clazz
        if not keep and flat_buffer:
            flat_buffer = []
    return valleys


def split_reading_serials(dets: np.ndarray) -> list[list[int]]:
    """dets: (n, 4) int array of (l, t, r, b) in emission order.

    Returns the serial groups as lists of original layout indices, in
    reading order.
    """
    n = len(dets)
    if n == 0:
        return []
    dets = np.asarray(dets, dtype=np.float64)
    centers = (dets[:, 0] + dets[:, 2]) / 2
    widths = dets[:, 2] - dets[:, 0]
    heights = dets[:, 3] - dets[:, 1]

    eff = np.maximum(widths, widths.mean() * _MIN_SIZE_RATE)
    rects = [
        (c - s / 2, c + s / 2, float(h)) for c, s, h in zip(centers, eff, heights)
    ]

    # column grouping: peel off everything left of each valley, in order
    group_of = np.full(n, -1, dtype=np.int64)
    remaining = list(range(n))
    group_id = 0
    pending: list[list[int]] = []
    for valley in _find_valleys(rects):
        taken = [i for i in remaining if centers[i] < valley]
        remaining = [i for i in remaining if centers[i] >= valley]
        if taken:
            pending.extend(
                split_by_cv([widths[i] for i in taken], taken, max_cv=_CV_MAX)
            )
    if remaining:
        pending.extend(
            split_by_cv([widths[i] for i in remaining], remaining, max_cv=_CV_MAX)
        )
    for group in pending:
        for i in group:
            group_of[i] = group_id
        group_id += 1

    # re-emit in original order; a serial is a maximal run of one group id
    serials: list[list[int]] = []
    last_gid = -1
    for i in range(n):
        gid = group_of[i]
        if gid != last_gid:
            serials.append([])
            last_gid = gid
        serials[-1].append(i)
    return serials
