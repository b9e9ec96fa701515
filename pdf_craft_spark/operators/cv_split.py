"""A2: 1-D clustering by coefficient of variation.

Behavioral spec: /root/reference/pdf_craft/common/cv_splitter.py:47-113.
Semantics: starting from one group holding all (size, payload) items,
repeatedly pick the group with the largest CV above ``max_cv`` (groups of
<=2 items never split), split it at the largest adjacent gap of its
size-sorted items, until no group exceeds max_cv or ``max_groups`` reached.
Returns payload groups ordered by ascending mean size.

Arithmetic is sequential-Python-float on purpose: CV values sit directly
against the max_cv threshold, so pairwise (numpy) summation would flip
borderline splits vs the spec.  Groups are index slices over one stable
sort — O(n log n) once, O(group) per split step.
"""

from __future__ import annotations

import sys


def _cv(values: list[float]) -> float:
    n = len(values)
    if n < 2:
        return 0.0
    mean = sum(values) / n
    if mean == 0:
        return float("inf")
    variance = sum((x - mean) ** 2 for x in values) / n
    return (variance**0.5) / mean


def split_by_cv(
    sizes: list[float],
    payloads: list | None = None,
    max_cv: float = 0.0,
    max_groups: int = sys.maxsize,
) -> list[list]:
    """Returns groups of payloads (or of the original indices when
    ``payloads`` is None), ordered by ascending group mean size."""
    sizes = [float(s) for s in sizes]
    n = len(sizes)
    if payloads is None:
        payloads = list(range(n))
    if n <= 2:
        return [list(payloads)]

    # a group's items stay in the order they had in their parent at split
    # time; only the group being split gets (stably) size-sorted — an
    # unsplit input therefore comes back in ORIGINAL order, as specified
    groups: list[list[tuple[float, object]]] = [list(zip(sizes, payloads))]

    while len(groups) < max_groups:
        best_i = -1
        best_cv = max_cv
        for i, group in enumerate(groups):
            if len(group) <= 2:
                continue
            cv = _cv([s for s, _ in group])
            if cv > best_cv:
                best_cv = cv
                best_i = i
        if best_i == -1:
            break
        items = sorted(groups[best_i], key=lambda t: t[0])  # stable
        best_gap = -float("inf")
        cut = -1
        for i in range(len(items) - 1):
            gap = items[i + 1][0] - items[i][0]
            if gap > best_gap:
                best_gap = gap
                cut = i + 1
        if cut == -1:
            break
        groups[best_i : best_i + 1] = [items[:cut], items[cut:]]

    def mean(group: list[tuple[float, object]]) -> float:
        return sum(s for s, _ in group) / len(group) if group else 0.0

    keyed = sorted(((mean(g), i) for i, g in enumerate(groups)), key=lambda t: t[0])
    return [[p for _, p in groups[i]] for _, i in keyed]
