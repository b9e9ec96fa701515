"""F6 + J4/J5 + A3/A5/A6/A7 + W8: TOC discovery, levels, tree structuring.

Behavioral spec: /root/reference/pdf_craft/toc/text.py:364-427 (match-text
normalization), toc/toc_pages.py:39-211 (TOC-page scoring + human-like
filter), toc/toc_levels.py:16-200 (level inference via CV splitting),
toc/analysing.py:117-147 (level-stack tree fold).

The reference streams bodies through an Aho-Corasick automaton; so does
this implementation (``TitleMatcher``): one automaton per document over
the normalized title inventory, each page body scanned once — O(body +
matches) per page instead of O(body × titles), which is what keeps a
500+-page book with hundreds of chapter titles linear.  Tiny inventories
fall back to C-speed ``str.find`` loops.  Inside the per-doc Arrow kernel
this is a co-partitioned local containment join, never a shuffle.
"""

from __future__ import annotations

import re
import unicodedata
from collections import deque
from dataclasses import dataclass, field

from pdf_craft_spark.operators.cv_split import split_by_cv
from pdf_craft_spark.operators.model import RawPage
from pdf_craft_spark.operators.textutil import _LATIN_SET, is_latin_letter

# analysing.py:22 — the TOC path strips looser '#' prefixes than F4
_TITLE_HEAD_RE = re.compile(r"^\s*#{1,6}\s*")

MAX_LEVELS = 4  # config.py:1-2
MAX_TITLE_CV = 0.025
_MAX_TOC_CV = 0.75
_MAX_TOC_RATIO = 0.1
_TOC_HEAD_RATIO = 0.18
_TOC_SCORE_MIN_RATIO = 3.0
_MIN_TOC_LIMIT = 3
_MIN_LATIN_TITLE_LEN = 6
_MIN_NON_LATIN_TITLE_LEN = 3

TITLE_KINDS = ("title", "sub_title")

_LINK_GLYPHS = ("‐", "‑", "‒", "–", "—", "―")

# the reference's explicit multilingual punctuation inventory
# (toc/text.py:22-361) — reproduced as data for match parity; its
# never-matching ', ' two-char entry is dropped.
_PUNCT = frozenset(
    "!\"#%&'()*,-./:;?@[\\]^_`{|}~¡§«¶·»¿֊־׀׃׆׳״؉؊،؍؎؏؛؞؟٪٫٬٭"
    "།༎༏༐༑༒༔༴༶༸྅࿐࿑࿒࿓࿔࿙࿚၊။၌၍၎၏჻፠፡።፣፤፥፦፧፨᙮។៕៖៘៙៚"
    "᠀᠁᠂᠃᠄᠅᠆᠇᠈᠉᠊‐‑‒–—―‖‗‚‛„‟†‡•‣․‥…‧‱′″‴‵‶‷‸‹›※‼‽‾‿"
    "⁀⁁⁂⁃⁄⁅⁆⁇⁈⁉⁊⁋⁌⁍⁎⁏⁐⁑⁒⁓⁔⁕⁖⁗⁘⁙⁚⁛⁜⁝⁞"
    "⸀⸁⸂⸃⸄⸅⸆⸇⸈⸉⸊⸋⸌⸍⸎⸏⸐⸑⸒⸓⸔⸕⸖⸗⸘⸙⸚⸛⸜⸝⸞⸟⸠⸡⸢⸣⸤⸥⸦⸧⸨⸩⸪⸫⸬⸭⸮ⸯ⸰⸱⸲⸳⸴⸵⸶⸷⸸⸹⸺⸻⸼⸽⸾⸿"
    "⹀⹁⹂⹃⹄⹅⹆⹇⹈⹉⹊⹋⹌⹍⹎⹏、。〈〉《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〽・"
    "！＂＃％＆＇（）＊，．／：；？＠［＼］＾＿｀｛｜｝～｡｢｣､･"
)


# memoized per-char final transform: punctuation → '', latin → lowercase
# NFD with combining marks stripped, else identity.  Materialized as a
# lazily-filled str.translate table (codepoint → replacement string) so the
# hot path is one C-level translate() call per text.
def _xform(ch: str) -> str:
    if ch in _PUNCT:
        return ""
    if not is_latin_letter(ch):
        return ch
    return "".join(
        d
        for d in unicodedata.normalize("NFD", ch.lower())
        if unicodedata.category(d) != "Mn"
    )


class _XformTable(dict):
    def __missing__(self, cp: int) -> str:
        out = _xform(chr(cp))
        self[cp] = out
        return out


_XFORM_TABLE = _XformTable()


def normalize_match_text(text: str) -> str:
    """F6: whitespace collapse → hyphen-split rejoin → keep spaces only
    between latin letters → strip punctuation → lowercase + de-accent.

    The space rules run per boundary (text.split(' ')) instead of per
    char — same sequential semantics as the reference's char scan (the
    'previous char' is the already-transformed tail), ~10x less Python on
    long page bodies."""
    text = re.sub(r"\s+", " ", text).strip()

    if " " not in text:
        return text.translate(_XFORM_TABLE)

    # Branch order note: a char cannot be both a link glyph and a latin
    # letter, so the keep-space test (tail[-1] latin) and the hyphen test
    # (tail[1] link) are mutually exclusive on 2-char tails — testing the
    # overwhelmingly-common keep-space case first and inlining the set
    # memberships (no is_latin_letter call per boundary) changes nothing
    # semantically (fuzz-pinned vs the reference in test_kernel_parity)
    # and cuts the per-boundary cost ~2x on latin prose.
    lat = _LATIN_SET
    parts = text.split(" ")
    acc: list[str] = [parts[0]]
    tail = parts[0][-2:]  # last 2 chars of the transformed accumulation
    for nxt in parts[1:]:
        if nxt and nxt[0] in lat and tail:
            if tail[-1] in lat:
                acc.append(" ")
                tail = (" " + nxt)[-2:]
            elif len(tail) == 2 and tail[1] in _LINK_GLYPHS and tail[0] in lat:
                # drop the hyphen and the space: rejoin the split word
                acc[-1] = acc[-1][:-1]
                if not acc[-1]:
                    acc.pop()
                tail = (tail[:-1] + nxt)[-2:]
            else:
                tail = (tail + nxt)[-2:]
        else:
            tail = (tail + nxt)[-2:]
        acc.append(nxt)
    return "".join(acc).translate(_XFORM_TABLE)


def _valid_title(title: str) -> bool:
    t = title.strip()
    if any(is_latin_letter(c) for c in t):
        return len(t) >= _MIN_LATIN_TITLE_LEN
    return len(t) >= _MIN_NON_LATIN_TITLE_LEN


def count_overlapping(haystack: str, needle: str) -> int:
    """All (overlapping) occurrences — what an Aho-Corasick iter reports."""
    if not needle:
        return 0
    count = 0
    start = 0
    while True:
        pos = haystack.find(needle, start)
        if pos == -1:
            return count
        count += 1
        start = pos + 1


class TitleMatcher:
    """Multi-pattern overlapping-occurrence counter — the reference streams
    page bodies through one ahocorasick.Automaton built over the whole
    title inventory (/root/reference/pdf_craft/toc/toc_pages.py:176-211).

    Two strategies behind one interface, picked by inventory size:

    - few patterns (< _AC_MIN_PATTERNS): per-pattern ``str.find`` loops —
      C-speed constants beat a Python-level automaton scan when T is small
      (measured crossover ~150-200 patterns on 100KB bodies: find-loop
      grows linearly in T, AC stays flat at ~9ms);
    - otherwise: a real Aho-Corasick automaton (trie + BFS failure links +
      output links), so a page body of length L is scanned ONCE in
      O(L + matches) regardless of how many hundreds of titles a long book
      carries — previously O(L × T) per page, the kernel's scale-killer on
      500+-page books (a 5000-page book carries ~1600 titles: 6.4x).
    """

    _AC_MIN_PATTERNS = 160

    def __init__(self, patterns: list[str]):
        self.patterns = patterns
        self._use_ac = len(patterns) >= self._AC_MIN_PATTERNS
        if not self._use_ac:
            return
        # trie construction
        nxt: list[dict[str, int]] = [{}]
        out: list[int] = [-1]  # pattern id terminating at this node, else -1
        for pid, pat in enumerate(patterns):
            node = 0
            for ch in pat:
                child = nxt[node].get(ch)
                if child is None:
                    child = len(nxt)
                    nxt[node][ch] = child
                    nxt.append({})
                    out.append(-1)
                node = child
            out[node] = pid
        # BFS failure links + output links (nearest suffix that is a match)
        fail = [0] * len(nxt)
        olink = [-1] * len(nxt)
        queue = deque(nxt[0].values())
        while queue:
            node = queue.popleft()
            f = fail[node]
            olink[node] = f if out[f] >= 0 else olink[f]
            for ch, child in nxt[node].items():
                queue.append(child)
                g = fail[node]
                while g and ch not in nxt[g]:
                    g = fail[g]
                nxt_g = nxt[g].get(ch, 0)
                fail[child] = nxt_g if nxt_g != child else 0
        self._next, self._fail, self._out, self._olink = nxt, fail, out, olink

    def counts(self, body: str) -> dict[int, int]:
        """pattern id → number of (overlapping) occurrences in ``body``."""
        if not self._use_ac:
            return {
                pid: c
                for pid, pat in enumerate(self.patterns)
                if (c := count_overlapping(body, pat))
            }
        nxt, fail, out, olink = self._next, self._fail, self._out, self._olink
        counts: dict[int, int] = {}
        node = 0
        for ch in body:
            while node and ch not in nxt[node]:
                node = fail[node]
            node = nxt[node].get(ch, 0)
            t = node if out[node] >= 0 else olink[node]
            while t >= 0 and t != 0:
                pid = out[t]
                counts[pid] = counts.get(pid, 0) + 1
                t = olink[t]
        return counts

    def counts_by_page(self, bodies: list[str]) -> list[dict[int, int]]:
        """Per-page counts with per-DOCUMENT scans on the find-loop path:
        bodies join on a '\\x00' separator so T C-level scans run per
        document instead of per page (match→page via bisect over start
        offsets) — measured ~8% of kernel time was exactly that per-page
        Python call overhead.  Page attribution by offset is content-safe
        (a NUL inside a body shifts nothing); the one case the separator
        cannot isolate — a PATTERN that itself contains '\\x00', which
        could match across a page seam — falls back to per-page counts.
        The automaton path iterates bodies directly (resetting the node
        between pages), so it needs no separator at all.  Counts are
        identical to mapping ``counts`` over bodies (pinned in
        test_title_matcher, including NUL-bearing bodies/patterns)."""
        out: list[dict[int, int]] = [{} for _ in bodies]
        if not bodies:
            return out
        if not self._use_ac:
            if any("\x00" in p for p in self.patterns):
                return [self.counts(b) for b in bodies]
            from bisect import bisect_right

            starts = []
            off = 0
            for b in bodies:
                starts.append(off)
                off += len(b) + 1
            joined = "\x00".join(bodies)
            for pid, pat in enumerate(self.patterns):
                if not pat:
                    continue
                start = 0
                while True:
                    pos = joined.find(pat, start)
                    if pos == -1:
                        break
                    d = out[bisect_right(starts, pos) - 1]
                    d[pid] = d.get(pid, 0) + 1
                    start = pos + 1
            return out
        nxt, fail, outv, olink = self._next, self._fail, self._out, self._olink
        for cur, body in zip(out, bodies):
            node = 0
            for ch in body:
                while node and ch not in nxt[node]:
                    node = fail[node]
                node = nxt[node].get(ch, 0)
                t = node if outv[node] >= 0 else olink[node]
                while t >= 0 and t != 0:
                    pid = outv[t]
                    cur[pid] = cur.get(pid, 0) + 1
                    t = olink[t]
        return out


@dataclass
class MatchedTitle:
    text: str
    score: float
    references: list[tuple[int, int]]  # (page_index, order)


@dataclass
class PageRef:
    page_index: int
    score: float
    matched_titles: list[MatchedTitle] = field(default_factory=list)


def find_toc_pages(pages: list[RawPage]) -> list[PageRef]:
    """A5/A6 + J4: score pages by how much their body text matches the
    document's title inventory; cut at the largest score gap; keep the
    leading consecutive run in the head of the book."""
    # register normalized valid titles → [(page_index, order), ...]
    title_refs: dict[str, list[tuple[int, int]]] = {}
    for page in pages:
        for lay in page.body:
            if lay.kind not in TITLE_KINDS:
                continue
            t = normalize_match_text(_TITLE_HEAD_RE.sub("", lay.text))
            if _valid_title(t):
                title_refs.setdefault(t, []).append((page.index, lay.order))
    if not title_refs:
        return []

    titles = list(title_refs)
    matcher = TitleMatcher(titles)
    bodies = [
        normalize_match_text("".join(lay.text for lay in page.body)) for page in pages
    ]
    counts_list = matcher.counts_by_page(bodies)
    page_refs: list[PageRef] = []
    for page, counts in zip(pages, counts_list):
        matched: list[MatchedTitle] = []
        for pid in sorted(counts):  # pid order == title_refs insertion order
            title = titles[pid]
            cnt = counts[pid]
            refs = [(pi, o) for pi, o in title_refs[title] if pi != page.index]
            if refs:
                matched.append(
                    MatchedTitle(text=title, score=cnt / len(refs), references=refs)
                )
        page_refs.append(
            PageRef(
                page_index=page.index,
                score=sum(m.score for m in matched),
                matched_titles=matched,
            )
        )

    by_score = sorted(page_refs, key=lambda r: r.score, reverse=True)
    max_diff = 0.0
    cut = 0
    for i in range(len(by_score) - 1):
        diff = by_score[i].score - by_score[i + 1].score
        if diff > max_diff:
            max_diff = diff
            cut = i + 1
    candidates = sorted(by_score[:cut], key=lambda r: r.page_index)
    max_content_score = by_score[cut].score if cut < len(by_score) else 0.0

    # human-like filter (toc_pages.py:131-170)
    total = len(page_refs)
    max_pages = max(_MIN_TOC_LIMIT, int(total * _MAX_TOC_RATIO))
    head_limit = round(total * _TOC_HEAD_RATIO)
    candidates = [r for r in candidates if r.page_index <= head_limit]
    if len(candidates) > max_pages:
        candidates = candidates[:max_pages]
    if not candidates:
        return []

    serial = [candidates[0]]
    last = serial[0].page_index
    for r in candidates[1:]:
        if r.page_index == last + 1:
            serial.append(r)
            last = r.page_index
        else:
            break

    serial_set = {r.page_index for r in serial}
    for r in candidates:
        if r.page_index not in serial_set:
            max_content_score = max(max_content_score, r.score)
    if serial[0].score < _TOC_SCORE_MIN_RATIO * max_content_score:
        return []
    return serial


@dataclass
class _TitleMeta:
    toc_page_index: int
    relative_level: int
    collected: list[int] = field(default_factory=list)


def _content_title_levels(
    pages: list[RawPage],
    disable_pages: set[int] | None = None,
    restrict: dict | None = None,
) -> dict[tuple[int, int], int]:
    """A3: heights of (selected) title layouts CV-split into <=4 groups;
    biggest font = level 0."""
    items: list[tuple[float, tuple[int, int]]] = []
    for page in pages:
        if disable_pages and page.index in disable_pages:
            continue
        for lay in page.body:
            if lay.kind not in TITLE_KINDS:
                continue
            key = (page.index, lay.order)
            if restrict is not None and key not in restrict:
                continue
            items.append((float(lay.det[3] - lay.det[1]), key))
    out: dict[tuple[int, int], int] = {}
    groups = split_by_cv(
        [h for h, _ in items],
        [k for _, k in items],
        max_cv=MAX_TITLE_CV,
        max_groups=MAX_LEVELS,
    )
    for level, keys in enumerate(reversed(groups)):
        for k in keys:
            out[k] = level
    return out


def analyse_title_levels(pages: list[RawPage]) -> dict[tuple[int, int], int]:
    return _content_title_levels(pages)


def analyse_toc_levels(
    pages: list[RawPage], toc_pages: list[PageRef]
) -> dict[tuple[int, int], int]:
    """A3 + A7 + J5: transfer relative levels from TOC-page hook layouts to
    the referenced titles, reconciling per-page offsets by CV grouping."""
    page_by_index = {p.index: p for p in pages}
    ref2meta: dict[tuple[int, int], _TitleMeta] = {}
    toc_page_indexes: set[int] = set()

    for ref in toc_pages:
        toc_page_indexes.add(ref.page_index)
        page = page_by_index[ref.page_index]
        hook_items: list[tuple[float, tuple[int, list[tuple[int, int]]]]] = []
        for lay in page.body:
            lay_text = normalize_match_text(lay.text)
            refs_set: set[tuple[int, int]] = set()
            for title in ref.matched_titles:
                if title.text in lay_text:
                    refs_set.update(title.references)
            if not refs_set:
                continue
            height = float(lay.det[3] - lay.det[1])
            hook_items.append((height, (lay.order, list(refs_set))))
        groups = split_by_cv(
            [h for h, _ in hook_items],
            [p for _, p in hook_items],
            max_groups=MAX_LEVELS,
            max_cv=_MAX_TOC_CV,
        )
        groups.reverse()  # biggest font = level 0
        for level, hooks in enumerate(groups):
            for _, refs in sorted(hooks, key=lambda h: h[0]):
                for key in refs:
                    if key not in ref2meta:
                        ref2meta[key] = _TitleMeta(
                            toc_page_index=ref.page_index, relative_level=level
                        )

    global_levels = _content_title_levels(
        pages, disable_pages=toc_page_indexes, restrict=ref2meta
    )

    # per-toc-page offset (A7)
    for key in sorted(global_levels):
        ref2meta[key].collected.append(global_levels[key])
    page2metas: dict[int, list[_TitleMeta]] = {}
    for meta in ref2meta.values():
        page2metas.setdefault(meta.toc_page_index, []).append(meta)
    avg_items: list[tuple[float, int]] = []
    for page_index, metas in page2metas.items():
        metas.sort(key=lambda m: m.relative_level)
        levels = metas[0].collected
        if levels:
            avg_items.append((sum(levels) / len(levels), page_index))
    offsets: dict[int, int] = {}
    for offset, page_indexes in enumerate(
        split_by_cv(
            [a for a, _ in avg_items],
            [p for _, p in avg_items],
            max_groups=MAX_LEVELS,
            max_cv=_MAX_TOC_CV,
        )
    ):
        for pi in page_indexes:
            offsets[pi] = offset

    out: dict[tuple[int, int], int] = {}
    for key, meta in ref2meta.items():
        off = offsets.get(meta.toc_page_index)
        if off is not None:
            out[key] = meta.relative_level + off
    return out


@dataclass
class TocItem:
    id: int
    page_index: int
    order: int
    level: int
    parent_id: int | None


def structure_toc(ref2level: dict[tuple[int, int], int]) -> list[TocItem]:
    """W8: fold sorted (page, order) → level pairs with a level stack into
    a forest, emitted as parent-pointer rows."""
    items: list[TocItem] = []
    stack: list[TocItem] = []
    next_id = 1
    for (page_index, order), level in sorted(ref2level.items(), key=lambda x: x[0]):
        while stack and stack[-1].level >= level:
            stack.pop()
        item = TocItem(
            id=next_id,
            page_index=page_index,
            order=order,
            level=level,
            parent_id=stack[-1].id if stack else None,
        )
        next_id += 1
        items.append(item)
        stack.append(item)
    return items
