"""Minimal real Aho-Corasick automaton, API-compatible with the
``ahocorasick`` C extension's subset the reference uses (add_word,
make_automaton, iter yielding (end_index, value) for EVERY overlapping
match).  Injected into sys.modules so the reference's TOC stage becomes
runnable in-sandbox for parity testing."""

from __future__ import annotations

import sys
import types
from collections import deque


class Automaton:
    def __init__(self):
        # trie: list of dicts; node 0 is root
        self._next: list[dict[str, int]] = [{}]
        self._out: list[list] = [[]]
        self._fail: list[int] = [0]
        self._built = False

    def add_word(self, word: str, value) -> None:
        node = 0
        for ch in word:
            nxt = self._next[node].get(ch)
            if nxt is None:
                nxt = len(self._next)
                self._next[node][ch] = nxt
                self._next.append({})
                self._out.append([])
                self._fail.append(0)
            node = nxt
        self._out[node].append(value)
        self._built = False

    def make_automaton(self) -> None:
        self._fail = [0] * len(self._next)
        q = deque()
        for child in self._next[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self._next[node].items():
                q.append(child)
                f = self._fail[node]
                while f and ch not in self._next[f]:
                    f = self._fail[f]
                self._fail[child] = self._next[f].get(ch, 0)
                if self._fail[child] == child:
                    self._fail[child] = 0
        self._built = True

    def iter(self, text: str):
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self._next[node]:
                node = self._fail[node]
            node = self._next[node].get(ch, 0)
            # report outputs along the suffix (fail) chain
            t = node
            while t:
                for value in self._out[t]:
                    yield i, value
                t = self._fail[t]


def install() -> None:
    """Replace any stub 'ahocorasick' with this real implementation.
    Must run before the reference's toc modules are first imported."""
    mod = sys.modules.get("ahocorasick")
    if mod is not None and getattr(mod, "__real_aho__", False):
        return
    mod = types.ModuleType("ahocorasick")
    mod.Automaton = Automaton
    mod.__real_aho__ = True
    sys.modules["ahocorasick"] = mod
    # if the reference toc modules were already imported against the stub,
    # drop them so the next import binds the real automaton
    for name in list(sys.modules):
        if name.startswith("pdf_craft.toc"):
            del sys.modules[name]
