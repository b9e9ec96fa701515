"""bpe_train_rounds must reproduce TRUE greedy BPE training: an
independent pure-Python reference (explicit left-to-right greedy merge,
no islands/parity machinery) trains on the same corpus and must produce
the identical merge sequence, counts, and symbol mass per round."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from pdf_craft_spark.queries.textops import (
    _BPE_ROUNDS,
    _BPE_WMAX,
    _BPE_WMIN,
    bpe_train_rounds,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_rounds(texts: list[str]):
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if _BPE_WMIN <= len(w) <= _BPE_WMAX:
                words[w] += 1
    enc = {w: tuple(w) for w in words}
    rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = Counter()
        for w, f in words.items():
            syms = enc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        # argmax with the query's total order: cnt DESC, pair ASC
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in enc:
            syms, out, i = enc[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            enc[w] = tuple(out)
        total = sum(f * len(enc[w]) for w, f in words.items())
        rows.append((r, a, b, cnt, total))
    return rows


def test_spark_bpe_equals_greedy_reference(spark):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    expected = _reference_rounds(texts)
    got = [
        (r["round"], r["pair_a"], r["pair_b"], r["cnt"], r["syms_total_after"])
        for r in bpe_train_rounds(spark, SF_DIR).collect()
    ]
    assert got == expected
