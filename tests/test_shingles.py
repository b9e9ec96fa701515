"""_shingle_rows semantics guard: the codegen posexplode+lead rewrite must
stay row-identical to the word-3-gram definition it replaced.

The reference definition is an INDEPENDENT Python implementation (split on
\\s+, drop empties, distinct ' '.join(toks[i:i+3])), so a semantic drift in
the window formulation (boundary handling, null concat, distinct scope)
breaks this test even while every downstream oracle happens to agree.
A plan guard additionally pins that no interpreted lambda HOF re-entered
the pipeline — the whole point of the rewrite.
"""

from __future__ import annotations

import random
import re

from pdf_craft_spark.queries.dedup import _shingle_rows


def _ref_shingles(text: str) -> set[str]:
    toks = [t for t in re.split(r"\s+", text) if t]
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "x", "1", "word", "中文", "tok"]
    docs: list[tuple[int, str]] = [
        (0, ""),  # no tokens
        (1, "one"),  # 1 token
        (2, "one two"),  # 2 tokens -> no shingle
        (3, "one two three"),  # exactly one shingle
        (4, "a a a a a"),  # repeated shingles -> distinct collapses
        (5, "  lead \t tab\nnewline   trail  "),  # whitespace variety
    ]
    for i in range(6, 120):
        n = rng.randrange(0, 30)
        sep = lambda: rng.choice([" ", "  ", "\t", "\n", " \t "])  # noqa: E731
        docs.append((i, "".join(rng.choice(words) + sep() for _ in range(n))))
    return docs


def test_shingle_rows_match_reference(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[str]] = {}
    for r in _shingle_rows(df).collect():
        got.setdefault(int(r["doc_id"]), set()).add(r["sh"])
    for doc_id, text in docs:
        want = _ref_shingles(text)
        assert got.get(doc_id, set()) == want, (doc_id, text)


def test_shingle_rows_carry_and_no_lambda(spark):
    docs = spark.createDataFrame(
        [(1, "p", "a b c d"), (2, "q", "x y")], "doc_id long, tag string, text string"
    )
    out = _shingle_rows(docs, carry=("tag",))
    rows = {(int(r["doc_id"]), r["tag"], r["sh"]) for r in out.collect()}
    assert rows == {(1, "p", "a b c"), (1, "p", "b c d")}
    # the rewrite's raison d'etre: the shingle EXPANSION is lambda-free —
    # no per-output-element transform/sequence/element_at pipeline (the
    # interpreted shape this replaced).  _tokens()' once-per-doc filter
    # lambda is fine and stays.
    plan = out._jdf.queryExecution().optimizedPlan().toString().lower()
    for marker in ("transform(", "sequence(", "element_at("):
        assert marker not in plan, (marker, plan)
    assert "lead(" in plan  # the window formulation is actually in use
