"""The JVM-F1 lone-surrogate parity footnote, as a test.

The Python kernel's F1 (textutil.normalize_text) strips lone surrogates;
the JVM stage-1 expression (plans/pipeline.prepare_stage1) does not.
This is safe because lone surrogates CANNOT reach a JVM string column:
every ingest edge either rejects them or replaces them with U+FFFD before
Spark expressions run —

- pyarrow refuses to encode them (Arrow/parquet ingest),
- the pickle createDataFrame path replaces them with U+FFFD,

and on the post-boundary values both surfaces compute identical results
(U+FFFD is not a surrogate; neither side touches it).  The fuzz below
injects surrogate-bearing strings through the boundary and asserts (a)
no surrogate survives into the JVM column, (b) the full JVM stage-1
output equals the Python kernel's normalize_text on the same
post-boundary values, (c) valid astral pairs pass through BOTH sides
untouched (the Java regex class [\\uD800-\\uDFFF] would only ever match
unpaired units — pairs are single astral code points)."""

from __future__ import annotations

import random
import re

import pytest

from pdf_craft_spark.operators.textutil import normalize_text, remove_surrogates
from pdf_craft_spark.plans.pipeline import prepare_stage1

_SURROGATE = re.compile(r"[\ud800-\udfff]")


def _fuzz_strings(n: int = 60) -> list[str]:
    rng = random.Random(20260817)
    pieces = ["ab", "  ", "\t", "x", "€", "漢", "\U0001F600", "\U00010348", ".", ""]
    lone = [chr(rng.randrange(0xD800, 0xE000)) for _ in range(8)]
    out = []
    for _ in range(n):
        k = rng.randrange(1, 8)
        s = "".join(rng.choice(pieces + lone) for _ in range(k))
        out.append(s[:30])  # short: below stage-1's repetition-scan guard
    out += ["a\ud800b", "\udfff", " \ud955 x ", "pair\U0001F600ok", ""]
    return out


def test_kernel_strips_lone_surrogates_only():
    assert normalize_text("a\ud800b") == "ab"
    # a high+low surrogate written separately stays TWO lone code points
    # in a Python str (no auto-pairing) — both stripped
    assert remove_surrogates("\ud800\udfff") == ""
    # astral pairs are single code points in Python str — untouched
    assert normalize_text("x\U0001F600y") == "x\U0001F600y"
    assert normalize_text("x�y") == "x�y"  # U+FFFD is kept


def test_arrow_ingest_rejects_lone_surrogates():
    import pyarrow as pa

    with pytest.raises(Exception):
        pa.array(["a\ud800b"], type=pa.string())


def test_jvm_stage1_agrees_with_kernel_post_boundary(spark):
    strings = _fuzz_strings()
    rows = [(str(i), "text", s, None, i) for i, s in enumerate(strings)]
    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset long"
    )
    # (a) the boundary already sanitized: no surrogate reaches the column
    boundary = {r.doc_id: r.text for r in df.select("doc_id", "text").collect()}
    for v in boundary.values():
        assert not _SURROGATE.search(v)
    # (b) full JVM stage-1 vs the Python kernel on the SAME post-boundary
    # values (rows the repetition filter drops are dropped knowingly:
    # inputs here sit under the length guard)
    jvm = {r.doc_id: r.text for r in prepare_stage1(df).collect()}
    assert set(jvm) == set(boundary)
    for doc_id, v in boundary.items():
        assert jvm[doc_id] == normalize_text(v), ascii(v)
    # (c) astral pair survived both sides
    assert jvm["63"] == "pair\U0001F600ok"
