"""Continuous-ingest dedup semantics on an engineered corpus: an arriving
batch document identical to a committed one must come back 'exact_dup'
with the committed doc as canonical; a fresh document must be 'unique';
and the Spark plan must stay value-identical to the DuckDB oracle.  (The
shipped synthetic corpus has no exact duplicates, so this edge needs its
own corpus.)"""

from __future__ import annotations

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_craft_spark.queries.dedup import (
    DEDUP_INCREMENTAL_SQL,
    INGEST_BATCH_PCT,
    dedup_incremental,
)
from tests.oracle_harness import compare

CUTOFF = 100 - INGEST_BATCH_PCT


def _pct(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100


def test_incremental_exact_and_unique_verdicts(spark, tmp_path):
    existing_ids = [i for i in range(200) if _pct(i) < CUTOFF]
    batch_ids = [i for i in range(200) if _pct(i) >= CUTOFF]
    assert len(batch_ids) >= 5 and existing_ids

    # every token carries the doc id so baseline documents share NO
    # shingles (otherwise the whole corpus is mutually near-dup)
    texts = {
        i: f"doc{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(200)
    }
    # batch doc 0: byte-identical to a committed doc (modulo whitespace) →
    # exact_dup, canonical = the committed doc
    donor = existing_ids[0]
    texts[batch_ids[0]] = "  " + texts[donor].replace(" ", "  ") + " "
    # batch doc 1: near-identical to another committed doc (one token
    # appended) — high-Jaccard near-dup candidate
    donor2 = existing_ids[1]
    texts[batch_ids[1]] = texts[donor2] + " omega"
    # batch docs 3+4: identical to EACH OTHER, matching nothing committed —
    # the intra-batch exact pair (two copies arriving together must not
    # both commit as unique)
    texts[batch_ids[3]] = "intra batch twin payload aleph bet gimel"
    texts[batch_ids[4]] = texts[batch_ids[3]]

    ids = sorted(texts)
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["synthetic"] * len(ids)),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int32()),
            }
        ),
        str(d / "documents.parquet"),
    )
    sf_dir = str(d)

    spark_df = dedup_incremental(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    duck_df = con.sql(DEDUP_INCREMENTAL_SQL).df()
    problems = compare(spark_df, duck_df)
    assert not problems, problems

    by_doc = {int(r.doc_id): r for r in spark_df.itertuples(index=False)}
    assert set(by_doc) == set(batch_ids)  # exactly the arriving batch
    dup = by_doc[batch_ids[0]]
    assert dup.verdict == "exact_dup" and dup.exact_dup_of == donor
    near = by_doc[batch_ids[1]]
    # deterministic corpus + hashes → the verdict is a fixed value; pin it
    # so a change that symmetrically empties the near join in BOTH engines
    # (parity still green) cannot pass silently
    assert near.verdict == "near_dup" and near.near_dup_of == donor2
    assert near.exact_dup_of == -1
    fresh = by_doc[batch_ids[2]]
    assert fresh.verdict == "unique"
    assert fresh.exact_dup_of == -1 and fresh.near_dup_of == -1
    # intra-batch exact pair: earliest copy is canonical, the later one is
    # exact_dup OF THE EARLIER BATCH DOC (no committed match exists)
    first, second = sorted((batch_ids[3], batch_ids[4]))
    assert by_doc[first].verdict == "unique"
    assert by_doc[second].verdict == "exact_dup"
    assert by_doc[second].exact_dup_of == first
