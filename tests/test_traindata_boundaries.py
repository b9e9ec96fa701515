"""Packing/split boundary semantics on adversarial corpora.

The sf-dir parity suite checks the shipped corpus; these corpora are
built to sit exactly ON the packing boundaries — 0-token (empty text)
documents, exact-capacity fits, single documents larger than the whole
capacity — and the Spark plans must still match the DuckDB oracles
value-for-value (the WITH RECURSIVE fill in particular must agree with
the stateful kernel at the == boundary and on oversized docs)."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_craft_spark.queries.traindata import ORACLES, QUERIES, SEQ_CAPACITY

NAMES = ["split_train_val_test", "pack_training_sequences", "pack_greedy_exact",
         "packed_sequence_texts"]


def _write_docs(tmp_path, token_counts: list[int]) -> str:
    rows = {
        "doc_id": list(range(len(token_counts))),
        "text": ["w " * n for n in token_counts],  # n whitespace tokens
        "lang": ["en"] * len(token_counts),
        "source": ["synthetic"] * len(token_counts),
        "n_chars": [2 * n for n in token_counts],
    }
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.sql(sql).df()


CORPORA = {
    "boundaries": [0, 1, SEQ_CAPACITY - 1, SEQ_CAPACITY, SEQ_CAPACITY + 1,
                   3 * SEQ_CAPACITY, 0, SEQ_CAPACITY, 7],
    "random": [random.Random(11).randrange(0, 2 * SEQ_CAPACITY) for _ in range(60)],
    "all_empty": [0] * 12,
}


@pytest.mark.parametrize("corpus", sorted(CORPORA))
@pytest.mark.parametrize("name", NAMES)
def test_boundary_corpora_match_oracle(spark, tmp_path, corpus, name):
    from tests.oracle_harness import compare

    sf_dir = _write_docs(tmp_path, CORPORA[corpus])
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    duck_df = _duck(sf_dir, ORACLES[name])
    problems = compare(spark_df, duck_df)
    assert not problems, f"{name}/{corpus}: {problems}"
    if name == "pack_greedy_exact" and corpus == "boundaries":
        # a doc alone bigger than the capacity still occupies exactly one
        # sequence, and exact fits close their sequence
        by_doc = {int(r.doc_id): r for r in spark_df.itertuples(index=False)}
        big = by_doc[5]  # 3*capacity tokens
        assert big.filled == 3 * SEQ_CAPACITY
        assert sum(1 for r in by_doc.values()
                   if r.shard == big.shard and r.seq_id == big.seq_id) == 1
