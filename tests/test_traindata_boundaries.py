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


def test_embed_quantize_empty_embedding_edge(spark, tmp_path):
    """A zero-length embedding must quantize identically in both engines:
    Spark's aggregate() fold yields its 0.0 init and array_join gives '',
    while DuckDB's list_max/string_agg yield NULL — the oracle coalesces
    to Spark's identities (latent parity break on real ragged data)."""
    from tests.oracle_harness import compare

    vecs = [[], [0.5, -1.0, 0.25], [0.0, 0.0], [2.0], None]  # incl. NULL row
    d = tmp_path / "emb"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
                "label": pa.array([str(i % 3) for i in range(len(vecs))]),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    sf_dir = str(d)
    spark_df = QUERIES["embed_quantize_int8"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    duck_df = con.sql(ORACLES["embed_quantize_int8"]).df()
    problems = compare(spark_df, duck_df)
    assert not problems, problems
    row0 = spark_df[spark_df.vec_id == 0].iloc[0]
    assert row0["scale"] == 0.0 and row0["q_csv"] == ""
    # all-zero vector: scale 0.0, quantized to literal zeros
    row2 = spark_df[spark_df.vec_id == 2].iloc[0]
    assert row2["scale"] == 0.0 and row2["q_csv"] == "0,0"
    # NULL embedding normalizes to the empty-array identities on both sides
    row4 = spark_df[spark_df.vec_id == 4].iloc[0]
    assert row4["scale"] == 0.0 and row4["q_csv"] == ""


def _pct(doc_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100


def test_contamination_hot_shingle_cutoff(spark, tmp_path):
    """A boilerplate shingle present in (nearly) every train document must
    be dropped by the train-side document-frequency cutoff: it is corpus
    furniture, not leak evidence, and without the cutoff it alone fans the
    join out to |test|·df_train rows.  A genuinely rare shared shingle
    still counts as contamination, and the Spark result stays
    value-identical to the cutoff-mirroring DuckDB oracle."""
    from tests.oracle_harness import compare

    n = 60
    hot = "zz yy xx"
    texts = [f"{hot} unique{i}a unique{i}b unique{i}c" for i in range(n)]
    test_ids = [i for i in range(n) if _pct(i) >= 95]
    train_ids = [i for i in range(n) if _pct(i) < 90]
    assert test_ids and len(train_ids) > 20
    leak = "leakone leaktwo leakthree"
    texts[test_ids[0]] += " " + leak
    texts[train_ids[0]] += " " + leak
    rows = {
        "doc_id": list(range(n)),
        "text": texts,
        "lang": ["en"] * n,
        "source": ["synthetic"] * n,
        "n_chars": [len(t) for t in texts],
    }
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    sf_dir = str(d)

    spark_df = QUERIES["contamination_check"](spark, sf_dir).toPandas()
    duck_df = _duck(sf_dir, ORACLES["contamination_check"])
    problems = compare(spark_df, duck_df)
    assert not problems, problems

    by_doc = {int(r.doc_id): r for r in spark_df.itertuples(index=False)}
    # the hot shingle is in every train doc (df >> cutoff) → contributes 0
    for tid in test_ids[1:]:
        assert by_doc[tid].n_contaminated == 0, tid
    # the rare leak shingle (df_train = 1) still counts — exactly once
    assert by_doc[test_ids[0]].n_contaminated == 1
