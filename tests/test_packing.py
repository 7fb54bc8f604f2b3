"""Sequence-packing invariants (functions/packing.py).

The DuckDB bit-parity of corpus_pack_sequences is covered by
test_queries_oracle; these tests pin the packing SEMANTICS:
every token covered exactly once, sequences full except the last per
bucket, fragments contiguous in both doc- and seq-coordinates.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gosmonaut_spark.functions.packing import pack_sequences
from gosmonaut_spark.functions.text import token_count

SF_DIR = "/root/testdata/sf0.001"
L = 32


def _manifest(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs, pack_sequences(docs, seq_len=L, n_buckets=4)


def test_every_token_covered_exactly_once(spark):
    docs, m = _manifest(spark)
    per_doc = m.groupBy("doc_id").agg(
        F.sum("frag_tokens").alias("packed"),
        F.min("doc_offset").alias("first_off"),
    )
    joined = (
        docs.select("doc_id", token_count("text").alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
        .join(per_doc, "doc_id", "full_outer")
    )
    # every non-empty doc appears, fully packed, starting at offset 0
    bad = joined.where(
        F.col("packed").isNull()
        | F.col("n_tokens").isNull()
        | (F.col("packed") != F.col("n_tokens"))
        | (F.col("first_off") != 0)
    )
    assert bad.count() == 0
    # fragments of one doc are contiguous: offsets tile [0, n_tokens)
    w_ok = m.groupBy("doc_id").agg(
        F.sum("frag_tokens").alias("s"),
        (F.max(F.col("doc_offset") + F.col("frag_tokens"))).alias("end"),
    )
    assert w_ok.where(F.col("s") != F.col("end")).count() == 0


def test_sequences_full_except_last_per_bucket(spark):
    _, m = _manifest(spark)
    seqs = m.groupBy("bucket", "seq_id").agg(
        F.sum("frag_tokens").alias("fill")
    )
    last = seqs.groupBy("bucket").agg(F.max("seq_id").alias("last_seq"))
    mid = seqs.join(last, "bucket").where(F.col("seq_id") != F.col("last_seq"))
    assert mid.where(F.col("fill") != L).count() == 0
    assert seqs.where((F.col("fill") <= 0) | (F.col("fill") > L)).count() == 0
    # fragments tile each sequence from offset 0 with no gaps
    tiles = m.groupBy("seq_id").agg(
        F.min("seq_offset").alias("lo"),
        F.max(F.col("seq_offset") + F.col("frag_tokens")).alias("hi"),
        F.sum("frag_tokens").alias("s"),
    )
    assert tiles.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("s"))
    ).count() == 0


def test_empty_docs_absent_and_determinism(spark):
    docs, m = _manifest(spark)
    empty = docs.select(
        "doc_id", token_count("text").alias("n")
    ).where(F.col("n") == 0)
    if empty.count():
        assert m.join(empty, "doc_id", "left_semi").count() == 0
    # deterministic: a second evaluation is row-identical
    m2 = pack_sequences(docs, seq_len=L, n_buckets=4)
    assert m.exceptAll(m2).count() == 0 and m2.exceptAll(m).count() == 0


def test_chunk_documents_invariants(spark):
    """Coverage, overlap, and boundary laws of the sliding-window chunker."""
    from gosmonaut_spark.functions.packing import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(100))),  # many chunks
        (2, " ".join(f"u{i}" for i in range(40))),   # exactly one chunk
        (3, " ".join(f"v{i}" for i in range(41))),   # one token past -> 2 chunks
        (4, "solo"),                                  # tiny doc
        (5, ""),                                      # empty -> no chunks
    ]
    C, O = 40, 8
    S = C - O
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=C, overlap=O).collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 5 not in by_doc
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 2 and len(by_doc[4]) == 1

    toks = {d: t.split(" ") if t else [] for d, t in docs}
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = len(toks[d])
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r.tok_start == r.chunk_idx * S
            assert r.tok_end == min(r.tok_start + C, n)
            assert r.chunk_text == " ".join(toks[d][r.tok_start : r.tok_end])
        # full-coverage: union of [start, end) == [0, n)
        assert rows[0].tok_start == 0 and rows[-1].tok_end == n
        for a, b in zip(rows, rows[1:]):
            assert b.tok_start == a.tok_end - O  # exact overlap
            assert b.tok_end > a.tok_end         # strictly new tokens
