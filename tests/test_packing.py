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
