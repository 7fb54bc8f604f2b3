"""Streaming exact dedup: first-seen-wins parity with the batch operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gosmonaut_spark.streaming.dedup import dedup_stream, read_docs_stream


def _doc_files(tmp_path, n_files: int = 3, per_file: int = 40):
    src = tmp_path / "docs_stream"
    src.mkdir()
    base = pd.Timestamp("2024-05-01")
    rows = []
    for i in range(n_files * per_file):
        rows.append(
            {
                "doc_id": i,
                "ingest_ts": base + pd.Timedelta(minutes=i),
                # every third doc repeats an earlier text (cross-file dups)
                "text": f"unique document number {i}"
                if i % 3
                else f"repeated payload {i % 5}",
            }
        )
    pdf = pd.DataFrame(rows)
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("ingest_ts", pa.timestamp("us")),
            ("text", pa.string()),
        ]
    )
    import os
    import time

    # FileStreamSource orders micro-batches by file modification time; pin
    # strictly increasing mtimes so "file i arrives i-th" holds even when
    # the writes land within one clock tick (otherwise the test flakes).
    t0 = time.time()
    for i in range(n_files):
        chunk = pdf.iloc[i * per_file : (i + 1) * per_file]
        path = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
            path,
        )
        os.utime(path, (t0 + i, t0 + i))
    return src, pdf


def test_stream_dedup_matches_batch_first_seen(spark, tmp_path):
    src, pdf = _doc_files(tmp_path)

    stream = dedup_stream(
        read_docs_stream(spark, str(src), max_files_per_trigger=1),
        lateness="30 days",  # nothing evictable within the test horizon
    )
    (
        stream.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r.fp: r.doc_id
        for r in spark.sql("SELECT fp, doc_id FROM dedup_stream_t").collect()
    }

    # batch truth: one row per fingerprint. The kept doc_id must belong to
    # the group AND come from the group's earliest micro-batch (file order
    # is deterministic under availableNow + maxFilesPerTrigger=1; the
    # winner WITHIN a batch is not contractually ordered, so assert at
    # batch granularity)
    from gosmonaut_spark.functions.text import content_fingerprint

    batch = (
        spark.read.parquet(str(src))
        .withColumn("fp", content_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(
            F.collect_set("doc_id").alias("ids"),
            F.min(F.floor(F.col("doc_id") / 40)).alias("first_file"),
        )
    )
    exp = {r.fp: (set(r.ids), r.first_file) for r in batch.collect()}
    assert len(got) == len(exp) > 0
    for fp, doc_id in got.items():
        ids, first_file = exp[fp]
        assert doc_id in ids
        assert doc_id // 40 == first_file, (fp, doc_id, ids)
