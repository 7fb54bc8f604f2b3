"""colocation_stream (watermarked stream-stream self-join) == batch twin
on the same finalized input, across micro-batch splits."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

_BASE = 1_700_000_000


def _rows():
    # (key, ts_sec, lat, lon) — a/b co-located twice within 10 min,
    # a/c same cell but 2 h apart (outside delta), d far away
    return [
        ("a", _BASE, 10.0, 20.0),
        ("b", _BASE + 300, 10.01, 20.01),      # same cell, +5 min -> pair
        ("a", _BASE + 4000, 10.0, 20.0),
        ("b", _BASE + 4200, 10.02, 20.02),     # second contact
        ("c", _BASE + 7200, 10.0, 20.0),       # same cell, 2 h after a -> no
        ("d", _BASE + 100, -60.0, -120.0),
    ]


def _write_batches(tmp_path, batches):
    src = tmp_path / "cl_stream"
    src.mkdir()
    now = time.time()
    for i, b in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": [x[0] for x in b],
                    "ts": pa.array([x[1] * 1_000_000 for x in b], pa.timestamp("us")),
                    "lat": [x[2] for x in b],
                    "lon": [x[3] for x in b],
                }
            ),
            p,
        )
        os.utime(p, (now - (len(batches) - i) * 60,) * 2)
    return src


def test_colocation_stream_matches_batch(spark, tmp_path):
    from gosmonaut_spark.streaming.colocation import (
        colocation_batch_pairs,
        colocation_stream,
    )

    rows = _rows()
    ordered = sorted(rows, key=lambda r: r[1])
    # split mid-contact so the pair spans micro-batches
    src = _write_batches(tmp_path, [ordered[:2], ordered[2:]])

    stream = (
        spark.readStream.schema(
            "key string, ts timestamp_ntz, lat double, lon double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        colocation_stream(stream, 5, 600_000, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("cl_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k1, r.k2, r.cell, r.t1, r.t2)
        for r in spark.sql("SELECT * FROM cl_stream_t").collect()
    }

    batch_in = spark.read.parquet(str(src))
    exp = {
        (r.k1, r.k2, r.cell, r.t1, r.t2)
        for r in colocation_batch_pairs(batch_in, 5, 600_000).collect()
    }
    assert got == exp
    pairs = {(k1, k2) for k1, k2, *_ in got}
    assert pairs == {("a", "b")}         # two contacts, one pair identity
    assert len(got) == 2                 # both contact events emitted
