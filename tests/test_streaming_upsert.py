"""stream_merge_to_checkpoint — micro-batched MERGE into CheckpointStore:
final table == sequential batch merges; one snapshot per effective batch;
time travel to mid-ingest states; within-batch latest-per-key collapse."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from gosmonaut_spark.plans.checkpoint import CheckpointStore


def _write_batches(tmp_path, batches):
    src = tmp_path / "up_stream"
    src.mkdir()
    now = time.time()
    for i, b in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "k": [r[0] for r in b],
                    "seq": [r[1] for r in b],
                    "v": [r[2] for r in b],
                    "dead": [r[3] for r in b],
                }
            ),
            str(src / f"part{i}.parquet"),
        )
        os.utime(str(src / f"part{i}.parquet"), (now - (len(batches) - i) * 60,) * 2)
    return src


_BATCHES = [
    # batch 0: inserts; key 1 appears twice — seq 2 must win
    [(1, 1, "a0", False), (1, 2, "a1", False), (2, 1, "b0", False)],
    # batch 1: update key 2, insert key 3
    [(2, 3, "b1", False), (3, 1, "c0", False)],
    # batch 2: tombstone key 1, update key 3
    [(1, 9, "", True), (3, 2, "c1", False)],
]


def test_stream_merge_matches_sequential_batches(spark, tmp_path):
    from gosmonaut_spark.streaming.upsert import (
        latest_per_key,
        stream_merge_to_checkpoint,
    )

    src = _write_batches(tmp_path, _BATCHES)
    store = CheckpointStore(spark, str(tmp_path / "tbl"), retain=10)
    stream = (
        spark.readStream.schema("k long, seq long, v string, dead boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_merge_to_checkpoint(
        stream,
        store,
        "users",
        ["k"],
        "seq",
        str(tmp_path / "up_ckpt"),
        delete_col="dead",
    )
    q.awaitTermination()

    got = {r.k: r.v for r in store.read("users").collect()}
    assert got == {2: "b1", 3: "c1"}  # 1 tombstoned, 2/3 at latest values

    # batch-mode replay of the same batches through the same merge law
    ref = CheckpointStore(spark, str(tmp_path / "ref"), retain=10)
    for b in _BATCHES:
        df = spark.createDataFrame(b, "k long, seq long, v string, dead boolean")
        ref.merge_upsert("users", latest_per_key(df, ["k"], "seq"), ["k"], "dead")
    assert {r.k: r.v for r in ref.read("users").collect()} == got

    # table history: one snapshot per effective batch, merge lineage
    snaps = store.snapshots("users")
    assert len(snaps) == 3
    assert [s.get("operation") for s in snaps[1:]] == ["merge", "merge"]
    assert snaps[1]["parent"] == snaps[0]["id"]
    # time travel to the mid-ingest state (after batch 1)
    mid = {r.k: r.v for r in store.read("users", snapshot_id=snaps[1]["id"]).collect()}
    assert mid == {1: "a1", 2: "b1", 3: "c0"}
    # within-batch collapse picked seq 2 for key 1 in batch 0
    first = {r.k: r.v for r in store.read("users", snapshot_id=snaps[0]["id"]).collect()}
    assert first == {1: "a1", 2: "b0"}
