"""rate_limit_stream (applyInPandasWithState) == rate_limit_batch on the
watermark-finalized stream, including out-of-order arrivals, plus the
exact millitoken refill law on hand-computed sequences."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

_BASE = 1_700_000_000


def _write_batches(tmp_path, batches):
    src = tmp_path / "rl_stream"
    src.mkdir()
    now = time.time()
    for i, b in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": [x[0] for x in b],
                    "ts": pa.array(
                        [int(round(x[1] * 1_000_000)) for x in b],
                        pa.timestamp("us"),
                    ),
                    "event_id": pa.array([x[2] for x in b], pa.int64()),
                }
            ),
            p,
        )
        os.utime(p, (now - (len(batches) - i) * 60,) * 2)
    return src


def _run_stream(spark, tmp_path, src, name, capacity, rate):
    from gosmonaut_spark.streaming.ratelimit import rate_limit_stream

    stream = (
        spark.readStream.schema("key string, ts timestamp_ntz, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        rate_limit_stream(stream, capacity, rate, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.key, r.event_id, r.ms, r.admitted)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _batch_expected(spark, rows, capacity, rate):
    from gosmonaut_spark.streaming.ratelimit import rate_limit_batch

    df = spark.createDataFrame(
        [(k, int(round(t * 1000)), i) for (k, t, i) in rows],
        "key string, ms long, event_id long",
    )
    return {
        (r.key, r.event_id, r.ms, r.admitted)
        for r in rate_limit_batch(df, capacity, rate).collect()
    }


def test_rate_limit_replay_law():
    """Hand-computed: capacity 2, rate 1 tok/s. Burst of 3 at t=0 →
    admit 2, deny 1; at +500ms bucket has 500 mtok → deny; at +1s
    bucket crosses 1000 mtok → admit."""
    from gosmonaut_spark.streaming.ratelimit import _replay

    evs = [(0, 1), (0, 2), (0, 3), (500, 4), (1000, 5)]
    decided, bucket, last = _replay(0, None, evs, 2000, 1)
    assert decided == [1, 1, 0, 0, 1]
    assert last == 1000
    # after the t=1000 admit: refilled 500 at t=1000 (total 1000), spent
    # 1000 -> exactly 0 left
    assert bucket == 0


def test_rate_limit_stream_matches_batch(spark, tmp_path):
    rows = []
    # key a: burst of 4 at t0 (cap 2), then spaced recoveries
    rows += [("a", _BASE, i) for i in range(4)]
    rows += [("a", _BASE + 5, 10), ("a", _BASE + 6, 11)]
    # key b: slow ticker, never denied
    rows += [("b", _BASE + i * 10, 100 + i) for i in range(5)]
    flush = [("a", _BASE + 40 * 86400, 999), ("b", _BASE + 40 * 86400, 998)]
    ordered = sorted(rows, key=lambda r: r[1])
    src = _write_batches(
        tmp_path,
        [ordered[: len(ordered) // 2], ordered[len(ordered) // 2 :], flush],
    )
    got = _run_stream(spark, tmp_path, src, "rl_inorder", 2, 1)
    # flush events exist only to advance the watermark; they are never
    # finalized themselves (wm cannot pass them), so compare without them
    exp = {
        e for e in _batch_expected(spark, rows + flush, 2, 1)
        if e[1] not in (999, 998)
    }
    assert {g for g in got if g[3] == 0}  # denials exist
    assert got == exp


def test_rate_limit_stream_out_of_order_within_watermark(spark, tmp_path):
    """A late event (within watermark) must consume its token in event-
    time order: key c has events at t0, t0+1s, t0+2s with capacity 1,
    rate 1 — all admitted in true order. The middle event arrives last;
    deciding eagerly would deny it (bucket empty at arrival frontier)."""
    rows = [("c", _BASE, 1), ("c", _BASE + 1, 2), ("c", _BASE + 2, 3)]
    flush = [("c", _BASE + 40 * 86400, 99)]
    batches = [[rows[0], rows[2]], [rows[1]], flush]
    src = _write_batches(tmp_path, batches)
    got = _run_stream(spark, tmp_path, src, "rl_ooo", 1, 1)
    exp = {
        e for e in _batch_expected(spark, rows + flush, 1, 1)
        if e[1] != 99
    }
    assert got == exp
    by_id = {g[1]: g[3] for g in got}
    assert by_id[1] == 1 and by_id[2] == 1 and by_id[3] == 1


def test_rate_limit_frontier_survives_decided_batch(spark, tmp_path):
    """Regression (ADVICE r4, high): a key whose buffered events are ALL
    decided in one micro-batch must keep its (bucket, last_ms) frontier
    until the bucket provably refills — removing it hands the next event
    a fresh FULL bucket and diverges from the batch twin.

    cap 5, rate 1: a 6-event burst at t0 (admit 5, deny 1 → bucket 0).
    The watermark creeps to t0+1 s (batch 2, no "a" rows — the armed
    event-time timeout is what invokes the key), deciding the burst with
    NOTHING waiting and the bucket NOT yet refilled. Then events at
    t0+2.0/2.1/2.2 s arrive — refills 2000/100/100 mtok, so the batch
    law says admit, admit, DENY; a stream that dropped the frontier
    admits all 3. The watermark must move only slightly past the burst:
    once wm passes t0+5 s a full refill is provable and dropping the
    frontier becomes legitimately safe."""
    rows = [("a", _BASE, i) for i in range(6)]
    later = [
        ("a", _BASE + 2.0, 20),
        ("a", _BASE + 2.1, 21),
        ("a", _BASE + 2.2, 22),
    ]
    # wm after batch N is max event time of batches < N minus 30 min:
    # batch 2 runs with wm = _BASE+1 -> fires a's timeout, decides the
    # burst, none waiting, bucket 0 of 5000 (not refilled at wm).
    wm_push = [("w", _BASE + 1801, 900)]
    wm_push2 = [("w", _BASE + 1802, 901)]
    flush = [("a", _BASE + 40 * 86400, 999)]
    src = _write_batches(tmp_path, [rows + wm_push, wm_push2, later, flush])
    got = _run_stream(spark, tmp_path, src, "rl_frontier", 5, 1)
    exp = {
        e
        for e in _batch_expected(
            spark, rows + later + wm_push + wm_push2 + flush, 5, 1
        )
        if e[1] != 999
    }
    assert got == exp
    by_id = {g[1]: g[3] for g in got}
    assert by_id[20] == 1 and by_id[21] == 1 and by_id[22] == 0


def test_rate_limit_frontier_removed_after_refill(spark, tmp_path):
    """The refill timeout removes the kept frontier, and a burst arriving
    AFTER the refill instant still gets the full bucket either way —
    stream == batch across the remove boundary. cap 2, rate 1: burst of 3
    at t0 (admit 2, deny 1; refill completes at t0+2s); next burst of 3
    at t0+3600 s (bucket full again) → admit 2, deny 1. The watermark
    walks through three stages: wm=t0+1 (burst decided, frontier kept,
    refill timeout armed at t0+2), wm=t0+2 (refill timeout fires, bucket
    provably full, state removed), then the second burst on a fresh
    key."""
    b1 = [("a", _BASE, i) for i in range(3)]
    b2 = [("a", _BASE + 3600, 10 + i) for i in range(3)]
    wm_push = [("w", _BASE + 1801, 900)]   # -> wm t0+1: decides b1
    wm_push2 = [("w", _BASE + 1802, 901)]  # -> wm t0+2: refill timeout
    wm_push3 = [("w", _BASE + 1803, 902)]
    flush = [("a", _BASE + 40 * 86400, 999)]
    src = _write_batches(
        tmp_path, [b1 + wm_push, wm_push2, wm_push3, b2, flush]
    )
    got = _run_stream(spark, tmp_path, src, "rl_refill", 2, 1)
    exp = {
        e
        for e in _batch_expected(
            spark, b1 + b2 + wm_push + wm_push2 + wm_push3 + flush, 2, 1
        )
        if e[1] != 999
    }
    assert got == exp
    assert sorted(g[3] for g in got if g[1] >= 10 and g[0] == "a") == [0, 1, 1]
