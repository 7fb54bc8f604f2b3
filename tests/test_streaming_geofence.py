"""geofence_stream (applyInPandasWithState) == batch geofence_transitions
on the watermark-finalized input, including out-of-order arrivals."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

_FENCES = [(0.0, 30.0, 0.0, 90.0), (45.0, 85.0, 100.0, 180.0)]

_BASE = 1_700_000_000


def _rows():
    # (key, ts_sec, lat, lon) — movers crossing in/out of the fences;
    # unique ts per key so batch id tie-break is irrelevant
    r = []
    # mover a: out -> in(f1) -> in(f1) -> out -> in(f2)
    for i, (lat, lon) in enumerate(
        [(-10, -10), (10, 20), (15, 40), (-50, 20), (50, 150)]
    ):
        r.append(("a", _BASE + i * 600, float(lat), float(lon)))
    # mover b: starts inside, exits once
    for i, (lat, lon) in enumerate([(5, 5), (6, 6), (-5, 5)]):
        r.append(("b", _BASE + 30 + i * 600, float(lat), float(lon)))
    # mover c: never inside
    for i in range(3):
        r.append(("c", _BASE + 60 + i * 600, -40.0, -40.0))
    return r


def _write_batches(tmp_path, batches):
    src = tmp_path / "gf_stream"
    src.mkdir()
    now = time.time()
    for i, b in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": [x[0] for x in b],
                    "ts": pa.array(
                        [x[1] * 1_000_000 for x in b], pa.timestamp("us")
                    ),
                    "lat": [x[2] for x in b],
                    "lon": [x[3] for x in b],
                }
            ),
            p,
        )
        os.utime(p, (now - (len(batches) - i) * 60,) * 2)
    return src


def _run_stream(spark, tmp_path, src, name):
    from gosmonaut_spark.streaming.geofence import geofence_stream

    stream = (
        spark.readStream.schema(
            "key string, ts timestamp_ntz, lat double, lon double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        geofence_stream(stream, _FENCES, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.key, r.ms, r.event)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _batch_expected(spark, rows):
    from gosmonaut_spark.operators.colocation import geofence_transitions

    df = spark.createDataFrame(
        [(k, t * 1000, i, lat, lon) for i, (k, t, lat, lon) in enumerate(rows)],
        "key string, ms long, id long, lat double, lon double",
    )
    return {
        (r.key, r.ms, r.event)
        for r in geofence_transitions(
            df, _FENCES, "key", "ms", "id"
        ).collect()
    }


def test_geofence_stream_matches_batch(spark, tmp_path):
    rows = _rows()
    flush = [(k, _BASE + 40 * 86400, -40.0, -40.0) for k in ("a", "b", "c")]
    ordered = sorted(rows, key=lambda r: r[1])
    src = _write_batches(
        tmp_path, [ordered[: len(ordered) // 2], ordered[len(ordered) // 2 :], flush]
    )
    got = _run_stream(spark, tmp_path, src, "gf_inorder")
    exp = _batch_expected(spark, rows)
    assert exp  # scenario produces transitions
    assert got == exp


def test_geofence_stream_out_of_order_within_watermark(spark, tmp_path):
    """A late ping (within the watermark) arriving AFTER a later ping must
    still finalize in event-time order: mover d goes in -> out -> in, but
    the middle 'out' ping arrives last within its batch window. Emitting
    eagerly would produce enter only; correct finalization emits
    enter/exit/enter."""
    rows = [
        ("d", _BASE, 10.0, 20.0),        # in
        ("d", _BASE + 600, -50.0, 20.0),  # out — arrives late
        ("d", _BASE + 1200, 12.0, 22.0),  # in
    ]
    flush = [("d", _BASE + 40 * 86400, -40.0, -40.0)]
    batches = [[rows[0], rows[2]], [rows[1]], flush]  # middle ping late
    src = _write_batches(tmp_path, batches)
    got = _run_stream(spark, tmp_path, src, "gf_ooo")
    exp = _batch_expected(spark, rows)
    assert got == exp
    assert [e for _, _, e in sorted(got, key=lambda x: x[1])] == [
        "enter",
        "exit",
        "enter",
    ]
