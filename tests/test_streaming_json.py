"""Streaming tile maintenance + canonical JSON goldens."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gosmonaut_spark.operators.assembly import SKIP_MISSING
from gosmonaut_spark.plans.pipeline import run_pipeline


def test_streaming_tiles_match_batch(spark, tmp_path):
    """availableNow stream over page files == batch aggregation."""
    import pyarrow.parquet as pq

    from gosmonaut_spark.fixtures.pages import pages_arrow_table
    from gosmonaut_spark.functions.cells import cell_expr
    from gosmonaut_spark.sources.pages import extract_nodes
    from gosmonaut_spark.streaming.stream import run_stream_to_memory

    src = tmp_path / "pages_stream"
    src.mkdir()
    tbl = pages_arrow_table(120, seed=42)
    # three files -> three-ish micro-batches
    for i in range(3):
        pq.write_table(tbl.slice(i * 40, 40), str(src / f"part{i}.parquet"))

    run_stream_to_memory(
        spark, str(src), str(tmp_path / "ckpt"), table_name="stream_tiles_t", res=8
    )
    got = {
        (r.window_start, r.cell): r.n_points
        for r in spark.sql("SELECT * FROM stream_tiles_t").collect()
    }

    batch_pages = spark.read.parquet(str(src))
    nodes = extract_nodes(batch_pages).join(
        batch_pages.select("url", "warc_ts"), "url"
    )
    exp = {
        (r.ws, r.cell): r.n
        for r in nodes.groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            cell_expr("lat", "lon", 8).alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "cell", "n")
        .collect()
    }
    assert got == exp and len(got) > 0


@pytest.fixture(scope="module")
def assembled(spark, pages_t1):
    return run_pipeline(
        pages_t1,
        {"node", "way", "relation"},
        None,
        mode=SKIP_MISSING,
    )


def test_canonical_json_structure(spark, assembled):
    """Canonical JSON parses back to the exact entity and follows the
    reference layout rules (sorted tags, 7-decimal coords, node tags
    omitted when empty, way/relation tags always present —
    osm_types.go:56-146)."""
    from gosmonaut_spark.functions.json_out import entities_to_json

    nodes = assembled.nodes.limit(50)
    out = {r.id: r.entity_json for r in entities_to_json(nodes, "node").collect()}
    src = {r.id: r for r in nodes.collect()}
    for nid, js in out.items():
        assert js.endswith("}\n")
        parsed = json.loads(js)
        assert parsed["type"] == "node" and parsed["id"] == nid
        # 7-decimal coords, byte-level
        assert f'"lat": {src[nid].lat:.7f}' in js
        if not src[nid].tags:
            assert '"tags"' not in js
        else:
            assert parsed["tags"] == dict(src[nid].tags)
            keys = list(parsed["tags"])
            assert keys == sorted(keys)

    ways = assembled.ways.limit(20)
    wsrc = {r.id: r for r in ways.collect()}
    wout = {r.id: r.entity_json for r in entities_to_json(ways, "way").collect()}
    for wid, js in wout.items():
        parsed = json.loads(js)
        assert parsed["type"] == "way"
        assert '"tags"' in js  # ways always print tags, even {}
        assert [n["id"] for n in parsed["nodes"]] == [n.id for n in wsrc[wid].nodes]

    rels = assembled.relations.limit(20)
    rsrc = {r.id: r for r in rels.collect()}
    rout = {r.id: r.entity_json for r in entities_to_json(rels, "relation").collect()}
    for rid, js in rout.items():
        parsed = json.loads(js)
        assert parsed["type"] == "relation"
        assert [m["role"] for m in parsed["members"]] == [
            m.role for m in rsrc[rid].members
        ]
        for m, ms in zip(parsed["members"], rsrc[rid].members):
            assert m["entity"]["type"] == ms.type


GOLDEN_NODE = """{
  "type": "node",
  "id": 42,
  "lat": 51.5235442,
  "lon": -0.1355991,
  "tags": {
    "addr:housenumber": "31",
    "amenity": "pub"
  }
}
"""

GOLDEN_WAY_EMPTY = """{
  "type": "way",
  "id": -7,
  "tags": {},
  "nodes": []
}
"""


def test_golden_json_bytes():
    """Byte-for-byte goldens, reference layout (testdata/addr_node.json)."""
    from gosmonaut_spark.functions.json_out import node_json, way_json

    got = node_json(42, 51.5235442, -0.1355991, {"amenity": "pub", "addr:housenumber": "31"}) + "\n"
    assert got == GOLDEN_NODE
    assert way_json(-7, {}, []) + "\n" == GOLDEN_WAY_EMPTY


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState gap sessionization == lag-window batch twin.

    Events are written in time order across micro-batch files; a far-future
    flush event per key advances the watermark past every real session's
    (last + gap), so all real sessions are CLOSED and emitted. The flush
    sessions themselves stay open and are excluded from the comparison."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gosmonaut_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    gap = 600.0  # 10 min
    base = 1_700_000_000
    rows = []
    for key in ("a", "b", "c"):
        koff = {"a": 0, "b": 7, "c": 13}[key]
        t = base + koff
        for sess in range(3):
            for j in range(4 + sess):
                rows.append((key, t))
                t += 120  # 2-min steps, within gap
            t += 1800  # 30-min gap -> closes the session
    flush_ts = base + 40 * 86400  # far future: watermark passes everything
    real = sorted(rows, key=lambda r: r[1])
    batches = [real[: len(real) // 2], real[len(real) // 2 :],
               [(k, flush_ts) for k in ("a", "b", "c")]]

    src = tmp_path / "ev_stream"
    src.mkdir()
    import os as _os
    import time as _time

    now = _time.time()
    for i, b in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": [r[0] for r in b],
                    "ts": pa.array(
                        [r[1] * 1_000_000 for r in b], pa.timestamp("us")
                    ),
                }
            ),
            p,
        )
        # the file source orders micro-batches by mtime; unpinned mtimes
        # made batch order random, and a wildly out-of-order batch can
        # push the watermark past yet-unseen events, which Spark then
        # DROPS (no operator can restore parity after an input drop)
        _os.utime(p, (now - (len(batches) - i) * 60,) * 2)

    stream = (
        spark.readStream.schema("key string, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap, key_col="key", ts_col="ts")
        .writeStream.format("memory")
        .queryName("sess_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stream_t").collect()
    }

    batch_in = spark.read.parquet(str(src)).filter(
        F.col("ts").cast("timestamp").cast("double") < flush_ts
    )
    exp = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(batch_in, gap, key_col="key", ts_col="ts").collect()
    }
    assert len(exp) == 9  # 3 keys x 3 sessions
    assert got == exp


def test_stateful_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A late event (within the watermark) arriving BEFORE the stored
    session's last event must not split one true session into two: after
    merging state into the batch's first local run, the extended run can
    now bridge the gap to the next local run and the gap-merge must be
    re-applied before any run is declared closed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gosmonaut_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    gap = 600.0
    base = 1_700_000_000
    # batch 1: state becomes (1000, 1100). batch 2: late event at 800 and a
    # new event at 1500 — locally split (1500-800 > gap) but 1500 is within
    # gap of the stored last (1100): all four events are ONE session.
    b1 = [("x", base + 1000), ("x", base + 1100)]
    b2 = [("x", base + 800), ("x", base + 1500)]
    flush_ts = base + 40 * 86400
    batches = [b1, b2, [("x", flush_ts)]]

    src = tmp_path / "ooo_stream"
    src.mkdir()
    import os as _os
    import time as _time

    now = _time.time()
    for i, b in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": [r[0] for r in b],
                    "ts": pa.array([r[1] * 1_000_000 for r in b], pa.timestamp("us")),
                }
            ),
            p,
        )
        # the file source orders batches by modification time — pin distinct
        # mtimes so batch i really is micro-batch i
        _os.utime(p, (now - (len(batches) - i) * 60, now - (len(batches) - i) * 60))

    stream = (
        spark.readStream.schema("key string, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap, key_col="key", ts_col="ts")
        .writeStream.format("memory")
        .queryName("sess_ooo_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ooo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_ooo_t").collect()
    }
    batch_in = spark.read.parquet(str(src)).filter(
        F.col("ts").cast("timestamp").cast("double") < flush_ts
    )
    exp = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(batch_in, gap, key_col="key", ts_col="ts").collect()
    }
    assert len(exp) == 1  # one true session: (800 .. 1500), 4 events
    assert got == exp
    assert next(iter(got))[3] == 4
