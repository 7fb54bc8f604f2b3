"""Checkpoint + lineage + metrics (B11) — every pass resumable.

Each pass writes a parquet snapshot under ``<base>/<pass_name>/`` plus an
entry in ``<base>/_lineage.json`` recording rows in/out, wall time, and
per-partition row counts. A re-run skips passes whose snapshot exists —
the engine analog of the reference's re-runnable handle + per-pass debug
stats (/root/reference/gosmonaut.go:118-129, :497-530). The layout is
Iceberg-shaped (snapshot dir + manifest); swapping in real Iceberg tables
is a one-line change in ``_write``/``_read``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, base_dir: str, debug: bool = False):
        """``debug=True`` adds per-partition row counts + skew factor to
        every lineage entry — one extra scan per pass, the analog of the
        reference's opt-in DebugMode stats
        (/root/reference/gosmonaut.go:19-38, :497-530). Off by default:
        production runs record wall time + row totals from parquet
        metadata only (no extra jobs)."""
        self.spark = spark
        self.base = base_dir
        self.debug = debug
        os.makedirs(base_dir, exist_ok=True)
        self._lineage_path = os.path.join(base_dir, "_lineage.json")
        # passes may run as concurrent jobs; lineage append is read-modify-
        # write on one JSON file
        import threading

        self._lineage_lock = threading.Lock()

    # -- manifest ----------------------------------------------------------
    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path) as f:
            return json.load(f)

    def _append_lineage(self, entry: dict) -> None:
        with self._lineage_lock:
            entries = self.lineage()
            entries.append(entry)
            tmp = self._lineage_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entries, f, indent=1)
            os.replace(tmp, self._lineage_path)

    # -- snapshots ----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def has(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "_SUCCESS"))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(name))

    def invalidate(self, name: str) -> None:
        import shutil

        shutil.rmtree(self._dir(name), ignore_errors=True)

    def run_pass(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        """Return the pass output, computing + snapshotting only on miss.

        On compute, records lineage: wall ms, output rows, and rows per
        partition (the skew fingerprint — a hot partition shows up here
        before it shows up as a straggler at 100TB).
        ``partition_by``: hive-partition the snapshot (e.g. by entity type
        — the analog of the reference's per-type blob index,
        decode.go:341-383: later passes read only their partition).
        """
        if self.has(name):
            return self.read(name)
        t0 = time.perf_counter()
        df = build()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._dir(name))
        wall_ms = round((time.perf_counter() - t0) * 1000, 1)
        out = self.read(name)
        entry = {"pass": name, "wall_ms": wall_ms}
        if self.debug:
            per_part = (
                out.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .orderBy("pid")
                .collect()
            )
            entry.update(
                {
                    "rows_out": sum(r["count"] for r in per_part),
                    "n_partitions": len(per_part),
                    "rows_per_partition": [int(r["count"]) for r in per_part],
                    "max_partition_skew": (
                        round(
                            max(r["count"] for r in per_part)
                            / max(
                                sum(r["count"] for r in per_part)
                                / max(len(per_part), 1),
                                1,
                            ),
                            2,
                        )
                        if per_part
                        else 0
                    ),
                }
            )
        else:
            # metadata-only count: parquet row-group stats, no table scan
            entry["rows_out"] = out.count()
        self._append_lineage(entry)
        return out


def run_pipeline_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    base_dir: str,
    mode: str = "skip_missing",
    debug: bool = False,
):
    """The 5-pass pipeline with a snapshot boundary after every pass
    (reference pass order, gosmonaut.go:144-216). Returns
    (CheckpointStore, dict of DataFrames). Delete a snapshot dir to force
    recompute of that pass and everything downstream of it."""
    from ..operators.assembly import assemble_relations, assemble_ways
    from ..sources import pages as src

    ck = CheckpointStore(spark, base_dir, debug=debug)

    # ONE decode pass for every entity kind (the reference's run-1 scan
    # populating all indexes, decode.go:262-273): the earlier three
    # concurrent typed passes each zlib-inflated every blob to seek their
    # own section — 3x the dominant extraction cost — and their separate
    # stage tails idled cores. The snapshot is hive-partitioned by etype,
    # so the per-type readers below prune to their partition (the blob
    # index replay analog, decode.go:341-383).
    ents = ck.run_pass(
        "entities", lambda: src.extract_entities(pages), partition_by=["etype"]
    )
    nodes = src.entities_nodes(ents)
    ways_raw = src.entities_ways_raw(ents)
    rels_raw = src.entities_relations_raw(ents)

    members = src.rel_members(rels_raw)
    assembled_ways = ck.run_pass(
        "assembled_ways", lambda: assemble_ways(ways_raw, nodes, mode=mode)
    )
    relations = ck.run_pass(
        "relations",
        lambda: assemble_relations(rels_raw, members, assembled_ways, nodes),
    )
    return ck, {
        "entities": ents,
        "nodes": nodes,
        "ways_raw": ways_raw,
        "relations_raw": rels_raw,
        "assembled_ways": assembled_ways,
        "relations": relations,
    }
