#!/usr/bin/env python3
"""A/B profile harness for the assemble_ways inverse-scaling investigation.

Runs ONE pass (entities decode is read from a pre-built checkpoint, so
only the assembly stage is timed) at a given core count, printing wall
time plus coarse thread-CPU samples so JVM-vs-python-vs-GC attribution is
possible. Usage:

    python3 tools/profile_assembly.py <cpus> [variant]

variant: 'perm' (current ordered_collect_rows) — others may be added
inline while experimenting. Writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sample_threads(stop, out):
    while not stop.is_set():
        try:
            p = subprocess.run(
                ["ps", "-eLo", "pcpu,comm"], capture_output=True, text=True
            )
            agg: dict[str, float] = {}
            for line in p.stdout.splitlines()[1:]:
                parts = line.split(None, 1)
                if len(parts) == 2 and float(parts[0]) > 5.0:
                    agg[parts[1].strip()] = agg.get(parts[1].strip(), 0.0) + float(
                        parts[0]
                    )
            out.append((time.time(), dict(sorted(agg.items(), key=lambda kv: -kv[1]))))
        except Exception:
            pass
        stop.wait(3.0)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from gosmonaut_spark.fixtures.pages import ensure_pages_parquet
    from gosmonaut_spark.operators.assembly import SKIP_MISSING, assemble_ways
    from gosmonaut_spark.plans.checkpoint import CheckpointStore
    from gosmonaut_spark.session import build_session
    from gosmonaut_spark.sources import pages as src
    from gosmonaut_spark.sources.pages import read_pages

    pages_path = ensure_pages_parquet(os.environ.get("PROFILE_PROFILE", "scale"))
    ck_base = os.environ.get("PROFILE_CK", "/tmp/profile_assembly_ck")
    spark = build_session(
        master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 16)
    )
    ck = CheckpointStore(spark, ck_base)
    if not ck.has("entities"):
        t0 = time.perf_counter()
        pages = read_pages(spark, pages_path).repartition(cpus * 4)
        ck.run_pass(
            "entities", lambda: src.extract_entities(pages), partition_by=["etype"]
        )
        print(f"[profile] entities decode: {time.perf_counter() - t0:.1f}s")
    ents = ck.read("entities")
    nodes = src.entities_nodes(ents)
    ways_raw = src.entities_ways_raw(ents)

    samples: list = []
    stop = threading.Event()
    t = threading.Thread(target=_sample_threads, args=(stop, samples), daemon=True)
    t.start()
    # materialize exactly like CheckpointStore.run_pass: full parquet write
    # (count() would let Catalyst prune the collect_list itself)
    out_dir = os.path.join(ck_base, f"_profile_out_{cpus}")
    t0 = time.perf_counter()
    assemble_ways(ways_raw, nodes, mode=SKIP_MISSING).write.mode(
        "overwrite"
    ).parquet(out_dir)
    wall = time.perf_counter() - t0
    stop.set()
    n = spark.read.parquet(out_dir).count()
    print(f"[profile cpus={cpus}] assemble_ways write: {wall:.1f}s rows={n}")
    for ts, agg in samples[:: max(1, len(samples) // 10)]:
        print("  sample:", {k: round(v) for k, v in list(agg.items())[:6]})
    spark.stop()


if __name__ == "__main__":
    main()
