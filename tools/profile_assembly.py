"""Adjacent 2-vs-8-core profile of the decode+assembly passes only.

Runs the checkpointed pipeline (no PIP/tiles) in a fresh pinned
interpreter per leg with event logs on, prints per-pass walls and the
per-stage run/cpu/gc totals — the evidence for WHY a pass stops scaling
(wave tail vs per-core throughput collapse vs GC).

Usage: python tools/profile_assembly.py [small_cpus big_cpus]
Child:  python tools/profile_assembly.py --child <cpus> <evdir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(cpus: int, evdir: str) -> None:
    sys.path.insert(0, REPO)
    import time

    from gosmonaut_spark.operators.assembly import SKIP_MISSING
    from gosmonaut_spark.plans.checkpoint import run_pipeline_checkpointed
    from gosmonaut_spark.session import build_session
    from gosmonaut_spark.sources.pages import read_pages

    os.environ["SPARK_GRAFT_EVENTLOG"] = evdir
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    extra = {}
    for kv in os.environ.get("PROF_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = build_session(
        master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 16), extra=extra
    )
    from gosmonaut_spark.fixtures.pages import ensure_pages_parquet

    pages_path = ensure_pages_parquet(
        os.environ.get("SPARK_GRAFT_PAGES_PROFILE", "scale")
    )
    pages = read_pages(spark, pages_path).repartition(cpus * 4)
    ck_dir = tempfile.mkdtemp(
        prefix="prof_ck_", dir=os.environ.get("SPARK_GRAFT_CK_PARENT")
    )

    def hygiene(_):
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    t0 = time.perf_counter()
    ck, dfs = run_pipeline_checkpointed(
        spark, pages, ck_dir, mode=SKIP_MISSING, post_pass=hygiene
    )
    wall = time.perf_counter() - t0
    passes = {e["pass"]: round(e["wall_ms"] / 1000, 1) for e in ck.lineage()}
    print(json.dumps({"cpus": cpus, "wall": round(wall, 1), "passes": passes}))
    spark.stop()


def stage_table(evdir: str) -> list[dict]:
    import collections
    import glob

    import pyarrow as pa

    runt: dict = collections.Counter()
    cpu: dict = collections.Counter()
    gc: dict = collections.Counter()
    ntask: dict = collections.Counter()
    for f in glob.glob(f"{evdir}/*/events_*.zstd") + [
        p for p in glob.glob(f"{evdir}/*") if os.path.isfile(p)
    ]:
        try:
            if f.endswith(".zstd"):
                with pa.CompressedInputStream(pa.OSFile(f, "rb"), "zstd") as fh:
                    data = fh.read().decode("utf-8", "ignore")
            else:
                data = open(f, "rb").read().decode("utf-8", "ignore")
        except Exception:
            continue
        for line in data.splitlines():
            if '"Event":"SparkListenerTaskEnd"' not in line:
                continue
            e = json.loads(line)
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            runt[sid] += m.get("Executor Run Time", 0)
            cpu[sid] += m.get("Executor CPU Time", 0) / 1e6  # ns -> ms
            gc[sid] += m.get("JVM GC Time", 0)
            ntask[sid] += 1
    return [
        {
            "stage": sid,
            "run_s": round(runt[sid] / 1000, 1),
            "cpu_s": round(cpu[sid] / 1000, 1),
            "gc_s": round(gc[sid] / 1000, 1),
            "n_tasks": ntask[sid],
        }
        for sid in sorted(runt, key=lambda s: -runt[s])[:10]
    ]


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        child(int(sys.argv[2]), sys.argv[3])
        return
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_host = os.cpu_count() or big
    for cpus in (big, small):
        evdir = tempfile.mkdtemp(prefix=f"prof_ev_{cpus}_")
        ram = tempfile.mkdtemp(prefix="prof_leg_", dir="/dev/shm")
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_CK_PARENT=ram,
            SPARK_LOCAL_DIRS=ram,
        )
        lo = max(0, n_host - cpus)
        args = [
            "taskset",
            "-c",
            f"{lo}-{n_host - 1}",
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            str(cpus),
            evdir,
        ]
        out = subprocess.run(args, env=env, stdout=subprocess.PIPE, text=True)
        import shutil

        shutil.rmtree(ram, ignore_errors=True)
        head = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        print(f"=== cpus={cpus}: {head}")
        for row in stage_table(evdir):
            print("   ", row)


if __name__ == "__main__":
    main()
