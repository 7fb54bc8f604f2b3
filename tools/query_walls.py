#!/usr/bin/env python3
"""Per-query wall-clock + float-determinism audit over the FULL registry.

Two jobs in one sweep (VERDICT r4 Next #1 and #5):

1. ``QUERY_WALLS.json`` — runs every ``queries()`` entry (oracled AND
   rows-only) at the given sf dir on Spark, recording per-query wall
   seconds.  The driver samples ~50 of these serially at sf0.01, so any
   query whose wall exceeds ``--budget`` (default 10 s) is listed under
   ``over_budget`` for plan review.

2. Float-output audit (INFORMATIONAL) — for every result column of
   double/float type, checks whether every collected value ``v``
   satisfies ``v == round(v, 9)``.  Adjudication note (r5): the r4
   driver-red rows turned out to be uncast DuckDB integer sums
   (decimal128 serialization), NOT unrounded doubles — bit-identical
   doubles hash fine on the driver, and round(x, 9) is itself lossy in
   DuckDB above ~9e6, so blanket rounding is WRONG.  The ``unrounded``
   list is informational; the binding type law (no decimals, no
   float32) is enforced by tests/test_plan_shapes.py and the oracle
   sweep's Decimal assert.

Usage::

    python3 tools/query_walls.py [--sf /root/testdata/sf0.01]
        [--budget 10] [--out QUERY_WALLS.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--budget", type=float, default=10.0)
    ap.add_argument("--out", default=str(REPO / "QUERY_WALLS.json"))
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from gosmonaut_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )

    qs = entrymod.queries()
    oracled = set(entrymod.oracle_sql())
    names = sorted(qs)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    walls: dict[str, float] = {}
    unrounded: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            df = qs[name](spark, args.sf)
            float_cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("double", "float")
            ]
            rows = df.collect()
            wall = time.monotonic() - t0
            bad = set()
            for r in rows:
                for c in float_cols:
                    v = r[c]
                    if v is not None and v == v and v != round(v, 9):
                        bad.add(c)
            if bad:
                unrounded[name] = sorted(bad)
        except Exception as e:  # noqa: BLE001 — audit must visit every query
            wall = time.monotonic() - t0
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        walls[name] = round(wall, 3)
        flag = " UNROUNDED:" + ",".join(unrounded.get(name, [])) if name in unrounded else ""
        err = " ERR" if name in errors else ""
        print(
            f"[{i + 1}/{len(names)}] {name}: {walls[name]:.2f}s{flag}{err}",
            flush=True,
        )

    over = {n: w for n, w in walls.items() if w > args.budget}
    out = {
        "sf_dir": args.sf,
        "cpus": args.cpus,
        "budget_sec": args.budget,
        "n_queries": len(names),
        "n_oracled": sum(1 for n in names if n in oracled),
        "total_sec": round(sum(walls.values()), 1),
        "over_budget": dict(sorted(over.items(), key=lambda kv: -kv[1])),
        "unrounded": unrounded,
        "errors": errors,
        "walls": walls,
    }
    Path(args.out).write_text(json.dumps(out, indent=1, sort_keys=False))
    print(
        f"\nTOTAL {out['total_sec']}s over {len(names)} queries; "
        f"{len(over)} over budget ({args.budget}s); "
        f"{len(unrounded)} with unrounded float cols; {len(errors)} errors"
    )
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
