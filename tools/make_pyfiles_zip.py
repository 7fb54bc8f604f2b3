#!/usr/bin/env python3
"""Package gosmonaut_spark for spark-submit --py-files.

    python tools/make_pyfiles_zip.py [out_zip]

Produces a zip with the package at its root (importable once Spark adds it
to every executor's PYTHONPATH) — the cluster-faithful alternative to the
shared-filesystem sys.path fallback in sources/pages.py.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gosmonaut_spark.zip"
    pkg = os.path.join(REPO, "gosmonaut_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
