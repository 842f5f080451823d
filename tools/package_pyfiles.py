"""Build the spark-submit artifact (north rule: the job ships via
``spark-submit --py-files fscrawler_spark.zip``).

Usage:  python tools/package_pyfiles.py  [out_dir]
Writes ``dist/fscrawler_spark.zip`` containing the package sources
(no tests, no caches) and prints the path.  The zip is directly
importable (zipimport), which the test suite asserts.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "fscrawler_spark.zip")
    pkg = os.path.join(REPO, "fscrawler_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
