"""spark-submit artifact: the --py-files zip must be importable."""

from __future__ import annotations

import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    from tools.package_pyfiles import build

    out = build(str(tmp_path))
    # import the engine from the zip in a FRESH interpreter whose path
    # contains only the zip (plus stdlib) for the package root
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import fscrawler_spark, fscrawler_spark.plans.wave_loop, "
        "fscrawler_spark.operators.similarity, fscrawler_spark.cli; "
        "print('ok')" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path),  # away from the repo so the zip is the source
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"
