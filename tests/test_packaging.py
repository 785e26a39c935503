"""spark-submit --py-files packaging: the zipped package must be
importable from the zip alone (no repo on the path)."""

import subprocess
import sys


def test_package_zip_importable(tmp_path):
    from llmaix_spark.session import package_zip

    z = package_zip(str(tmp_path / "llmaix_spark.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import llmaix_spark, llmaix_spark.pipeline, "
        "llmaix_spark.operators.extraction, llmaix_spark.plans.queries; "
        "print('zip-import-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, z],
        capture_output=True,
        text=True,
        timeout=60,
        cwd=str(tmp_path),  # NOT the repo — the zip must be self-sufficient
    )
    assert out.returncode == 0, out.stderr
    assert "zip-import-ok" in out.stdout
