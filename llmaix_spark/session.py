"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB target (AQE on, skew-join on,
partition coalescing on, Arrow enabled with an explicit batch size so the
extraction UDF's micro-batches are predictable) while remaining correct on
local[N] in this sandbox.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size == LLM micro-batch size. The reference sizes llama-server
# batching via `-b 2048 -ub 512` and `server_slots` (reference
# webapp/llm_processing/routes.py:694-704); here the Arrow batch is the unit
# that one backend call fans out over.
DEFAULT_ARROW_BATCH = 512


def _export_package_path() -> str:
    """Make the llmaix_spark package importable in Python workers.

    Local mode forks workers with the driver's PYTHONPATH env — sys.path
    edits on the driver do NOT propagate, so a mapInPandas UDF would die
    with ModuleNotFoundError. On a real cluster the same job ships the
    package via `spark-submit --py-files` (see `package_zip`).
    """
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    return pkg_root


def package_zip(out_path: str) -> str:
    """Zip the package for `spark-submit --py-files` deployment."""
    import zipfile

    pkg_root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_root))
                    zf.write(full, rel)
    return out_path


def get_spark(
    master: str | None = None,
    app_name: str = "llmaix-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE + Arrow tuned defaults."""
    _export_package_path()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # one shuffle partition per core by default; AQE coalesces down.
        # local[N,maxFailures] is valid Spark syntax — parse N only.
        n = master.split("[")[-1].rstrip("]") if "[" in master else str(cpus)
        n = n.split(",")[0].strip()
        shuffle_partitions = cpus if n == "*" else max(int(n), 1)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # deterministic float behaviour for the correctness oracle
        .config("spark.sql.execution.pandas.convertToArrowArraySafely", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def stop_spark() -> None:
    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()
