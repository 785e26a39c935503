#!/usr/bin/env python3
"""Per-query isolation harness for optimization work (guide §1.4).

NOT the driver bench — bench.py is frozen for measurement. This tool
times individual headline queries with the noop sink under the same
session config as bench.py, and optionally dumps .explain("formatted")
to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (median of N)
  python bench_extra.py --explain TAG q1 ... # also write plan files
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS respected as in bench.py.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _exec_full(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    explain_tag = None
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    if args and args[0] == "--explain":
        explain_tag = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from llmaix_spark.plans import queries as qmod
    from llmaix_spark.plans.queries import QUERIES
    from llmaix_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench-extra",
                      shuffle_partitions=cpus)
    # same warmup as bench.py
    _exec_full(QUERIES["textstats_tokens"](spark, sf_dir))
    _exec_full(QUERIES["kg_mentions"](spark, sf_dir))

    def reset_scratch() -> None:
        import shutil

        for d in qmod._KG_SCRATCH.values():
            shutil.rmtree(d, ignore_errors=True)
        qmod._KG_SCRATCH.clear()

    out: dict[str, dict] = {}
    for name in args:
        times = []
        for _ in range(reps):
            reset_scratch()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _exec_full(QUERIES[name](spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(times), 3),
            "times": times,
        }
        if explain_tag:
            reset_scratch()
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            with open(
                os.path.join(pdir, f"{name}_{explain_tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
