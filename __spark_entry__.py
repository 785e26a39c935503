"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG pipeline (assemble → extract → link →
                 canonicalize) over transcripts derived from the sf0.001
                 documents table; returns the canonical edges DataFrame.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); see llmaix_spark/plans/queries.py.
oracle_sql()   — DuckDB-runnable ANSI SQL twins for every
                 SQL-expressible query (others get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Python workers need the package on PYTHONPATH (local mode forks with the
# driver's env; on a cluster ship llmaix_spark via --py-files).
_existing = os.environ.get("PYTHONPATH", "")
if _REPO not in _existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + (
        os.pathsep + _existing if _existing else ""
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from llmaix_spark.plans.queries import q_kg_pipeline_edges

    return q_kg_pipeline_edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from llmaix_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from llmaix_spark.plans.queries import ORACLES

    return dict(ORACLES)
