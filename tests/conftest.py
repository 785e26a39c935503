import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from llmaix_spark.session import get_spark

    s = get_spark(
        master="local[4]",
        app_name="llmaix-spark-tests",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def transcripts_dir():
    """Deterministic transcripts fixture at smoke scale (seed=42)."""
    from llmaix_spark.datagen import ensure_transcripts

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    return ensure_transcripts(0.001, base)
