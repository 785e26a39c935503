import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    """Test session; SPARK_TEST_CORES overrides the width so the suite can
    be replayed at different parallelism (results must be invariant)."""
    from llmaix_spark.session import get_spark

    cores = int(os.environ.get("SPARK_TEST_CORES", "4"))
    s = get_spark(
        master=f"local[{cores}]",
        app_name="llmaix-spark-tests",
        shuffle_partitions=cores,
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
