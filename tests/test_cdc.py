"""CDC apply-changes merge."""

import pytest

from llmaix_spark.operators.cdc import apply_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, bal double",
    )


def test_apply_changes_semantics(spark):
    """Delete k=1, two upserts on k=2 (seq 2 wins, FULL-row replace —
    the stale seq-1 name must not leak), insert k=4; k=3 untouched."""
    changes = spark.createDataFrame(
        [
            (1, 1, "delete", None, None),
            (2, 1, "upsert", "b1", 21.0),
            (2, 2, "upsert", "b2", 22.0),
            (4, 1, "upsert", "d", 40.0),
        ],
        "k bigint, seq int, op string, name string, bal double",
    )
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in apply_changes(_base(spark), changes, ["k"]).collect()
    }
    assert got == {2: ("b2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_apply_changes_delete_then_reinsert(spark):
    """A later upsert after a delete resurrects the key (last wins)."""
    changes = spark.createDataFrame(
        [(1, 1, "delete", None, None), (1, 2, "upsert", "a2", 11.0)],
        "k bigint, seq int, op string, name string, bal double",
    )
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in apply_changes(_base(spark), changes, ["k"]).collect()
    }
    assert got[1] == ("a2", 11.0) and set(got) == {1, 2, 3}


def test_apply_changes_missing_payload_raises(spark):
    changes = spark.createDataFrame(
        [(1, 1, "delete")], "k bigint, seq int, op string"
    )
    with pytest.raises(ValueError, match="payload"):
        apply_changes(_base(spark), changes, ["k"])
