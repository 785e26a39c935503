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


def test_scd2_history_versions(spark):
    """k=1: base → upsert(1) → delete(2): versions [0,1) open-closed
    at 1, [1,2) closed by the delete, NO current row. k=2 untouched:
    one open version. k=4 insert-only: one open version from seq 1."""
    from llmaix_spark.operators.cdc import scd2_history

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "k bigint, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "a1", 11.0),
            (1, 2, "delete", None, None),
            (4, 1, "upsert", "d", 40.0),
        ],
        "k bigint, seq int, op string, name string, bal double",
    )
    got = {
        (r["k"], r["valid_from"]): (
            r["name"], r["valid_to"], r["is_current"]
        )
        for r in scd2_history(base, changes, ["k"]).collect()
    }
    assert got == {
        (1, 0): ("a", 1, False),
        (1, 1): ("a1", 2, False),
        (2, 0): ("b", None, True),
        (4, 1): ("d", None, True),
    }
