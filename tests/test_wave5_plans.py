"""Plan-shape pins and partition-invariance for the late-round-5
analytics wave.

Plan pins make the 100 TB claims checkable: each test asserts the
physical-plan property the operator's docstring promises (single
exchange, no global window, broadcast joins). Invariance tests replay
the order-sensitive-looking queries at two shuffle widths — the
results must be identical because every ordering the queries rely on
(window frames, min_by ties, top-k keys) is total.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_winnow_plan_single_sort_single_exchange(spark):
    """Both window passes (lead-chain k-grams, min_by frame) must ride
    ONE (doc_id, pos) sort behind ONE exchange."""
    from llmaix_spark.plans.queries import q_fingerprint_winnow

    plan = _phys(q_fingerprint_winnow(spark, SF_DIR))
    # the distinct at the end adds its own exchange; the window stack
    # below it must contribute exactly one
    assert plan.count("Sort ") == 1
    assert plan.count("Window") == 2


def test_active_users_plan_has_no_window(spark):
    """The trailing-distinct metric must plan with NO window operator
    at all — the contribution-explode replaces the global range window
    (a single-task plan at any cluster size)."""
    from llmaix_spark.plans.queries import q_active_users_7d

    plan = _phys(q_active_users_7d(spark, SF_DIR))
    assert "Window" not in plan
    assert "Explode" in plan or "Generate" in plan


def test_session_paths_plan_one_exchange_for_both_windows(spark):
    """Session numbering and trigram leads share the user_id
    partitioning: exactly one hashpartitioning(user_id) exchange and
    one sort below the aggregation, and the top-k is
    TakeOrderedAndProject, never a global sort."""
    from llmaix_spark.plans.queries import q_session_paths

    plan = _phys(q_session_paths(spark, SF_DIR))
    assert plan.count("hashpartitioning(user_id") == 1
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_copurchase_plan_broadcasts_frequency_table(spark):
    """The two item-frequency joins must broadcast (the table is
    |items| rows); only the basket self-join may shuffle."""
    from llmaix_spark.plans.queries import q_copurchase_cosine

    plan = _phys(q_copurchase_cosine(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2


def test_ewma_partition_invariance(spark):
    """collect_list over a rows-frame is frame-ordered: the EWMA must
    be bit-identical at different shuffle widths (total order on
    (ts, event_id) leaves no tie for partitioning to break)."""
    from llmaix_spark.plans.queries import q_events_ewma

    rows = {}
    for n in ("4", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        rows[n] = sorted(
            (r["event_id"], r["window_n"], r["ewma"])
            for r in q_events_ewma(spark, SF_DIR).collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["4"] == rows["32"]


@pytest.mark.parametrize(
    "qname",
    ["fingerprint_winnow", "session_paths", "copurchase_cosine",
     "activity_streaks"],
)
def test_wave_partition_invariance(spark, qname):
    """min_by ties (winnow), top-k ties (paths/copurchase) and struct
    mins (streaks) all resolve on total keys — identical output at 4
    and 32 shuffle partitions."""
    from llmaix_spark.plans.queries import QUERIES

    q = QUERIES[qname]
    rows = {}
    for n in ("4", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        rows[n] = sorted(map(tuple, q(spark, SF_DIR).collect()))
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["4"] == rows["32"]
