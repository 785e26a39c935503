"""Pareto frontier, keyword search, running totals."""

from llmaix_spark.operators.profile import pareto_frontier
from llmaix_spark.operators.textstats import search_rank


def test_pareto_hand_computed(spark):
    """(x up, y down). (5,1) dominates everything with x<=5,y>=1.
    (7,3): higher x, higher y — incomparable, on frontier. (5,2):
    dominated by (5,1) (equal x, worse y). (6,2): x between —
    dominated by (7,..)? (7,3) has y=3 > 2 → no; (5,1)? x=5 < 6 → no
    → frontier. Duplicate frontier point kept twice."""
    df = spark.createDataFrame(
        [
            ("a", 5, 1), ("b", 7, 3), ("c", 5, 2), ("d", 6, 2),
            ("e", 3, 0), ("f", 5, 1),
        ],
        "id string, x bigint, y bigint",
    )
    got = sorted(
        r["id"] for r in pareto_frontier(df, "x", "y", ["id"]).collect()
    )
    # e=(3,0): best y — frontier. d=(6,2): strictly dominated by b?
    # b=(7,3): y 3 > 2 no. Any (x'>6, y'<=2)? none → frontier.
    assert got == ["a", "b", "d", "e", "f"]


def test_pareto_single_chain(spark):
    """A strictly increasing x with strictly increasing y keeps
    everything; decreasing y keeps only the last."""
    inc = spark.createDataFrame(
        [(str(i), i, i) for i in range(5)], "id string, x bigint, y bigint"
    )
    assert pareto_frontier(inc, "x", "y", ["id"]).count() == 5
    dec = spark.createDataFrame(
        [(str(i), i, 10 - i) for i in range(5)],
        "id string, x bigint, y bigint",
    )
    got = [r["id"] for r in pareto_frontier(dec, "x", "y", ["id"]).collect()]
    assert got == ["4"]


def test_search_rank_and_semantics(spark):
    """Only docs containing ALL terms rank; ordering by summed score
    then doc_id."""
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple banana banana banana"),
            (3, "apple apple apple"),
            (4, "cherry"),
        ],
        "doc_id bigint, text string",
    )
    got = [
        (r["rank"], r["doc_id"])
        for r in search_rank(docs, ["apple", "banana"], 10).collect()
    ]
    # df(apple)=3 of 4 docs, df(banana)=2: idf(banana) > idf(apple);
    # doc2 has banana*3 → highest sum
    assert [d for _, d in got] == [2, 1] and [r for r, _ in got] == [1, 2]


def test_running_totals_hand_computed(spark):
    from datetime import datetime

    from llmaix_spark.operators.events import running_totals

    e = spark.createDataFrame(
        [
            ("u", 1, datetime(2024, 1, 1, 9, 0), 1.10),
            ("u", 2, datetime(2024, 1, 1, 9, 1), 2.05),
            ("u", 3, datetime(2024, 1, 1, 9, 2), -0.15),
        ],
        "user_id string, event_id bigint, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["running_total"], r["delta"])
        for r in running_totals(e).collect()
    }
    assert got == {
        1: (1.10, None),
        2: (3.15, 0.95),
        3: (3.00, -2.20),
    }
