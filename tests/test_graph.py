"""Graph analytics: triangle counting."""

from llmaix_spark.operators.graph import triangle_counts, two_hop_counts


def test_triangle_counts_hand_computed(spark):
    """K3 {1,2,3} + K3 {2,3,4} sharing edge 2-3; reversed duplicates,
    a multi-edge, a self-loop and an isolated edge 5-6 must all be
    normalized away."""
    edges = spark.createDataFrame(
        [
            ("1", "2"), ("2", "1"), ("2", "3"), ("1", "3"),
            ("3", "4"), ("2", "4"), ("5", "6"), ("4", "4"), ("1", "2"),
        ],
        "subj_id string, obj_id string",
    )
    got = sorted(
        (r["node"], r["n_triangles"])
        for r in triangle_counts(edges).collect()
    )
    assert got == [
        ("1", 1), ("2", 2), ("3", 2), ("4", 1), ("5", 0), ("6", 0),
    ]


def test_triangle_counts_triangle_free(spark):
    """A star graph (hub with 4 leaves) has wedges but no triangles —
    the closing join must kill every wedge."""
    edges = spark.createDataFrame(
        [("h", x) for x in "abcd"], "subj_id string, obj_id string"
    )
    got = triangle_counts(edges).collect()
    assert len(got) == 5 and all(r["n_triangles"] == 0 for r in got)


def test_two_hop_counts_path_graph(spark):
    """Path 1-2-3-4-5: node 3 reaches all 4 others within 2 hops,
    the ends reach 2."""
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")],
        "subj_id string, obj_id string",
    )
    got = {
        r["node"]: r["n_within_2hops"]
        for r in two_hop_counts(edges).collect()
    }
    assert got == {"1": 2, "2": 3, "3": 4, "4": 3, "5": 2}
