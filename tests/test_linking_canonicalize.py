"""Linking (MinHash-LSH + verify) and CC canonicalization unit tests."""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators.canonicalize import (
    canonical_assignments,
    connected_components,
    salted_count,
)
from llmaix_spark.operators.linking import (
    match_edges,
    mention_table,
    minhash_signatures,
    lsh_candidate_pairs,
    verify_pairs,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, subj_surface string, pred string, obj_surface string"
    )


def test_mention_table_counts_and_norms(spark):
    t = _triples(
        spark,
        [
            ("c1", "Anna Müller", "works_at", "Acme Corp"),
            ("c2", "Anna Müller", "works_at", "Acme Corp"),
            ("c3", "anna mueller", "lives_in", "Köln"),
        ],
    )
    m = {r["surface"]: (r["n_refs"], r["norm"]) for r in mention_table(t).collect()}
    assert m["Anna Müller"] == (2, "anna mueller")
    assert m["anna mueller"] == (1, "anna mueller")
    assert m["Köln"] == (1, "koeln")


def test_minhash_identical_norms_identical_sigs(spark):
    norms = spark.createDataFrame([("anna mueller",), ("anna mueller x",)], ["norm"]).distinct()
    sigs = {r["norm"]: r["sig"] for r in minhash_signatures(norms).collect()}
    assert len(sigs["anna mueller"]) == 16
    # near-duplicate shares most minhashes
    same = sum(a == b for a, b in zip(sigs["anna mueller"], sigs["anna mueller x"]))
    assert same >= 8


def test_lsh_finds_typo_pair_and_verify_rejects_unrelated(spark):
    norms = spark.createDataFrame(
        [("soeren zimmermann",), ("soeren zimmxrmann",), ("acme corporation",)],
        ["norm"],
    )
    pairs = lsh_candidate_pairs(minhash_signatures(norms))
    got = {(r["norm_a"], r["norm_b"]) for r in pairs.collect()}
    assert ("soeren zimmermann", "soeren zimmxrmann") in got
    verified = {
        (r["norm_a"], r["norm_b"]) for r in verify_pairs(pairs, 90.0).collect()
    }
    assert verified == {("soeren zimmermann", "soeren zimmxrmann")}


def test_verify_threshold_boundary(spark):
    # 1 edit / 10 chars = ratio 90.0 → kept; 1 edit / 5 chars = 80 → dropped
    pairs = spark.createDataFrame(
        [("abcdefghij", "abcdefghix"), ("abcde", "abcdx")],
        ["norm_a", "norm_b"],
    )
    got = verify_pairs(pairs, 90.0).collect()
    assert [(r["norm_a"], r["norm_b"]) for r in got] == [("abcdefghij", "abcdefghix")]


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], ["norm_a", "norm_b"]
    )
    got = {r["norm"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_iterative_path(spark):
    """driver_threshold=0 forces the distributed min-label-propagation
    loop (the 100 TB path) — must agree with the driver union-find."""
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y"), ("c", "d"), ("d", "e"),
         ("m", "n")],
        ["norm_a", "norm_b"],
    )
    it = {
        r["norm"]: r["component"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    drv = {
        r["norm"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert it == drv
    assert it["e"] == "a" and it["n"] == "m" and it["y"] == "x"


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 40-node chain has diameter 39 — plain 1-hop propagation needs 39
    rounds; the pointer-doubling shortcut must converge well inside 10."""
    import warnings

    nodes = [f"n{i:03d}" for i in range(40)]
    edges = spark.createDataFrame(
        list(zip(nodes[:-1], nodes[1:])), ["norm_a", "norm_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r["norm"]: r["component"]
            for r in connected_components(
                edges, max_iterations=10, driver_threshold=0
            ).collect()
        }
    assert not any("did not converge" in str(x.message) for x in w)
    assert set(got.values()) == {"n000"}
    assert len(got) == 40


def test_connected_components_warns_when_iteration_capped(spark):
    import warnings

    nodes = [f"n{i:03d}" for i in range(12)]
    edges = spark.createDataFrame(
        list(zip(nodes[:-1], nodes[1:])), ["norm_a", "norm_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(
            edges, max_iterations=1, driver_threshold=0
        ).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_canonical_assignments_isolated_nodes_self_canonical(spark):
    t = _triples(spark, [("c1", "Solo Entity", "uses", "Another Thing")])
    mentions, edges = match_edges(t)
    a = {r["surface"]: r["canonical_name"] for r in canonical_assignments(mentions, edges).collect()}
    assert a["Solo Entity"] == "solo entity"
    assert a["Another Thing"] == "another thing"


def test_umlaut_variants_collapse_exactly(spark):
    t = _triples(
        spark,
        [
            ("c1", "Anna Müller", "works_at", "Acme Corporation"),
            ("c2", "Anna Mueller", "works_at", "Acme Corporation"),
            ("c3", "ANNA MÜLLER", "lives_in", "Köln"),
        ],
    )
    mentions, edges = match_edges(t)
    a = canonical_assignments(mentions, edges)
    canon = {r["surface"]: r["canonical_name"] for r in a.collect()}
    assert (
        canon["Anna Müller"] == canon["Anna Mueller"] == canon["ANNA MÜLLER"]
        == "anna mueller"
    )
    # entity_id identical across the cluster
    ids = {r["entity_id"] for r in a.filter(F.col("canonical_name") == "anna mueller").collect()}
    assert len(ids) == 1


def test_salted_count_matches_plain_count(spark):
    df = spark.createDataFrame(
        [("hot",)] * 500 + [("cold",)] * 3, ["k"]
    )
    got = {r["k"]: r["n"] for r in salted_count(df, "k").collect()}
    assert got == {"hot": 500, "cold": 3}
