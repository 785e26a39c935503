"""profile_columns: one-pass per-column statistics."""

import pytest

from llmaix_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 2.5),
            (2, None, 0.5),
            (3, "beta", None),
            (3, "alpha", 7.0),
        ],
        "id bigint, name string, score double",
    )


def test_profile_exact_values(tbl):
    rows = {r["column_name"]: r for r in profile_columns(tbl).collect()}
    assert set(rows) == {"id", "name", "score"}
    assert all(r["n_rows"] == 4 for r in rows.values())

    rid = rows["id"]
    assert (rid["n_nulls"], rid["n_distinct"]) == (0, 3)
    assert (rid["min_num"], rid["max_num"]) == (1.0, 3.0)
    assert rid["min_str"] is None and rid["max_str"] is None

    rname = rows["name"]
    assert (rname["n_nulls"], rname["n_distinct"]) == (1, 2)
    assert (rname["min_str"], rname["max_str"]) == ("alpha", "beta")
    assert rname["min_num"] is None and rname["max_num"] is None

    rscore = rows["score"]
    assert (rscore["n_nulls"], rscore["n_distinct"]) == (1, 3)
    assert (rscore["min_num"], rscore["max_num"]) == (0.5, 7.0)


def test_profile_column_subset_and_approx(tbl):
    out = profile_columns(tbl, columns=["name"], exact_distinct=False)
    rows = out.collect()
    assert [r["column_name"] for r in rows] == ["name"]
    # HLL at cardinality 2 is exact
    assert rows[0]["n_distinct"] == 2


def test_profile_empty_selection_raises(tbl):
    with pytest.raises(ValueError):
        profile_columns(tbl, columns=["nope"])


def test_profile_quantiles_exact_and_approx(spark):
    from llmaix_spark.operators.profile import profile_quantiles

    df = spark.createDataFrame(
        [("g", i) for i in range(10)] + [("h", 5), ("h", 7)],
        "grp string, x bigint",
    )
    rows = {
        r["grp"]: r
        for r in profile_quantiles(df, "x", by=["grp"]).collect()
    }
    g = rows["g"]
    # 0..9: (n-1)*q interpolation
    assert (g["n"], g["mean"]) == (10, 4.5)
    assert (g["q25"], g["q50"], g["q75"], g["q95"]) == (2.25, 4.5, 6.75, 8.55)
    h = rows["h"]
    assert (h["n"], h["q50"]) == (2, 6.0)

    approx = {
        r["grp"]: r
        for r in profile_quantiles(df, "x", by=["grp"], exact=False).collect()
    }
    # sketch is exact at this cardinality but lands on real values
    assert approx["g"]["q50"] in (4.0, 5.0)


def test_profile_histogram_clamps_edges(spark):
    from llmaix_spark.operators.profile import profile_histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 99, 100, 150, 5000, None]], "x bigint"
    )
    rows = {r["bin"]: r for r in profile_histogram(df, "x", 100, 3).collect()}
    assert rows[0]["n"] == 3 and rows[0]["v_min"] == -5   # -5 clamped in
    assert rows[1]["n"] == 2 and rows[1]["lo"] == 100
    assert rows[2]["n"] == 1 and rows[2]["v_max"] == 5000  # clamp to last
    assert set(rows) == {0, 1, 2}


def test_fd_check_reports_only_violations(spark):
    from llmaix_spark.operators.profile import fd_check

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"), ("c", "z")],
        "k string, v string",
    )
    got = {
        r["lhs_value"]: (r["n_distinct_rhs"], r["n_rows"])
        for r in fd_check(df, "k", "v").collect()
    }
    assert got == {"b": (2, 2)}


def test_fd_check_holds_empty(spark):
    from llmaix_spark.operators.profile import fd_check

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 1)], "k string, v int"
    )
    assert fd_check(df, "k", "v").count() == 0
