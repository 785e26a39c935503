"""Mirror of the driver's correctness harness: run every oracle-backed
query in both Spark and DuckDB at sf0.001 and compare row count, column
set, and sorted values. Catches cross-engine drift before the driver does.
"""

import math
import os

import duckdb
import pytest

from llmaix_spark.plans.queries import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows; round floats to 6dp for compare."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0  # normalize -0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [columns[i] for i in idx], out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, sn = _normalize(s_rows, s_cols)
    _, dn = _normalize(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize(
    "name",
    ["kg_pipeline_edges", "kg_canonical_triples", "ann_ivf_topk",
     "multimodal_decode", "extraction_stub", "anonymizer_conversations"],
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_kg_triples_short_docs_dont_crash(spark, tmp_path):
    """Docs under 3 tokens must yield zero windows — sequence(1, 0)
    DESCENDS (landmine #3) and element_at(t, 0) would throw."""
    from llmaix_spark.plans.queries import q_kg_triples

    spark.createDataFrame(
        [(1, "lone"), (2, "two tokens"), (3, "join fast table now")],
        "doc_id bigint, text string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_kg_triples(spark, str(tmp_path)).collect()
    assert all(r["conv_id"] == "3" for r in rows)
