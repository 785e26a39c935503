"""Plan pins, partition invariance, and python twins for the round-22
wave (dedup savings / contamination report / embedding dim stats /
edge support / compaction plan / price-volume-mix).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_contamination_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_contamination_report

    plan = _phys(q_contamination_report(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_dim_stats_long_format_no_window(spark):
    """posexplode + one groupBy — plan width must not scale with dim."""
    from llmaix_spark.plans.queries import q_embedding_dim_stats

    plan = _phys(q_embedding_dim_stats(spark, SF_DIR))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "Generate" in plan  # the posexplode


def test_edge_support_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_edge_support

    plan = _phys(q_edge_support(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_compaction_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_compaction_plan

    plan = _phys(q_compaction_plan(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_pvm_joins_at_year_part_grain(spark):
    from llmaix_spark.plans.queries import q_price_volume_mix

    plan = _phys(q_price_volume_mix(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the bounds row broadcasts back
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_savings",
        "contamination_report",
        "embedding_dim_stats",
        "edge_support",
        "compaction_plan",
        "price_volume_mix",
    ],
)
def test_wave22_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        df = fn(spark, SF_DIR)
        rows[n] = sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# python twins


def _shingles(text: str, n: int) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def _cc_groups(pairs):
    """Union-find over (a, b) pairs → {node: min-id component}."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_savings_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_savings

    got = {
        r["group_id"]: (
            r["n_docs"],
            r["survivor_doc"],
            r["chars_total"],
            r["chars_dropped"],
        )
        for r in q_dedup_savings(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text, 3) for r in d.itertuples()}
    chars = dict(zip(d["doc_id"], d["n_chars"]))
    ids = sorted(sh)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                pairs.append((a, b))
    comp = _cc_groups(pairs)
    groups: dict[int, list[int]] = {}
    for node, c in comp.items():
        groups.setdefault(c, []).append(node)
    want = {}
    for gid, members in groups.items():
        if len(members) < 2:
            continue
        surv = min(members, key=lambda m: (-chars[m], m))
        total = sum(chars[m] for m in members)
        want[gid] = (len(members), surv, total, total - chars[surv])
    assert got == want
    assert want  # fixture must contain non-trivial groups
    # the quality survivor is at least as long as every group member
    for gid, (_, surv, _, dropped) in want.items():
        assert dropped >= 0


def test_contamination_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_contamination_report

    got = {
        r["bench_doc"]: (r["n_train_docs"], r["n_shared_grams"])
        for r in q_contamination_report(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    grams = {int(r.doc_id): _shingles(r.text, 8) for r in d.itertuples()}
    bench = [i for i in grams if i % 8 == 0]
    train = [i for i in grams if i % 8 != 0]
    want = {}
    for b in bench:
        docs_hit = set()
        grams_hit = set()
        for t in train:
            inter = grams[b] & grams[t]
            if inter:
                docs_hit.add(t)
                grams_hit |= inter
        want[b] = (len(docs_hit), len(grams_hit))
    assert got == want
    assert any(v[0] > 0 for v in got.values())


def test_dim_stats_match_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_embedding_dim_stats

    got = {
        r["dim"]: (
            r["n"],
            r["mean_micro"],
            r["std_micro"],
            r["min_micro"],
            r["max_micro"],
        )
        for r in q_embedding_dim_stats(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(e["embedding"].values).astype(np.float64)
    q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    n, dims = q.shape
    assert set(got) == set(range(1, dims + 1))
    for d in range(dims):
        col = q[:, d]
        gn, gmean, gstd, gmin, gmax = got[d + 1]
        assert gn == n
        assert (gmin, gmax) == (int(col.min()), int(col.max()))
        assert abs(gmean - col.sum() / n) < 1e-5
        sq, sqq = int(col.sum()), int((col.astype(object) ** 2).sum())
        std = math.sqrt((n * sqq - sq * sq) / (n * (n - 1)))
        assert abs(gstd - std) < 1e-4


def test_edge_support_matches_python(spark):
    from llmaix_spark.plans.queries import q_edge_support, q_kg_triples

    got = {
        (r["a"], r["b"]): r["support"]
        for r in q_edge_support(spark, SF_DIR).collect()
    }

    tri = q_kg_triples(spark, SF_DIR).select("subj", "obj").collect()
    edges = {
        (min(r["subj"], r["obj"]), max(r["subj"], r["obj"]))
        for r in tri
        if r["subj"] != r["obj"]
    }
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
    assert got == want
    # triangle identity: edge supports sum to 3 x the triangle count
    from llmaix_spark.plans.queries import q_kg_triangles

    n_tri = sum(
        r["n_triangles"] for r in q_kg_triangles(spark, SF_DIR).collect()
    )
    assert sum(got.values()) * 3 == n_tri * 3  # both count each tri 3x


def test_compaction_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_compaction_plan

    got = {
        r["lang"]: (r["n_docs"], r["total_chars"], r["n_files"], r["avg_fill"])
        for r in q_compaction_plan(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for lang, g in d.groupby("lang"):
        total = int(g["n_chars"].sum())
        n_files = -(-total // 8192)
        gn, gt, gf, gfill = got[lang]
        assert (gn, gt, gf) == (len(g), total, n_files)
        assert abs(gfill - total / (n_files * 8192)) < 1e-6
        assert 0 < gfill <= 1


def test_pvm_identity_and_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_price_volume_mix

    rows = {r["yr"]: r for r in q_price_volume_mix(spark, SF_DIR).collect()}
    assert rows

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["yr"] = li["l_shipdate"].dt.year
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    li["qty"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    py = li.groupby(["yr", "l_partkey"]).agg(
        r=("cents", "sum"), q=("qty", "sum")
    )
    years = sorted({yr for yr, _ in py.index})
    for yr in years[1:]:
        cur = py.xs(yr, level="yr")
        prev = py.xs(yr - 1, level="yr")
        common = cur.index.intersection(prev.index)
        pe = ve = ce = 0
        d_common = 0
        for pk in common:
            r1, q1 = int(cur.loc[pk, "r"]), int(cur.loc[pk, "q"])
            r0, q0 = int(prev.loc[pk, "r"]), int(prev.loc[pk, "q"])
            if q1 <= 0 or q0 <= 0:
                continue
            p1, p0 = r1 / q1, r0 / q0

            # engine round() is HALF_UP = away from zero on negatives
            def rhu(x):
                return int(math.copysign(math.floor(abs(x) + 0.5), x))

            pe += rhu((p1 - p0) * q0 * 1000)
            ve += rhu(p0 * (q1 - q0) * 1000)
            ce += rhu((p1 - p0) * (q1 - q0) * 1000)
            d_common += r1 - r0
        new_c = int(cur.loc[cur.index.difference(prev.index), "r"].sum())
        exit_c = int(prev.loc[prev.index.difference(cur.index), "r"].sum())
        r = rows[yr]
        assert r["delta_common_cents"] == d_common
        assert r["price_eff_milli"] == pe
        assert r["volume_eff_milli"] == ve
        assert r["cross_eff_milli"] == ce
        assert (r["new_cents"], r["exited_cents"]) == (new_c, exit_c)
        # Laspeyres identity up to the per-part milli-cent grid
        n_parts = len(common)
        assert abs((pe + ve + ce) - d_common * 1000) <= n_parts * 2
