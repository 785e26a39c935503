"""Plan pins, partition invariance, and python twins for the round-34
wave (order batching / token burstiness / chunk dedup / ABC×XYZ /
dup id distance / arc elasticity).
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_batching_customer_partitioned(spark):
    from llmaix_spark.plans.queries import q_order_batching

    plan = _phys(q_order_batching(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_burstiness_bounded_topk(spark):
    from llmaix_spark.plans.queries import q_token_burstiness

    plan = _phys(q_token_burstiness(spark, SF_DIR))
    assert "Join" not in plan


def test_chunk_dedup_no_join(spark):
    from llmaix_spark.plans.queries import q_chunk_dedup

    plan = _phys(q_chunk_dedup(spark, SF_DIR))
    assert "Join" not in plan
    assert "Generate" in plan


def test_abc_xyz_single_part_grain_join(spark):
    from llmaix_spark.plans.queries import q_abc_xyz_matrix

    plan = _phys(q_abc_xyz_matrix(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_id_distance_no_window(spark):
    from llmaix_spark.plans.queries import q_dup_id_distance

    plan = _phys(q_dup_id_distance(spark, SF_DIR))
    assert "Window" not in plan


def test_arc_year_part_grain(spark):
    from llmaix_spark.plans.queries import q_arc_elasticity

    plan = _phys(q_arc_elasticity(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "order_batching",
        "token_burstiness",
        "chunk_dedup",
        "abc_xyz_matrix",
        "dup_id_distance",
        "arc_elasticity",
    ],
)
def test_wave34_partition_invariance(spark, qname):
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


def test_batching_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_order_batching

    got = {
        r["batch_size"]: r["n_batches"]
        for r in q_order_batching(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("int64") // DAY_US
    want: dict[int, int] = {}
    n_orders = 0
    for _, g in o.groupby("o_custkey"):
        ds = sorted(g["d"])
        n_orders += len(ds)
        size = 1
        for a, b in zip(ds, ds[1:]):
            if b - a <= 7:
                size += 1
            else:
                want[size] = want.get(size, 0) + 1
                size = 1
        want[size] = want.get(size, 0) + 1
    assert got == want
    assert sum(k * v for k, v in got.items()) == n_orders


def test_burstiness_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_token_burstiness

    got = {
        r["token"]: (r["cf"], r["df"], r["burstiness"])
        for r in q_token_burstiness(spark, SF_DIR).collect()
    }
    assert len(got) == 10

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cf: Counter = Counter()
    df_: Counter = Counter()
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        cf.update(toks)
        df_.update(set(toks))
    cand = [
        (t, cf[t], df_[t], cf[t] / df_[t])
        for t in cf
        if df_[t] >= 3
    ]
    top = sorted(cand, key=lambda x: (-x[3], x[0]))[:10]
    for t, c, dd_, b in top:
        gc, gd, gb = got[t]
        assert (gc, gd) == (c, dd_)
        assert abs(gb - b) < 1e-6
        assert gb >= 1.0  # cf >= df always


def test_chunk_dedup_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_chunk_dedup

    got = {
        r["chunk_hash"]: (r["n_occurrences"], r["n_docs"])
        for r in q_chunk_dedup(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    occ: dict[int, list] = {}
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        for st in range(1, len(toks) + 1, 32):
            end = min(st + 63, len(toks))
            h = _h60(" ".join(toks[st - 1 : end]))
            occ.setdefault(h, []).append(r.doc_id)
    want = {
        h: (len(v), len(set(v)))
        for h, v in occ.items()
        if len(set(v)) >= 2
    }
    assert got == want
    assert want  # near-dup docs must share sliding chunks


def test_abc_xyz_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_abc_xyz_matrix

    got = {
        (r["abc_class"], r["xyz_class"]): r["n_parts"]
        for r in q_abc_xyz_matrix(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    li["q"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    li["mk"] = li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month
    rev = li.groupby("l_partkey")["cents"].sum()
    total = int(rev.sum())
    abc = {}
    cum = 0
    for pk, cents in sorted(
        rev.items(), key=lambda kv: (-kv[1], kv[0])
    ):
        cum += int(cents)
        share = math.floor(cum / total * 1e6 + 0.5) / 1e6
        abc[pk] = "A" if share <= 0.8 else ("B" if share <= 0.95 else "C")
    mdem = li.groupby(["l_partkey", "mk"])["q"].sum()
    want: dict[tuple, int] = {}
    for pk, g in mdem.groupby(level=0):
        v = g.to_numpy(dtype=float)
        if len(v) < 2:
            continue
        mean = v.sum() / len(v)
        var = max(
            (np.square(v).sum() - v.sum() ** 2 / len(v)) / (len(v) - 1), 0
        )
        cvv = math.sqrt(var) / mean
        xyz = "X" if cvv <= 0.5 else ("Y" if cvv <= 1.0 else "Z")
        k = (abc[pk], xyz)
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_id_distance_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dup_id_distance

    got = {
        r["log2_distance_band"]: r["n_pairs"]
        for r in q_dup_id_distance(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    want: dict[int, int] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                band = int(math.floor(math.log2(b - a)))
                want[band] = want.get(band, 0) + 1
    assert got == want


def test_arc_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_arc_elasticity

    got = {
        r["yr"]: (r["n_parts"], r["median_arc"])
        for r in q_arc_elasticity(spark, SF_DIR).collect()
    }
    assert got

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["yr"] = li["l_shipdate"].dt.year
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    li["q"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    py = li.groupby(["yr", "l_partkey"]).agg(
        r=("cents", "sum"), q=("q", "sum")
    )
    years = sorted({yr for yr, _ in py.index})
    for yr in years[1:]:
        cur = py.xs(yr, level="yr")
        prev = py.xs(yr - 1, level="yr")
        arcs = []
        for pk in cur.index.intersection(prev.index):
            r1, q1 = int(cur.loc[pk, "r"]), int(cur.loc[pk, "q"])
            r0, q0 = int(prev.loc[pk, "r"]), int(prev.loc[pk, "q"])
            if q1 <= 0 or q0 <= 0:
                continue
            p1, p0 = r1 / q1, r0 / q0
            if p1 == p0:
                continue
            arc = ((q1 - q0) / (q1 + q0)) / ((p1 - p0) / (p1 + p0))
            arcs.append(round(arc, 6))
        if not arcs:
            continue
        arcs.sort()
        med = arcs[(len(arcs) + 1) // 2 - 1]
        gn, gm = got[yr]
        assert gn == len(arcs)
        assert abs(gm - med) < 1e-6
        # demand curves slope down: the median elasticity is negative
        assert gm < 0
