#!/usr/bin/env python3
"""Driver-run simulation: entry() smoke at sf0.001, every queries() entry
vs its oracle_sql() at sf0.01 (row count + columns + sorted-value
compare), rows-only checks for the rest. Prints a per-query verdict and a
JSON summary — run before every round handoff.

Usage: python scripts/preflight.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    import decimal

    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            # DuckDB may hand back decimal.Decimal where Spark has double
            # — both must land on the same rounded float or numerically
            # equal values compare unequal (Decimal('0.3') != 0.3)
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6) or 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from llmaix_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="preflight")

    t0 = time.time()
    edf = entrymod.entry(spark)
    n_entry = edf.count()
    # the driver handoff requires rows > 0 — a vacuous >= 0 gate would
    # green-light an entry() the real driver rejects
    entry_ok = n_entry > 0 and len(edf.schema.fields) > 0
    print(f"entry(): rows={n_entry} schema_ok={entry_ok} "
          f"({time.time() - t0:.1f}s)")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    artifact = {}
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                rows_match = len(s_rows) == len(d_rows)
                schema_match = sorted(s_cols) == sorted(d_cols)
                hash_match = bool(
                    schema_match
                    and normalize(s_rows, s_cols) == normalize(d_rows, d_cols)
                )
                ok = rows_match and schema_match and hash_match
                kind = "oracle"
                artifact[name] = {
                    "rows_match": bool(rows_match),
                    "schema_match": bool(schema_match),
                    "hash_match": hash_match,
                    "spark_rows": len(s_rows),
                    "oracle_rows": len(d_rows),
                    "err": None,
                }
            else:
                ok = len(s_cols) > 0
                kind = "rows-only"
                # no oracle → no row count to match: rows_match stays
                # null like hash_match, so the artifact can't be
                # misread as a verified count match
                artifact[name] = {
                    "rows_match": None,
                    "schema_match": bool(len(s_cols) > 0),
                    "hash_match": None,
                    "spark_rows": len(s_rows),
                    "oracle_rows": None,
                    "err": None,
                }
            results[name] = {
                "ok": bool(ok),
                "kind": kind,
                "rows": len(s_rows),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # a failing query must not hide the rest
            results[name] = {"ok": False, "kind": "error", "error": str(e)[:200]}
            artifact[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": str(e)[:200],
            }
        r = results[name]
        print(f"{'PASS' if r['ok'] else 'FAIL'} {name:28s} {r.get('kind',''):9s} "
              f"rows={r.get('rows','-')} {r.get('sec','-')}s")

    n_ok = sum(1 for r in results.values() if r["ok"])
    summary = {
        "entry_rows": n_entry,
        "queries_total": len(results),
        "queries_ok": n_ok,
        "sf_dir": sf_dir,
    }
    print(json.dumps(summary))
    # CORRECTNESS-format artifact covering the FULL query library (the
    # driver file may sample a rotation-capped subset — r3 verdict item
    # 2): CORRECTNESS_SELF_r{N}.json, N = the round in progress (one
    # past the last driver-committed CORRECTNESS_r{N}); commit it each
    # round so every query has a value-oracled row dated this round.
    from llmaix_spark.roundtag import infer_round_tag

    tag = infer_round_tag(REPO)
    apath = os.path.join(REPO, f"CORRECTNESS_SELF_r{tag}.json")
    with open(apath, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {apath}")
    spark.stop()
    sys.exit(0 if n_ok == len(results) and entry_ok else 1)


if __name__ == "__main__":
    main()
