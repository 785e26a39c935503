#!/usr/bin/env python3
"""Run a subset of queries vs their oracles (same compare as preflight).

Usage: python scripts/check_query.py name1 name2 ... [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from preflight import TABLES, normalize  # noqa: E402


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from llmaix_spark.session import get_spark

    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            sys.exit("--sf needs a directory argument")
        sf_dir = argv[i + 1]
        del argv[i:i + 2]  # remove flag AND value from the name list
    args = [a for a in argv if not a.startswith("--")]
    spark = get_spark(app_name="check_query")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name in args:
        t0 = time.time()
        # per-query isolation, like preflight: a typo or one failing
        # query must not hide the rest (or skip spark.stop())
        if name not in queries:
            print(f"FAIL {name} — unknown query (not in queries())")
            failed.append(name)
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name} err={type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS {name} rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            continue
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        cols_ok = sorted(s_cols) == sorted(d_cols)
        rows_ok = len(s_rows) == len(d_rows)
        ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
        hash_ok = ns == nd
        ok = cols_ok and rows_ok and hash_ok
        print(f"{'PASS' if ok else 'FAIL'} {name} rows={len(s_rows)}/{len(d_rows)} "
              f"cols={cols_ok} hash={hash_ok} ({time.time()-t0:.1f}s)")
        if not ok:
            failed.append(name)
            if not cols_ok:
                print("  spark cols:", s_cols)
                print("  duck  cols:", d_cols)
            for i, (a, b) in enumerate(zip(ns, nd)):
                if a != b:
                    print("  first diff row", i)
                    print("   spark:", a)
                    print("   duck :", b)
                    break
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
