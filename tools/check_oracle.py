#!/usr/bin/env python3
"""Local pre-check of Verify output vs the DuckDB oracle (mimics the
driver's gate: sort columns by name, sort rows, compare values).
Dev-only tool — the shipped Scala library does not depend on this.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def eq(a, b):
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        close = exact or (abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
        return exact, close
    return (a == b,) * 2


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got_rows = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ: spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: row counts differ: spark={len(gr)} oracle={len(er)}")
            n_fail += 1
            continue
        bad = nearmiss = 0
        for a, b in zip(gr, er):
            for x, y in zip(a, b):
                exact, close = eq(x, y)
                if not exact:
                    if close:
                        nearmiss += 1
                    else:
                        bad += 1
                        if bad <= 3:
                            print(f"  {name}: mismatch {x!r} != {y!r}")
        if bad:
            print(f"FAIL {name}: {bad} value mismatches ({len(gr)} rows)")
            n_fail += 1
        elif nearmiss:
            print(f"WARN {name}: exact-pass except {nearmiss} float near-misses (<1e-9 rel)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
