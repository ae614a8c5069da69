#!/usr/bin/env python3
"""Local pre-check of Verify output vs the DuckDB oracle (mimics the
driver's gate: sort columns by name, sort rows, compare values).
Dev-only tool — the shipped Scala library does not depend on this.

The Spark side is read through pyarrow/pandas — the same path the
driver uses — NOT through DuckDB: reading both sides through DuckDB
normalizes away representation-level divergence (e.g. a Spark
decimal128(14,0) column surfaces as object(Decimal) in pandas while
the DuckDB oracle materializes float64 — value-equal, hash-different),
which is exactly the failure class that shipped blind in round 3.
Cells are compared (type, repr)-sensitively, with the 1e-9 float
near-miss tolerance kept as a WARN (the driver's hash does NOT
tolerate near-misses — grep for WARN).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def read_spark(out_dir, name):
    """Read Verify's parquet output the way the driver does: pyarrow →
    pandas. Returns (cols, rows as list of tuples of python objects)."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {out_dir}/{name}")
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    # date_as_object=False: date32 lands as datetime64 (Timestamp cells),
    # matching how the driver-green date queries compare against the
    # DuckDB oracle's datetime64 — decimals stay raw (object(Decimal)),
    # which is the divergence this tool must catch
    df = tbl.to_pandas(date_as_object=False)
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False, name=None)]


def read_oracle(con, sql):
    df = con.execute(sql).df()
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False, name=None)]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def is_null(x):
    if x is None:
        return True
    try:
        r = pd.isna(x)
        return r if isinstance(r, bool) else bool(r) if getattr(r, "ndim", 1) == 0 else False
    except (TypeError, ValueError):
        return False


def eq(a, b):
    """Returns (exact, close). `exact` mimics a representation-sensitive
    hash: type class AND repr must agree. `close` additionally admits
    the 1e-9 relative float tolerance (reported as WARN)."""
    if is_null(a) and is_null(b):
        # None/NaN/NaT all read back as the same null through the
        # driver's pandas paths
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = repr(a) == repr(b)
        close = exact or a == b or (
            abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
        return exact, close
    if type(a).__name__ != type(b).__name__:
        # e.g. Decimal vs float, date vs Timestamp: values may be equal
        # but the driver's hash sees the raw pandas objects and diverges
        return False, False
    return (a == b and repr(a) == repr(b),) * 2


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify records which queries it attempted and which crashed; a
    # missing output dir is only a benign skip when the query was NOT
    # attempted (partial SPARK_GRAFT_ONLY run). Attempted-but-missing
    # (or listed in "failed") is a FAIL — previously a crashed query's
    # missing output read as a skip and the gate exited green.
    import os
    attempted, crashed = None, set()
    if os.path.exists(f"{out_dir}/attempted.json"):
        att = json.load(open(f"{out_dir}/attempted.json"))
        attempted, crashed = set(att["attempted"]), set(att["failed"])
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in crashed:
            print(f"FAIL {name}: query threw during Verify (see verify stderr)")
            n_fail += 1
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            if attempted is not None and name in attempted:
                print(f"FAIL {name}: attempted but no output written")
                n_fail += 1
            else:
                # not selected in this partial run: not a failure
                n_skip += 1
            continue
        try:
            got_cols, got_rows = read_spark(out_dir, name)
            exp_cols, exp_rows = read_oracle(con, sql)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_cols, got_rows)
        ec, er = canon(exp_cols, exp_rows)
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
                            print(f"  {name}: mismatch {type(x).__name__}:{x!r} != {type(y).__name__}:{y!r}")
        if bad:
            print(f"FAIL {name}: {bad} value/representation mismatches ({len(gr)} rows)")
            n_fail += 1
        elif nearmiss:
            print(f"WARN {name}: exact-pass except {nearmiss} float near-misses (<1e-9 rel)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    # a crashed query with NO DuckDB oracle (e.g. q22_approx_distinct)
    # never enters the loop above — without this it would go silently
    # unreported and the gate would stay green
    for name in sorted(crashed - set(oracle.keys())):
        print(f"FAIL {name}: query threw during Verify (rows-only query, no oracle)")
        n_fail += 1
    skipped = f", {n_skip} skipped (not in verify output)" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
